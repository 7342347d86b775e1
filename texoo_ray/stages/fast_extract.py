"""Flat fused extraction core (KEEP newline policy).

Computes exactly what the object-based path computes —
``SegmentStage >> TagStage >> MentionDecodeStage >> GazetteerStage >>
SectionStage(method="nl")`` with ``newlines="keep"`` — but never builds
per-token Python objects (Token/Sentence dataclasses) or per-row dicts:

- per-SENTENCE bundles (token spans, BIOES label indices, confidences,
  mention runs) are memoized by ``(sentence_text, tagger_lang)`` — a
  repeated boilerplate line costs one dict hit + a few list.extend calls,
- per-turn results are flat Python lists (turn-absolute offsets), cached
  whole in the short-turn memo,
- an Arrow column is built ONCE per batch as
  ``ListArray.from_arrays(offsets, StructArray.from_arrays(children))``
  over the concatenated flat lists — no ``pa.array(list_of_dicts)``.

Deliberately plain Python lists, not numpy: sentences average ~10 tokens,
where numpy per-call overhead (measured ~140us/sentence across ~15 tiny
array ops) costs 3x more than C-speed list.extend/listcomp (~40us).

Under ``Newlines.KEEP`` token offsets are original text offsets
(DocumentFactory.java:219-267 keeps ``\\n`` tokens and never compacts),
so a sentence bundle shifts by a single scalar — the property that makes
sentence-level caching exact. The DISCARD policy (cross-sentence
``nlOffset`` state) stays on the object path.

Equivalence with the object path is pinned column-by-column by
tests/test_fast_extract.py over fixture + adversarial corpora, and by the
golden extraction file.
"""

from __future__ import annotations

from bisect import bisect_left
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

from ..core.langid import detect_language
from ..core.markup import strip_markup
from ..core.sentences import sentence_spans
from ..core.tags import BIOES_LABELS
from ..core.tokenizer import _PASS1_RE, _chunk_spans

# BIOES index order matches core.tags.BIOES_LABELS: S,B,I,E,O
_S, _B, _I, _E, _O = range(5)
_BIOES_STR = np.array(BIOES_LABELS)  # "S","B","I","E","O"
_BIO2_STR = np.array(["B", "B", "I", "I", "O"])  # S,B->B  I,E->I  O->O
_TYPE_STR = np.array(["GENERIC"] * 4 + [""])


def _reconstruct(texts, begins, ends, s: int, e: int) -> str:
    """tokens_to_text over a consecutive token run (core/spans.py:56):
    gaps between tokens are whitespace by tokenizer construction and
    render as that many spaces; token text always fills its span exactly
    because it is sliced from the same string."""
    parts: List[str] = []
    cur = begins[s]
    for k in range(s, e):
        b = begins[k]
        if b > cur:
            parts.append(" " * (b - cur))
        parts.append(texts[k])
        cur = ends[k]
    return "".join(parts)


def _compute_bundle(sent_text: str, tagger):
    """(tok_begin, tok_end, texts, labels, confs, mentions, has_nl), all
    offsets relative to the sentence start; labels are BIOES indices;
    mentions are (begin, end, text, confidence) tuples.

    Same per-token logic as FeatureTagger.tag_sentences +
    mentions_from_bioes (core/tagger.py:118, core/mentions.py:32): the
    BIOES sequence is valid by construction, mention runs are maximal
    consecutive in-run spans closing at sentence ends, confidence is the
    mean entity score over the run."""
    # fused pass-1/pass-2 tokenization (core/tokenizer.py:94-128 semantics,
    # per-chunk pass-2 cache shared via _chunk_spans) building the three
    # flat lists directly — no intermediate span tuples
    tok_begin: List[int] = []
    tok_end: List[int] = []
    texts: List[str] = []
    ab, ae, at = tok_begin.append, tok_end.append, texts.append
    for m in _PASS1_RE.finditer(sent_text):
        chunk = m.group()
        spans = _chunk_spans(chunk)
        b0 = m.start()
        if len(spans) == 1:
            ab(b0)
            ae(b0 + len(chunk))
            at(chunk)
        else:
            for rb, re_ in spans:
                ab(b0 + rb)
                ae(b0 + re_)
                at(chunk[rb:re_])
    T = len(texts)
    if T == 0:
        return ((), (), (), (), (), (), False)

    ent = tagger._entity_scores(texts)
    th = tagger.threshold
    in_run = [e >= th for e in ent]

    labels: List[int] = []
    confs: List[float] = []
    mentions: List[Tuple[int, int, str, float]] = []
    run_start = -1
    has_nl = False
    for i in range(T):
        e = ent[i]
        if not in_run[i]:
            labels.append(_O)
            confs.append(1.0 - e)
            if texts[i] == "\n":
                has_nl = True
            if run_start >= 0:
                mentions.append(_close_run(tok_begin, tok_end, texts, ent, run_start, i))
                run_start = -1
            continue
        confs.append(e)
        prev_in = run_start >= 0
        next_in = i + 1 < T and in_run[i + 1]
        if not prev_in:
            run_start = i
            labels.append(_B if next_in else _S)
        else:
            labels.append(_I if next_in else _E)
    if run_start >= 0:
        mentions.append(_close_run(tok_begin, tok_end, texts, ent, run_start, T))
    # plain lists, never mutated after construction (cached value)
    return (tok_begin, tok_end, texts, labels, confs, mentions, has_nl)


def _close_run(tok_begin, tok_end, texts, ent, s: int, e: int):
    conf = sum(ent[s:e]) / (e - s)
    return (tok_begin[s], tok_end[e - 1],
            _reconstruct(texts, tok_begin, tok_end, s, e), conf)


class _Turn:
    """Per-turn flat extraction result (offsets absolute in the turn)."""

    __slots__ = (
        "clean", "lang", "sent_begin", "sent_end",
        "tok_begin", "tok_end", "tok_texts", "tok_sidx",
        "labels", "confs",
        "m_begin", "m_end", "m_texts", "m_confs", "m_silver_from",
        "sec_begin", "sec_end",
    )


class FastExtractor:
    """Drop-in fused extraction for ``ExtractStage`` under KEEP newlines.

    ``taggers``/``gaz`` are the stage's own (constructed once per actor).
    """

    def __init__(self, taggers, gaz, *, lean: bool, strip: bool,
                 text_col: str, memo_chars: int = 128,
                 memo_entries: int = 25_000,
                 sent_cache_entries: int = 100_000):
        self.taggers = taggers
        self.gaz = gaz
        self.lean = lean
        self.strip = strip
        self.text_col = text_col
        self.memo_chars = memo_chars
        self.memo_entries = memo_entries
        self._memo: Dict[str, _Turn] = {}
        self._sent_cache: Dict[Tuple[str, str], tuple] = {}
        self._sent_cache_entries = sent_cache_entries

    # -- per-turn ---------------------------------------------------------

    def _extract_turn(self, raw: str) -> _Turn:
        r = _Turn()
        text = strip_markup(raw) if self.strip else raw
        lang = detect_language(text)
        r.clean = text
        r.lang = lang
        lang2 = "de" if lang == "de" else "en"
        tagger = self.taggers.get(lang or "en", self.taggers["en"])

        cache = self._sent_cache
        cache_get = cache.get
        sent_begin: List[int] = []
        sent_end: List[int] = []
        tok_begin: List[int] = []
        tok_end: List[int] = []
        tok_texts: List[str] = []
        tok_sidx: List[int] = []
        labels: List[int] = []
        confs: List[float] = []
        m_begin: List[int] = []
        m_end: List[int] = []
        m_texts: List[str] = []
        m_confs: List[float] = []
        sec_begin: List[int] = []
        sec_end: List[int] = []
        open_sec = -1
        si = 0
        for sb, se in sentence_spans(text):
            sent_text = text[sb:se]
            key = (sent_text, lang2)
            bundle = cache_get(key)
            if bundle is None:
                bundle = _compute_bundle(sent_text, tagger)
                if len(cache) < self._sent_cache_entries:
                    cache[key] = bundle
            tb, te, txts, lbl, cnf, ments, has_nl = bundle
            T = len(txts)
            if T == 0:
                continue  # drops empty sentences like segment_text
            if sb:
                tok_begin.extend([x + sb for x in tb])
                tok_end.extend([x + sb for x in te])
            else:
                tok_begin.extend(tb)
                tok_end.extend(te)
            tok_texts.extend(txts)
            tok_sidx.extend([si] * T)
            labels.extend(lbl)
            confs.extend(cnf)
            s_begin = tb[0] + sb
            s_end = te[-1] + sb
            sent_begin.append(s_begin)
            sent_end.append(s_end)
            for mb, me, mt, mc in ments:
                m_begin.append(mb + sb)
                m_end.append(me + sb)
                m_texts.append(mt)
                m_confs.append(mc)
            # sections from newlines (core/sections.py:165): a section
            # closes at each sentence containing a "\n" token
            if open_sec < 0:
                open_sec = s_begin
            if has_nl:
                sec_begin.append(open_sec)
                sec_end.append(s_end)
                open_sec = -1
            si += 1
        if open_sec >= 0:
            sec_begin.append(open_sec)
            sec_end.append(sent_end[-1])  # doc.end

        r.m_silver_from = len(m_texts)
        if self.gaz is not None and tok_texts:
            self._gaz_mentions(text, tok_begin, tok_end, tok_texts,
                               m_begin, m_end, m_texts, m_confs)

        r.sent_begin = sent_begin
        r.sent_end = sent_end
        r.tok_begin = tok_begin
        r.tok_end = tok_end
        r.tok_texts = tok_texts
        r.tok_sidx = tok_sidx
        r.labels = labels
        r.confs = confs
        r.m_begin = m_begin
        r.m_end = m_end
        r.m_texts = m_texts
        r.m_confs = m_confs
        r.sec_begin = sec_begin
        r.sec_end = sec_end
        return r

    def _gaz_mentions(self, text, tok_begin, tok_end, tok_texts,
                      m_begin, m_end, m_texts, m_confs) -> None:
        """Gazetteer matches at exact token boundaries (matching.py:118).
        Covered tokens of a raw match are consecutive (tokens are sorted
        and non-overlapping), so the run reconstructs like a mention."""
        n = len(tok_texts)
        for begin, end in self.gaz.find(text):
            i = bisect_left(tok_begin, begin)
            first = -1
            last = -1
            while i < n and tok_begin[i] < end:
                if tok_end[i] <= end:
                    if first < 0:
                        first = i
                    last = i
                i += 1
            if first < 0:
                continue
            if tok_begin[first] == begin and tok_end[last] == end:
                m_begin.append(begin)
                m_end.append(end)
                m_texts.append(
                    _reconstruct(tok_texts, tok_begin, tok_end, first, last + 1)
                )
                m_confs.append(1.0)

    # -- per-batch --------------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        memo = self._memo
        turns: List[_Turn] = []
        for raw in texts:
            raw = raw or ""
            cacheable = len(raw) <= self.memo_chars
            t = memo.get(raw) if cacheable else None
            if t is None:
                t = self._extract_turn(raw)
                if cacheable and len(memo) < self.memo_entries:
                    memo[raw] = t
            turns.append(t)

        n = len(turns)
        i32 = pa.int32()

        def flat(attr) -> list:
            out: List = []
            extend = out.extend
            for t in turns:
                extend(getattr(t, attr))
            return out

        def offsets_of(counts: List[int]) -> pa.Array:
            off = np.zeros(n + 1, np.int32)
            np.cumsum(counts, out=off[1:])
            return pa.array(off, i32)

        def list_col(counts, children, names) -> pa.Array:
            struct = pa.StructArray.from_arrays(children, names)
            return pa.ListArray.from_arrays(offsets_of(counts), struct)

        sent_counts = [len(t.sent_begin) for t in turns]
        tok_counts = [len(t.tok_begin) for t in turns]
        men_counts = [len(t.m_begin) for t in turns]
        sec_counts = [len(t.sec_begin) for t in turns]

        sentences = list_col(
            sent_counts,
            [pa.array(flat("sent_begin"), i32), pa.array(flat("sent_end"), i32)],
            ["begin", "end"],
        )
        tokens = list_col(
            tok_counts,
            [
                pa.array(flat("tok_begin"), i32),
                pa.array(flat("tok_end"), i32),
                pa.array(flat("tok_texts"), pa.string()),
                pa.array(flat("tok_sidx"), i32),
            ],
            ["begin", "end", "text", "sent_idx"],
        )
        m_sources: List[str] = []
        for t in turns:
            k = len(t.m_texts)
            m_sources.extend(["PRED"] * t.m_silver_from)
            m_sources.extend(["SILVER"] * (k - t.m_silver_from))
        mentions = list_col(
            men_counts,
            [
                pa.array(flat("m_begin"), i32),
                pa.array(flat("m_end"), i32),
                pa.array(flat("m_texts"), pa.string()),
                pa.array(["GENERIC"] * len(m_sources), pa.string()),
                pa.array(flat("m_confs"), pa.float64()),
                pa.array(m_sources, pa.string()),
            ],
            ["begin", "end", "text", "type", "confidence", "source"],
        )
        total_sec = sum(sec_counts)
        sections = list_col(
            sec_counts,
            [
                pa.array(flat("sec_begin"), i32),
                pa.array(flat("sec_end"), i32),
                pa.array([""] * total_sec, pa.string()),
                pa.array([""] * total_sec, pa.string()),
                pa.array(np.ones(total_sec), pa.float64()),
            ],
            ["begin", "end", "label", "heading", "confidence"],
        )

        def _append(b: pa.Table, name: str, arr) -> pa.Table:
            if name in b.column_names:
                b = b.drop_columns([name])
            return b.append_column(name, arr)

        if not self.lean:
            batch = _append(batch, "clean_text",
                            pa.array([t.clean for t in turns], pa.string()))
            labels_flat = np.asarray(flat("labels"), np.int8)
            tags = list_col(
                tok_counts,
                [
                    pa.array(_BIO2_STR[labels_flat], pa.string()),
                    pa.array(_BIOES_STR[labels_flat], pa.string()),
                    pa.array(_TYPE_STR[labels_flat], pa.string()),
                    pa.array(flat("confs"), pa.float64()),
                ],
                ["bio2", "bioes", "type", "confidence"],
            )
            batch = _append(batch, "tags", tags)
        batch = _append(batch, "lang",
                        pa.array([t.lang for t in turns], pa.string()))
        batch = _append(batch, "sentences", sentences)
        batch = _append(batch, "tokens", tokens)
        batch = _append(batch, "mentions", mentions)
        batch = _append(batch, "sections", sections)
        batch = _append(batch, "n_sentences", pa.array(sent_counts, i32))
        batch = _append(batch, "n_tokens", pa.array(tok_counts, i32))
        batch = _append(batch, "n_mentions", pa.array(men_counts, i32))
        return batch
