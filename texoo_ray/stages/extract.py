"""Per-turn extraction stages (segment / tag / match / section) for Ray Data.

Each stage is a callable class intended for
``ds.map_batches(Stage(...), batch_format="pyarrow", concurrency=N)`` —
construction cost (compiled regexes, gazetteer automaton, feature tagger)
is paid once per actor, mirroring the reference's process-singleton models
(DocumentFactory.java:39-87 -> actor ``__init__``, SURVEY.md §2.5).

``ExtractStage`` fuses the full per-turn chain (markup strip -> language
detect -> segment -> feature-tag -> CRF repair -> mention decode ->
gazetteer -> sections) in ONE pass so intermediate token/tag columns never
hit the object store — the fused form is what the flagship pipeline and
the benchmark run. The unfused stages exist for composability and for
conformance tests of each operator in isolation.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa

from ..core.document import Document, Newlines, segment_text
from ..core.langid import detect_language
from ..core.markup import strip_markup
from ..core.matching import Gazetteer, MatchingStrategy
from ..core.mentions import mentions_from_bioes
from ..core.sections import (
    bemd_deviation,
    detect_edges,
    directional_context,
    emd_deviation,
    sections_from_edges,
    sections_from_newlines,
)
from ..core.features import sentence_embedding
from ..core.tagger import FeatureTagger
from ..core.tags import bioes_to_bio2
from . import schema


def _append(batch: pa.Table, name: str, array: pa.Array) -> pa.Table:
    if name in batch.column_names:
        batch = batch.drop_columns([name])
    return batch.append_column(name, array)


class SegmentStage:
    """requires: ``text`` — attaches: ``clean_text``, ``lang``,
    ``sentences``, ``tokens``, ``reconstructed`` (for invariant checks).

    Per-turn equivalent of DocumentFactory.fromText
    (DocumentFactory.java:219-267) preceded by markup strip.
    """

    def __init__(
        self,
        newlines: str = "keep",
        strip: bool = True,
        text_col: str = "text",
        attach_reconstructed: bool = False,
    ):
        self.newlines = Newlines(newlines)
        self.strip = strip
        self.text_col = text_col
        self.attach_reconstructed = attach_reconstructed

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        clean: List[str] = []
        langs: List[str] = []
        sent_col: List[list] = []
        tok_col: List[list] = []
        recon: List[str] = []
        for raw in texts:
            raw = raw or ""
            t = strip_markup(raw) if self.strip else raw
            clean.append(t)
            langs.append(detect_language(t))
            doc = segment_text(t, self.newlines)
            sents, toks = schema.doc_to_row_lists(doc)
            sent_col.append(sents)
            tok_col.append(toks)
            if self.attach_reconstructed:
                recon.append(doc.text())
        batch = _append(batch, "clean_text", pa.array(clean, pa.string()))
        batch = _append(batch, "lang", pa.array(langs, pa.string()))
        batch = _append(batch, "sentences", pa.array(sent_col, schema.SENTENCE_TYPE))
        batch = _append(batch, "tokens", pa.array(tok_col, schema.TOKEN_TYPE))
        if self.attach_reconstructed:
            batch = _append(batch, "reconstructed", pa.array(recon, pa.string()))
        return batch


class TagStage:
    """requires: ``tokens``, ``lang`` — attaches: ``tags``.

    Deterministic feature tagger + CRF repair per sentence; one tagger per
    language, routed per row like GenericMentionAnnotator.java:64-78 (both
    models co-resident in the actor; no shuffle)."""

    def __init__(self):
        self.taggers = {"en": FeatureTagger("en"), "de": FeatureTagger("de")}

    def __call__(self, batch: pa.Table) -> pa.Table:
        tok_lists = batch["tokens"].to_pylist()
        langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [""] * len(tok_lists)
        tag_col: List[list] = []
        for toks, lang in zip(tok_lists, langs):
            doc = schema.row_to_doc(toks)
            tagger = self.taggers.get(lang or "en", self.taggers["en"])
            labels, confs = tagger.tag_sentences(doc.sentences)
            bio2 = bioes_to_bio2(labels)
            tag_col.append(
                [
                    {"bio2": b2, "bioes": be, "type": "GENERIC" if be != "O" else "", "confidence": c}
                    for b2, be, c in zip(bio2, labels, confs)
                ]
            )
        return _append(batch, "tags", pa.array(tag_col, schema.TAG_TYPE))


class MentionDecodeStage:
    """requires: ``tokens``, ``tags`` — attaches: ``mentions`` (PRED).

    Stateless decode of BIO2 runs (MentionAnnotation.annotateFromTags)."""

    def __init__(self, source: str = "PRED"):
        self.source = source

    def __call__(self, batch: pa.Table) -> pa.Table:
        tok_lists = batch["tokens"].to_pylist()
        tag_lists = batch["tags"].to_pylist()
        out: List[list] = []
        for toks, tags in zip(tok_lists, tag_lists):
            doc = schema.row_to_doc(toks)
            labels = [t["bio2"] for t in tags]
            confs = [t["confidence"] for t in tags]
            types = [t["type"] or None for t in tags]
            out.append(
                mentions_from_bio2_rows(doc, labels, types, confs, self.source)
            )
        return _append(batch, "mentions", pa.array(out, schema.MENTION_TYPE))


def mentions_from_bio2_rows(doc: Document, labels, types, confs, source: str) -> List[dict]:
    from ..core.mentions import mentions_from_bio2

    return mentions_from_bio2(
        [s.tokens for s in doc.sentences],
        labels,
        types=types,
        confidences=confs,
        source=source,
    )


class GazetteerStage:
    """requires: ``clean_text`` (or ``text``), ``tokens`` — attaches/extends:
    ``mentions`` with SILVER matches (MatchingAnnotator semantics).

    The term list ships to each actor once via the constructor args (Ray
    serializes the stage object per actor, not per batch); for very large
    dictionaries pass ``terms_ref`` (a ``ray.put`` ObjectRef) instead.
    """

    def __init__(
        self,
        terms: Optional[Sequence[str]] = None,
        terms_ref=None,
        strategy: str = "case_sensitive",
        mention_type: str = "GENERIC",
        min_word_length: int = 3,
        text_col: str = "clean_text",
    ):
        if terms is None and terms_ref is not None:
            import ray

            terms = ray.get(terms_ref)
        self.gaz = Gazetteer(
            terms or [],
            MatchingStrategy(strategy),
            mention_type=mention_type,
            min_word_length=min_word_length,
        )
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text_col = self.text_col if self.text_col in batch.column_names else "text"
        texts = batch[text_col].to_pylist()
        tok_lists = batch["tokens"].to_pylist()
        existing = (
            batch["mentions"].to_pylist()
            if "mentions" in batch.column_names
            else [[] for _ in texts]
        )
        out: List[list] = []
        for text, toks, prev in zip(texts, tok_lists, existing):
            doc = schema.row_to_doc(toks)
            matches = self.gaz.annotate(text or "", doc.tokens())
            out.append((prev or []) + matches)
        return _append(batch, "mentions", pa.array(out, schema.MENTION_TYPE))


class SectionStage:
    """requires: ``tokens`` — attaches: ``sections``.

    method: "nl" | "max" | "emd" | "bemd"
    (SectorAnnotator.SegmentationMethod, :69-77). EMD/BEMD run over
    deterministic hashed sentence embeddings (stand-in for the learned
    SECTOR embeddings, SURVEY.md §2.11); MAX classifies each sentence
    against a label table (hashed label-name embeddings standing in for
    the trained HeadingEncoder vocab) and opens a section when the
    running-mean label leaves the sentence's top-k (:408-437)."""

    def __init__(
        self,
        method: str = "nl",
        embedding_dim: int = 64,
        labels: Optional[Sequence[str]] = None,
        top_k: int = 2,
        w2v_path: Optional[str] = None,
    ):
        assert method in ("nl", "max", "emd", "bemd")
        self.method = method
        self.dim = embedding_dim
        self.top_k = top_k
        self.labels = list(labels) if labels else ["intro", "body", "detail", "outro"]
        # optional learned-matrix path: loads ONCE per actor (the
        # Word2VecEncoder.java encode contract); when absent, the hashed
        # n-gram stand-in embeds sentences
        self.w2v = None
        if w2v_path:
            from .word2vec import Word2VecEncoder

            self.w2v = Word2VecEncoder(w2v_path)
            self.dim = self.w2v.dim or embedding_dim
        if method == "max":
            from ..core.features import hashed_ngram_vector

            self.label_matrix = np.stack(
                [hashed_ngram_vector(l, embedding_dim) for l in self.labels]
            )

    def _sections_for(self, doc: Document) -> List[dict]:
        if not doc.sentences:
            return []
        if self.method == "nl":
            return sections_from_newlines(doc.sentences, doc.end)
        if self.w2v is not None:
            emb = np.stack(
                [
                    self.w2v.sentence_vector([t.text for t in s.tokens])
                    for s in doc.sentences
                ]
            )
        else:
            emb = np.stack(
                [sentence_embedding(s.tokens, self.dim) for s in doc.sentences]
            )
        if self.method == "max":
            from ..core.sections import sections_from_target_labels

            return sections_from_target_labels(
                doc.sentences, emb, self.label_matrix, self.labels, k=self.top_k
            )
        if self.method == "emd":
            dev = emd_deviation(emb)
        else:
            fw, bw = directional_context(emb)
            dev = bemd_deviation(fw, bw) if emb.shape[0] >= 2 else None
        edges = detect_edges(dev)
        return sections_from_edges(doc.sentences, edges, doc.end)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tok_lists = batch["tokens"].to_pylist()
        out = [self._sections_for(schema.row_to_doc(toks)) for toks in tok_lists]
        return _append(batch, "sections", pa.array(out, schema.SECTION_TYPE))


SNIPPET_TYPE = pa.list_(
    pa.struct(
        [
            ("sent_begin", pa.int32()),
            ("sent_end", pa.int32()),
            ("begin", pa.int32()),
            ("end", pa.int32()),
        ]
    )
)


class SnippetStage:
    """requires: ``sentences`` — attaches: ``snippets``.

    Sliding sentence-range windows over each turn — the analogue of the
    reference's Snippet view-Documents (Snippet.java:17-37, sentence-range
    training/inference windows). ``sent_end`` is exclusive; char spans
    derive from the first/last sentence of the window."""

    def __init__(self, window: int = 3, stride: int = 2):
        assert window >= 1 and stride >= 1
        self.window = window
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: List[list] = []
        for sents in batch["sentences"].to_pylist():
            sents = sents or []
            n = len(sents)
            snips = []
            start = 0
            while start < n:
                end = min(start + self.window, n)
                snips.append(
                    {
                        "sent_begin": start,
                        "sent_end": end,
                        "begin": sents[start]["begin"],
                        "end": sents[end - 1]["end"],
                    }
                )
                if end == n:
                    break
                start += self.stride
            out.append(snips)
        return _append(batch, "snippets", pa.array(out, SNIPPET_TYPE))


class ExtractStage:
    """Fused flagship stage — requires ``text``; attaches ``clean_text``,
    ``lang``, ``sentences``, ``tokens``, ``tags``, ``mentions``,
    ``sections``, ``n_sentences``, ``n_tokens``, ``n_mentions``.

    One Python pass per turn; equivalent to
    SegmentStage >> TagStage >> MentionDecodeStage >> GazetteerStage >>
    SectionStage but without materializing intermediates (verified
    equivalent in tests/test_stages.py).
    """

    def __init__(
        self,
        newlines: str = "keep",
        strip: bool = True,
        gazetteer_terms: Optional[Sequence[str]] = None,
        gazetteer_ref=None,
        section_method: str = "nl",
        text_col: str = "text",
        lean: bool = False,
        resolve_mentions: bool = False,
        use_fast: Optional[bool] = None,
    ):
        # lean=True skips the clean_text/tags output columns entirely (the
        # analogue of the reference's clearVectors before serialization,
        # Span.java:154-159) — less object-store traffic into the sort.
        self.lean = lean
        # resolve_mentions=True de-overlaps tagger(PRED) + gazetteer(SILVER)
        # mentions by source priority (AnnotationHelpers analogue); default
        # off to preserve both sources on the row like the reference keeps
        # per-source annotation maps (Span.java:55).
        self.resolve_mentions = resolve_mentions
        self.segment = SegmentStage(newlines=newlines, strip=strip, text_col=text_col)
        self.taggers = {"en": FeatureTagger("en"), "de": FeatureTagger("de")}
        if gazetteer_terms is None and gazetteer_ref is not None:
            import ray

            gazetteer_terms = ray.get(gazetteer_ref)
        self.gaz = (
            Gazetteer(gazetteer_terms, MatchingStrategy.CASE_SENSITIVE)
            if gazetteer_terms
            else None
        )
        self.sections = SectionStage(method=section_method)
        self.newlines = Newlines(newlines)
        self.strip = strip
        self.text_col = text_col
        # Per-actor memo of fully-extracted SHORT turns: transcript turn
        # texts are Zipf-distributed ("ok", "thanks", tool boilerplate —
        # 25-38% exact-duplicate rate measured on the bench corpus), and
        # every output column is a pure function of (text, config), so a
        # repeat costs one dict hit instead of a re-extraction. Bounded:
        # only texts <= memo_chars are cached, at most memo_entries per
        # actor (~4 KB/row of list-of-dict payload -> <=100 MB heap).
        self.memo_chars = 128
        self.memo_entries = 25_000
        self._memo: dict = {}
        # Vectorized fused core (stages/fast_extract.py): exact under the
        # KEEP newline policy with NL sections and no source resolution —
        # the flagship/bench configuration. Other configs (DISCARD's
        # cross-sentence nlOffset state, embedding section methods,
        # resolve_mentions) stay on the object path below.
        eligible = (
            self.newlines is Newlines.KEEP
            and section_method == "nl"
            and not resolve_mentions
        )
        if use_fast is None:
            use_fast = eligible
        elif use_fast and not eligible:
            raise ValueError("fast path requires keep/nl/no-resolve config")
        self._fast = None
        if use_fast:
            from .fast_extract import FastExtractor

            self._fast = FastExtractor(
                self.taggers,
                self.gaz,
                lean=self.lean,
                strip=strip,
                text_col=text_col,
                memo_chars=self.memo_chars,
                memo_entries=self.memo_entries,
            )
        # GC hygiene: CPython full (gen-2) collections rescan every cache
        # entry (memo rows + tokenizer LRUs -> millions of small objects),
        # and extraction is allocation-heavy, so gen-2 passes fire often
        # and measured up to ~2x per-batch slowdown as caches fill.
        # Extraction emits acyclic dicts/lists (refcounting frees them);
        # freeze the init-time state and push gen-2 out of reach while
        # keeping young-gen collection for cycle safety.
        import gc

        gc.collect()
        gc.freeze()
        gc.set_threshold(700, 10, 100_000)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._fast is not None:
            return self._fast(batch)
        texts = batch[self.text_col].to_pylist()
        clean_c: List[str] = []
        lang_c: List[str] = []
        sent_c: List[list] = []
        tok_c: List[list] = []
        tag_c: List[list] = []
        men_c: List[list] = []
        sec_c: List[list] = []
        memo = self._memo
        for raw in texts:
            raw = raw or ""
            cacheable = len(raw) <= self.memo_chars
            row = memo.get(raw) if cacheable else None
            if row is None:
                text = strip_markup(raw) if self.strip else raw
                lang = detect_language(text)
                doc = segment_text(text, self.newlines)
                sents, toks = schema.doc_to_row_lists(doc)
                tagger = self.taggers.get(lang or "en", self.taggers["en"])
                labels, confs = tagger.tag_sentences(doc.sentences)
                if self.lean:
                    tags = None
                else:
                    bio2 = bioes_to_bio2(labels)
                    tags = [
                        {"bio2": b2, "bioes": be, "type": "GENERIC" if be != "O" else "", "confidence": c}
                        for b2, be, c in zip(bio2, labels, confs)
                    ]
                mentions = mentions_from_bioes(
                    [s.tokens for s in doc.sentences],
                    labels,
                    confidences=confs,
                    source="PRED",
                )
                if self.gaz is not None:
                    mentions = mentions + self.gaz.annotate(text, doc.tokens())
                if self.resolve_mentions and mentions:
                    from ..core.annotations import resolve_sources

                    mentions = resolve_sources(mentions, priority=("SILVER", "PRED"))
                secs = self.sections._sections_for(doc)
                row = (text, lang, sents, toks, tags, mentions, secs)
                if cacheable and len(memo) < self.memo_entries:
                    memo[raw] = row
            text, lang, sents, toks, tags, mentions, secs = row
            if not self.lean:
                clean_c.append(text)
                tag_c.append(tags)
            lang_c.append(lang)
            sent_c.append(sents)
            tok_c.append(toks)
            men_c.append(mentions)
            sec_c.append(secs)
        if not self.lean:
            batch = _append(batch, "clean_text", pa.array(clean_c, pa.string()))
            batch = _append(batch, "tags", pa.array(tag_c, schema.TAG_TYPE))
        batch = _append(batch, "lang", pa.array(lang_c, pa.string()))
        batch = _append(batch, "sentences", pa.array(sent_c, schema.SENTENCE_TYPE))
        batch = _append(batch, "tokens", pa.array(tok_c, schema.TOKEN_TYPE))
        batch = _append(batch, "mentions", pa.array(men_c, schema.MENTION_TYPE))
        batch = _append(batch, "sections", pa.array(sec_c, schema.SECTION_TYPE))
        batch = _append(
            batch, "n_sentences", pa.array([len(x) for x in sent_c], pa.int32())
        )
        batch = _append(batch, "n_tokens", pa.array([len(x) for x in tok_c], pa.int32()))
        batch = _append(
            batch, "n_mentions", pa.array([len(x) for x in men_c], pa.int32())
        )
        return batch
