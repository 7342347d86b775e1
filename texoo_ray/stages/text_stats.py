"""Text analysis stages: quality scoring, token counting, fingerprinting,
language id — vectorized ``map_batches`` transforms over a documents table.

These are the training-data-pipeline operators the reference lacks but a
10^12-turn corpus needs (task brief); implemented as stateless Arrow
transforms with partial-aggregate-friendly integer outputs.
"""

from __future__ import annotations

import hashlib
import re
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.langid import detect_language

_DIGIT_RE = re.compile(r"[0-9]")
_UPPER_RE = re.compile(r"[A-Z]")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_WS_RUN_RE = re.compile(r"\s+")
_WORD_FINDALL = re.compile(r"\w+", re.UNICODE).findall
# BPE-ish pre-tokenization: alnum runs or single non-space symbols
BPE_TOKEN_RE = re.compile(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")
BPE_TOKEN_SQL = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def _count_re(text: pa.ChunkedArray | pa.Array, pattern: str) -> pa.Array:
    return pc.cast(pc.count_substring_regex(text, pattern), pa.int64())


def quality_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """attaches: n_chars_q, n_words, n_digits, n_upper, n_alpha, alpha_ratio.

    Counts use ASCII classes so the DuckDB oracle (regexp_replace with the
    same classes) is bit-identical. Fully vectorized in pyarrow.compute —
    no Python row loop (single-char classes: match count == char count;
    word count = non-overlapping ``\\S+`` matches == len(str.split())).
    """
    text = pc.fill_null(batch[text_col], "")
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_words = _count_re(text, r"\S+")
    n_digits = _count_re(text, "[0-9]")
    n_upper = _count_re(text, "[A-Z]")
    n_alpha = _count_re(text, "[A-Za-z]")
    def _np(a):
        return (
            a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        ).to_numpy(zero_copy_only=False)

    alpha_ratio = _np(n_alpha).astype(np.float64) / np.maximum(_np(n_chars), 1)
    batch = batch.append_column("n_chars_q", n_chars)
    batch = batch.append_column("n_words", n_words)
    batch = batch.append_column("n_digits", n_digits)
    batch = batch.append_column("n_upper", n_upper)
    batch = batch.append_column("n_alpha", n_alpha)
    batch = batch.append_column("alpha_ratio", pa.array(alpha_ratio))
    return batch


# Gopher stop-word presence list (Rae et al. 2021, appendix A1.1): a doc
# must contain at least 2 of these to pass the stop-word rule.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """attaches: Gopher-rule quality counters + per-rule booleans +
    ``gopher_pass`` (Rae et al. 2021, "Scaling Language Models", appendix
    A1.1 quality heuristics — the canonical pre-training quality filter;
    generalizes the reference's surface-feature booleans,
    SurfaceEncoder.java:60-82, from token level to document level).

    Rules (thresholds exactly Gopher's):
      * word count in [50, 100000]
      * mean word length in [3, 10]
      * symbol-to-word ratio (# and ...) <= 0.1
      * <= 90% of lines start with a bullet (- * •)
      * <= 30% of lines end with an ellipsis
      * >= 80% of words contain an alphabetic character
      * >= 2 distinct stop words from GOPHER_STOPWORDS

    All counters are non-overlapping RE2 match counts (pyarrow and DuckDB
    both embed RE2, so the oracle is bit-identical); every rule is an
    integer cross-multiplication (e.g. mean-word-length 3 <= wc/n <= 10
    becomes 3n <= wc AND wc <= 10n), so no float ever crosses the engine
    boundary. Fully vectorized — the only per-word pass is an Arrow
    flatten + regex match, no Python row loop.
    """
    text = pc.fill_null(batch[text_col], "")
    n_words = _count_re(text, r"\S+")
    n_word_chars = _count_re(text, r"\S")
    n_symbols = _count_re(text, r"#|\.\.\.")
    n_lines = pc.cast(
        pc.add(pc.count_substring(text, "\n"), pa.scalar(1)), pa.int64()
    )
    n_bullet_lines = _count_re(text, r"(?m)^[ \t]*[-*•]")
    n_ellipsis_lines = _count_re(text, r"(?m)(\.\.\.|…)$")

    # words containing at least one alphabetic char: flatten the \S+
    # tokens (regex split keeps ASCII-whitespace semantics identical to
    # the oracle's regexp_extract_all '\S+') and match per token.
    toks = pc.split_pattern_regex(text, r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    is_alpha_word = pc.and_(
        pc.not_equal(flat, ""), pc.match_substring_regex(flat, "[A-Za-z]")
    )
    off = np.asarray(toks.offsets, dtype=np.int64)
    cum = np.concatenate(
        [[0], np.cumsum(np.asarray(is_alpha_word, dtype=np.int64))]
    )
    n_alpha_words = pa.array(cum[off[1:]] - cum[off[:-1]], pa.int64())

    low = pc.utf8_lower(text)
    hits = None
    for w in GOPHER_STOPWORDS:
        h = pc.cast(
            pc.match_substring_regex(low, r"\b%s\b" % w), pa.int64()
        )
        hits = h if hits is None else pc.add(hits, h)
    n_stopword_hits = pc.cast(hits, pa.int64())

    def _np(a):
        return (
            a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        ).to_numpy(zero_copy_only=False)

    nw = _np(n_words)
    wc = _np(n_word_chars)
    sym = _np(n_symbols)
    nl = _np(n_lines)
    bl = _np(n_bullet_lines)
    el = _np(n_ellipsis_lines)
    aw = _np(n_alpha_words)
    sw = _np(n_stopword_hits)

    r_word_count = (nw >= 50) & (nw <= 100000)
    r_word_len = (3 * nw <= wc) & (wc <= 10 * nw)
    r_symbol = 10 * sym <= nw
    r_bullet = 10 * bl <= 9 * nl
    r_ellipsis = 10 * el <= 3 * nl
    r_alpha = 10 * aw >= 8 * nw
    r_stopword = sw >= 2
    gopher_pass = (
        r_word_count
        & r_word_len
        & r_symbol
        & r_bullet
        & r_ellipsis
        & r_alpha
        & r_stopword
    )

    for name, col in (
        ("n_words", n_words),
        ("n_word_chars", n_word_chars),
        ("n_symbols", n_symbols),
        ("n_lines", n_lines),
        ("n_bullet_lines", n_bullet_lines),
        ("n_ellipsis_lines", n_ellipsis_lines),
        ("n_alpha_words", n_alpha_words),
        ("n_stopword_hits", n_stopword_hits),
        ("r_word_count", pa.array(r_word_count)),
        ("r_word_len", pa.array(r_word_len)),
        ("r_symbol", pa.array(r_symbol)),
        ("r_bullet", pa.array(r_bullet)),
        ("r_ellipsis", pa.array(r_ellipsis)),
        ("r_alpha", pa.array(r_alpha)),
        ("r_stopword", pa.array(r_stopword)),
        ("gopher_pass", pa.array(gopher_pass)),
    ):
        batch = batch.append_column(name, col)
    return batch


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """attaches: n_ws_tokens (whitespace), n_bpe_tokens (BPE-ish regex).
    Vectorized: both counts are non-overlapping regex match counts."""
    text = pc.fill_null(batch[text_col], "")
    batch = batch.append_column("n_ws_tokens", _count_re(text, r"\S+"))
    batch = batch.append_column("n_bpe_tokens", _count_re(text, BPE_TOKEN_SQL))
    return batch


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """attaches: fingerprint = md5 of the whitespace-normalized, lowercased
    text (document fingerprinting; DuckDB-reproducible)."""
    texts = batch[text_col].to_pylist()
    fps = [
        hashlib.md5(_WS_RUN_RE.sub(" ", (t or "").lower()).encode("utf-8")).hexdigest()
        for t in texts
    ]
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def content_hash(batch: pa.Table, text_col: str = "text", col: str = "text_hash") -> pa.Table:
    """attaches: 16-byte blake2b hex digest of the exact text (exact-dedup key)."""
    texts = batch[text_col].to_pylist()
    hs = [
        hashlib.blake2b((t or "").encode("utf-8"), digest_size=16).hexdigest()
        for t in texts
    ]
    return batch.append_column(col, pa.array(hs, pa.string()))


def language_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """attaches: pred_lang (heuristic n-gram/stopword detector)."""
    texts = batch[text_col].to_pylist()
    return batch.append_column(
        "pred_lang", pa.array([detect_language(t or "") for t in texts], pa.string())
    )


def _doc_word_codes(texts, lower: bool = True, nonword: str = r"\W+"):
    """(doc_of, codes, dictionary) of word tokens per document — fully
    vectorized: ``nonword`` chars become spaces
    (``replace_substring_regex``), whitespace split, dictionary-encode.
    ``doc_of[i]`` is the row index of flat word ``i``; ``codes[i]`` its
    index into ``dictionary`` (the batch's distinct words).

    The default ``nonword`` matches RE2 ASCII ``\\w+`` words — identical
    to the DuckDB oracles' ``regexp_extract_all(..., '\\w+')``; pass
    ``"[^a-z0-9]+"`` for the alnum-only tokenization some oracles use.
    """
    t = pc.fill_null(texts, "")
    if lower:
        t = pc.utf8_lower(t)
    t = pc.replace_substring_regex(t, nonword, " ")
    lst = pc.utf8_split_whitespace(t)
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = lst.flatten()
    keep = pc.not_equal(flat, "")
    words = flat.filter(keep).dictionary_encode()
    codes = np.asarray(words.indices, dtype=np.int64)
    o = np.asarray(lst.offsets, dtype=np.int64)
    cum = np.concatenate([[0], np.cumsum(np.asarray(keep, dtype=np.int64))])
    n_words = cum[o[1:]] - cum[o[:-1]]
    doc_of = np.repeat(np.arange(len(n_words)), n_words)
    return doc_of, codes, words.dictionary


_GRAM_P1 = np.uint64(0x9E3779B97F4A7C15)
_GRAM_P2 = np.uint64(0xC2B2AE3D27D4EB4F)


from functools import lru_cache


@lru_cache(maxsize=1024)
def _triu_cached(L: int):
    """Upper-triangle index pair for segment length L (lengths repeat
    heavily across documents, so the allocations amortize). Module-level
    so closures that use it stay cloudpickle-able."""
    return np.triu_indices(L, k=1)


def _gram_hashes(texts, n: int, with_pos: bool = False):
    """(doc_of, gh, gl[, pos]) — one 128-bit fingerprint (two independent
    rolling FNV combines over per-word hashes) per word ``n``-gram,
    windows masked at document boundaries. ``with_pos`` additionally
    returns each gram's 0-based start word index WITHIN its document
    (for span-surgery consumers like dedup.substring_clean)."""
    from ..core.strhash import utf8_hash64

    empty = (np.zeros(0, np.int64), np.zeros(0, np.uint64), np.zeros(0, np.uint64))
    if with_pos:
        empty = empty + (np.zeros(0, np.int64),)
    doc_of, codes, dictionary = _doc_word_codes(texts)
    if len(codes) < n:
        return empty
    vh = utf8_hash64(dictionary, seed=0)
    vl = utf8_hash64(dictionary, seed=1)
    wh, wl = vh[codes], vl[codes]
    m = len(codes) - n + 1
    gh = np.zeros(m, dtype=np.uint64)
    gl = np.zeros(m, dtype=np.uint64)
    for j in range(n):
        gh = gh * _GRAM_P1 + wh[j : j + m]
        gl = gl * _GRAM_P2 + wl[j : j + m]
    valid = doc_of[:m] == doc_of[n - 1 :]
    if not valid.any():
        return empty
    out_doc, out_gh, out_gl = doc_of[:m][valid], gh[valid], gl[valid]
    if not with_pos:
        return out_doc, out_gh, out_gl
    # 0-based word index of each valid window start within its doc:
    # doc_of (per flat word) is nondecreasing, so a doc's first flat
    # index is one searchsorted away.
    j = np.flatnonzero(valid)
    n_docs = int(doc_of[-1]) + 1 if len(doc_of) else 0
    doc_first = np.searchsorted(doc_of, np.arange(n_docs), side="left")
    pos = j - doc_first[out_doc]
    return out_doc, out_gh, out_gl, pos.astype(np.int64)


class ContaminationStage:
    """Actor-pool stage: flag documents sharing any word n-gram with a
    benchmark corpus (training-data DECONTAMINATION — e.g. strip eval-set
    overlap before training).

    requires: ``text`` — attaches: ``n_hits`` (count of the doc's DISTINCT
    n-grams present in the benchmark set), ``contaminated`` (bool).

    Scale shape: the benchmark n-gram set is built ONCE per actor in
    ``__init__`` from a ``ray.put`` broadcast (stored once in the object
    store, read zero-copy by every actor) and held as two SORTED numpy
    uint64 columns (a 128-bit gram fingerprint: independent rolling FNV
    combines over per-word hashes) — ~16 bytes per benchmark gram, vs ~100
    for a Python string set. The corpus streams through ``map_batches``
    with NO shuffle; the doc side is fully vectorized (RE2 word split,
    dictionary-encode, column-at-a-time word hashes, numpy window
    combine, ``searchsorted`` membership probe). Matching is by 128-bit
    fingerprint, not gram text: a false hit needs a 2^-128 collision
    (~1e-14 expected over 10^12 doc-grams x 10^7 benchmark grams).

    Word extraction is RE2 ``\\w+`` over the lowercased text — exactly the
    DuckDB oracle's ``regexp_extract_all(lower(text), '\\w+')`` (ASCII word
    classes; pyarrow and DuckDB share RE2 semantics).
    """

    def __init__(self, bench, n: int = 4, text_col: str = "text"):
        import ray

        if isinstance(bench, ray.ObjectRef):
            bench = ray.get(bench)
        self.n = n
        self.text_col = text_col
        # bench: either an iterable of benchmark TEXTS or a prebuilt set
        # of n-gram strings ("w1 w2 w3 w4" — each hashes via the same
        # per-word rolling combine, so text- and gram-built sets agree)
        if isinstance(bench, (set, frozenset)):
            texts = pa.array(sorted(bench), pa.string())
        else:
            texts = pa.array([t or "" for t in bench], pa.string())
        _, gh, gl = _gram_hashes(texts, n)
        if len(gh):
            order = np.lexsort((gl, gh))
            self._bench_gh = gh[order]
            self._bench_gl = gl[order]
        else:
            self._bench_gh = np.zeros(0, np.uint64)
            self._bench_gl = np.zeros(0, np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        doc_of, gh, gl = _gram_hashes(batch[self.text_col], self.n)
        hits = np.zeros(n_docs, np.int64)
        if len(gh) and len(self._bench_gh):
            lo = np.searchsorted(self._bench_gh, gh, "left")
            hi = np.searchsorted(self._bench_gh, gh, "right")
            cand = lo < hi
            hit = np.zeros(len(gh), bool)
            # benchmark gh values are near-unique; ranges longer than 1
            # (a 64-bit collision inside the benchmark set) get a scan
            simple = cand & (hi - lo == 1)
            hit[simple] = self._bench_gl[lo[simple]] == gl[simple]
            for i in np.flatnonzero(cand & (hi - lo > 1)):
                hit[i] = bool(
                    (self._bench_gl[lo[i] : hi[i]] == gl[i]).any()
                )
            if hit.any():
                # count DISTINCT hitting grams per doc
                tr = np.stack(
                    [doc_of[hit].astype(np.uint64), gh[hit], gl[hit]], axis=1
                )
                tr = np.unique(tr, axis=0)
                hits = np.bincount(
                    tr[:, 0].astype(np.int64), minlength=n_docs
                ).astype(np.int64)
        batch = batch.append_column("n_hits", pa.array(hits, pa.int64()))
        return batch.append_column(
            "contaminated", pa.array(hits > 0, pa.bool_())
        )


def stratified_hash_sample(
    batch: pa.Table,
    rates: dict,
    default_rate: float = 0.2,
    text_col: str = "text",
    stratum_col: str = "lang",
) -> pa.Table:
    """Deterministic stratified sampling: keep a row iff
    ``md5(text) < rate_for_stratum`` (hex-string compare = uniform [0,1)
    draw keyed by content). Per-stratum rates rebalance skewed strata
    (e.g. upsample minority languages) without any shuffle, RNG state, or
    coordination — the decision is a pure function of the row, so the
    sample is REPRODUCIBLE across runs, cluster sizes and block layouts,
    and any node can re-derive membership (the property random() lacks).
    """
    from ..pipelines.curation import _md5_h32

    h32 = _md5_h32(batch[text_col])
    strata = batch[stratum_col].to_pylist()
    thresholds = {k: int(v * 16**8) for k, v in rates.items()}
    default_th = int(default_rate * 16**8)
    thr = np.fromiter(
        (thresholds.get(s, default_th) for s in strata), np.int64, len(strata)
    )
    return batch.filter(pa.array(h32 < thr, pa.bool_()))


# --- PII redaction ----------------------------------------------------------
# RE2 syntax only: pyarrow's replace_substring_regex and DuckDB's
# regexp_replace BOTH compile with RE2, so one pattern string is
# bit-identical across the engine and its oracle. Conservative patterns
# (redacting too little beats mangling numerics): emails, dotted-quad
# IPv4, and international +CC-NNN-NNNN phone forms.
PII_PATTERNS = (
    ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "n_emails"),
    ("<IP>", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "n_ips"),
    ("<PHONE>", r"\+\d{1,3}[- ]\d{3}[- ]\d{4}", "n_phones"),
)


def pii_redact(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact PII in ``text_col`` (emails -> <EMAIL>, IPv4 -> <IP>,
    phones -> <PHONE>), appending the redacted string as ``redacted``
    plus per-kind match counts. Fully vectorized (three regex passes in
    Arrow's RE2); order matters — emails first so user@10.0.0.1 hosts
    count as email, then IPs, then phones. Zero-shuffle, stateless."""
    text = pc.fill_null(batch[text_col], "")
    counts = {}
    redacted = text
    for token, pattern, cname in PII_PATTERNS:
        counts[cname] = pc.cast(
            pc.count_substring_regex(redacted, pattern), pa.int64()
        )
        redacted = pc.replace_substring_regex(redacted, pattern, token)
    batch = batch.append_column("redacted", redacted)
    for cname in ("n_emails", "n_ips", "n_phones"):
        batch = batch.append_column(cname, counts[cname])
    return batch


def repetition_stats(batch: pa.Table, text_col: str = "text", n: int = 3) -> pa.Table:
    """Gopher-style repetition quality signals (Rae et al. 2021, table A1
    'repetition removal'), per document over case-folded ``\\w+`` words:

    - ``n_words_q`` / ``n_distinct_words`` — type/token counts,
    - ``top_word_count`` — occurrences of the single most frequent word,
    - ``n_ngrams`` / ``n_distinct_ngrams`` — word ``n``-gram instances vs
      distinct (their gap = mass sitting in repeated n-grams),
    - ``rep_keep`` — the filter verdict under the classic thresholds
      top-word fraction <= 0.2 and duplicate-n-gram fraction <= 0.4,
      evaluated in INTEGER arithmetic (5*top <= total;
      5*(total-distinct) <= 2*total) so the DuckDB oracle is bit-equal.

    Per-doc Counter scan (token-level stats are inherently per-document,
    like tokenization); stateless, zero-shuffle, integer outputs feed
    partial aggregation.
    """
    from collections import Counter

    tw, dw, top, tn, dn = [], [], [], [], []
    for t in batch[text_col].to_pylist():
        words = _WORD_FINDALL((t or "").lower())
        c = Counter(words)
        tw.append(len(words))
        dw.append(len(c))
        top.append(max(c.values()) if c else 0)
        grams = Counter(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        tn.append(sum(grams.values()))
        dn.append(len(grams))
    batch = batch.append_column("n_words_q", pa.array(tw, pa.int64()))
    batch = batch.append_column("n_distinct_words", pa.array(dw, pa.int64()))
    batch = batch.append_column("top_word_count", pa.array(top, pa.int64()))
    batch = batch.append_column("n_ngrams", pa.array(tn, pa.int64()))
    batch = batch.append_column("n_distinct_ngrams", pa.array(dn, pa.int64()))
    keep = [
        w > 0 and 5 * tc <= w and 5 * (g - d) <= 2 * g
        for w, tc, g, d in zip(tw, top, tn, dn)
    ]
    return batch.append_column("rep_keep", pa.array(keep, pa.bool_()))


def cross_source_overlap(ds, n: int = 8, text_col: str = "text", source_col: str = "source"):
    """Cross-source n-gram overlap matrix — the decontamination analytic
    behind "how much does corpus A leak into corpus B": for every source
    pair, the number of distinct word ``n``-grams they share.
    pandas DataFrame[(source_a, source_b, n_shared_ngrams)].

    Shape (no per-gram Python, no quadratic join):
    1. collect the distinct sources (tiny aggregate) and assign each a
       BIT in an int64 mask — sources are low-cardinality by definition
       (cap 63 here; beyond that, span several mask columns),
    2. each batch emits DISTINCT (gram-hash128, bit) rows — the
       per-batch dedup caps the shuffle at one row per gram per source
       per block.  The gram identity is two independent 64-bit
       polynomial combines over per-WORD hashes: words are
       dictionary-encoded per batch and hashed column-at-a-time
       (core/strhash.utf8_hash64 — no Python loop over words either),
       and the n-gram windows are pure numpy (window validity masks doc
       boundaries),
    3. ``groupby((gh, gl, bit)).count`` dedupes globally; ``groupby(
       (gh, gl)).Sum(bit)`` then reconstructs each gram's exact
       source-set mask (every bit now appears once, so SUM == OR),
    4. one vectorized pass turns each mask block into a membership
       matrix B and accumulates the pair-count matrix B^T @ B — the
       |sources|^2 result is driver-sized, the grams never are.
    """
    from ray.data.aggregate import Sum

    from ..core.strhash import utf8_hash64

    srcs = sorted(
        r[source_col]
        for r in ds.groupby(source_col).count().take_all()
    )
    if len(srcs) > 63:
        raise ValueError("cross_source_overlap: >63 sources needs multi-column masks")
    bit_of = {s: np.int64(1 << i) for i, s in enumerate(srcs)}
    P1, P2 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "gh": pa.array([], pa.int64()),
                "gl": pa.array([], pa.int64()),
                "bit": pa.array([], pa.int64()),
            }
        )
        # ascii_split_whitespace: grams are \S+ word windows in the
        # DuckDB oracle (RE2 ASCII \s), so Unicode spaces must not split
        lst = pc.ascii_split_whitespace(
            pc.fill_null(batch[text_col], "")
        ).combine_chunks()
        flat = lst.flatten()
        keep = pc.not_equal(flat, "")
        words = flat.filter(keep).dictionary_encode()
        codes = np.asarray(words.indices, dtype=np.int64)
        if len(codes) < n:
            return empty
        # two independent 64-bit hashes once per DISTINCT word in the
        # batch (column-at-a-time FNV); fancy-index to flat
        vh = utf8_hash64(words.dictionary, seed=0)
        vl = utf8_hash64(words.dictionary, seed=1)
        wh, wl = vh[codes], vl[codes]
        # doc id per flat word position (empty-filtered counts via offsets)
        o = np.asarray(lst.offsets)
        cum = np.concatenate([[0], np.cumsum(np.asarray(keep, dtype=np.int64))])
        n_words = cum[o[1:]] - cum[o[:-1]]
        doc_of = np.repeat(np.arange(len(n_words)), n_words)
        # rolling polynomial combine over n positions (uint64 wraparound)
        m = len(codes) - n + 1
        gh = np.zeros(m, dtype=np.uint64)
        gl = np.zeros(m, dtype=np.uint64)
        for j in range(n):
            gh = gh * P1 + wh[j : j + m]
            gl = gl * P2 + wl[j : j + m]
        valid = doc_of[: m] == doc_of[n - 1 :]
        if not valid.any():
            return empty
        bits = np.array(
            [bit_of[s] for s in batch[source_col].to_pylist()], dtype=np.int64
        )[doc_of[:m][valid]]
        tr = np.stack(
            [gh[valid].view(np.int64), gl[valid].view(np.int64), bits], axis=1
        )
        tr = np.unique(tr, axis=0)  # per-batch distinct caps the shuffle
        return pa.table(
            {
                "gh": pa.array(tr[:, 0], pa.int64()),
                "gl": pa.array(tr[:, 1], pa.int64()),
                "bit": pa.array(tr[:, 2], pa.int64()),
            }
        )

    # combine: ONE gram-hash bucket exchange + block-local dedupe/OR
    # (the pair-hash reduceat idiom — two chained multi-key sort
    # aggregates over the gram domain were the basket-family 8x cliff).
    # Buckets partition grams, so the in-bucket structured unique IS the
    # global (gh, gl, bit) dedupe, and with each bit then unique per
    # gram the segment sum reconstructs the exact source-set mask.
    n_gram_buckets = 96

    def gram_bucket(batch: pa.Table) -> pa.Table:
        gh = np.asarray(batch["gh"], dtype=np.int64)
        gl = np.asarray(batch["gl"], dtype=np.int64)
        h = gh.view(np.uint64) * P1 ^ gl.view(np.uint64) * P2
        gb = ((h >> np.uint64(33)) % np.uint64(n_gram_buckets)).astype(
            np.int64
        )
        return batch.append_column("gb", pa.array(gb, pa.int64()))

    def or_masks(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    "gh": pa.array([], pa.int64()),
                    "gl": pa.array([], pa.int64()),
                    "mask": pa.array([], pa.int64()),
                }
            )
        tr = np.stack(
            [
                np.asarray(group["gh"], dtype=np.int64),
                np.asarray(group["gl"], dtype=np.int64),
                np.asarray(group["bit"], dtype=np.int64),
            ],
            axis=1,
        )
        tr = np.unique(tr, axis=0)  # lexsorted: (gh, gl) runs contiguous
        key_new = np.concatenate(
            [[True], (tr[1:, 0] != tr[:-1, 0]) | (tr[1:, 1] != tr[:-1, 1])]
        )
        idx = np.flatnonzero(key_new)
        mask = np.add.reduceat(tr[:, 2], idx)
        return pa.table(
            {
                "gh": pa.array(tr[idx, 0], pa.int64()),
                "gl": pa.array(tr[idx, 1], pa.int64()),
                "mask": pa.array(mask, pa.int64()),
            }
        )

    masks = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(gram_bucket, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(or_masks, batch_format="pyarrow")
    )

    S = len(srcs)

    def pair_counts(batch: pa.Table) -> pa.Table:
        m = np.asarray(batch["mask"].combine_chunks(), dtype=np.int64)
        B = ((m[:, None] >> np.arange(S)[None, :]) & 1).astype(np.int32)
        C = B.T @ B
        a_idx, b_idx = np.triu_indices(S, k=1)
        cnt = C[a_idx, b_idx].astype(np.int64)
        keep = cnt > 0
        return pa.table(
            {
                "source_a": pa.array([srcs[i] for i in a_idx[keep]], pa.string()),
                "source_b": pa.array([srcs[j] for j in b_idx[keep]], pa.string()),
                "n_shared_ngrams": pa.array(cnt[keep]),
            }
        )

    out = (
        masks.map_batches(pair_counts, batch_format="pyarrow")
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("n_shared_ngrams", alias_name="n_shared_ngrams"))
        .sort(["source_a", "source_b"])
    )
    return out


def term_cooccurrence(
    ds,
    vocab_size: int = 500,
    top_k: int = 50,
    text_col: str = "text",
):
    """Top co-occurring frequent-term pairs: among the ``vocab_size``
    highest-document-frequency words, the ``top_k`` unordered pairs that
    share the most documents (the counting core of PMI / collocation
    mining). Returns Dataset[(word_a, word_b, n_docs)], word_a < word_b,
    ordered by (n_docs desc, word_a, word_b) — a total order, so the
    cut is deterministic and oracle-checkable.

    Scale shape — pair explosion bounded at every step:
    1. frequent-vocab pass: per-batch DISTINCT (doc, word) then a
       ``groupby(word).Sum`` of partial doc-counts; top ``vocab_size``
       by (count, word) collected ONCE to the driver (vocab-sized) and
       closure-broadcast;
    2. pair pass: per doc only vocab members survive, giving <=
       C(k_doc, 2) index pairs via one triu per doc row-local, and the
       batch pre-aggregates duplicate pairs (np.unique) before the
       shuffle — the exchange carries (a, b, n) partials, never docs;
    3. ``groupby((a, b)).Sum`` then a pair-table-sized sort + limit.
    """
    from ray.data.aggregate import Sum

    _df_empty = pa.table(
        {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )

    def df_partial(batch: pa.Table) -> pa.Table:
        doc_of, codes, dictionary = _doc_word_codes(batch[text_col])
        if len(codes) == 0:
            return _df_empty
        V = len(dictionary)
        u = np.unique(doc_of * V + codes)  # distinct (doc, word)
        wc = np.bincount(u % V, minlength=V)
        nz = np.flatnonzero(wc)
        return pa.table(
            {
                "word": dictionary.take(pa.array(nz, pa.int64())),
                "n": pa.array(wc[nz], pa.int64()),
            }
        )

    df = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "word"], descending=[True, False])
        .limit(vocab_size)
        .take_all()
    )
    vocab = {r["word"]: i for i, r in enumerate(df)}
    words_sorted = sorted(vocab, key=lambda w: vocab[w])

    _pair_empty = pa.table(
        {"p": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        doc_of, codes, dictionary = _doc_word_codes(batch[text_col])
        if len(codes) == 0:
            return _pair_empty
        # batch-dictionary words -> global vocab ranks (one lookup per
        # DISTINCT word in the batch, not per occurrence)
        rank = np.fromiter(
            (vocab.get(w, -1) for w in dictionary.to_pylist()),
            np.int64,
            len(dictionary),
        )
        r = rank[codes]
        keep = r >= 0
        if not keep.any():
            return _pair_empty
        V = np.int64(len(vocab))
        u = np.unique(doc_of[keep] * V + r[keep])  # distinct (doc, rank)
        d = u // V
        rr = u % V
        cuts = np.flatnonzero(np.diff(d)) + 1
        starts = np.concatenate([[0], cuts])
        ends = np.concatenate([cuts, [len(u)]])
        pairs: List[np.ndarray] = []
        for s, e in zip(starts, ends):
            L = int(e - s)
            if L >= 2:
                iu, ju = _triu_cached(L)
                seg = rr[s:e]  # ascending ranks, so seg[iu] < seg[ju]
                pairs.append(seg[iu] * V + seg[ju])
        if not pairs:
            return _pair_empty
        keys, n = np.unique(np.concatenate(pairs), return_counts=True)
        return pa.table(
            {"p": pa.array(keys, pa.int64()), "n": pa.array(n.astype(np.int64), pa.int64())}
        )

    counted = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("p")
        .aggregate(Sum("n", alias_name="n_docs"))
    )

    def decode(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch["p"], dtype=np.int64)
        a = p // len(vocab)
        b = p % len(vocab)
        # pair keys are by vocab RANK (i < j); present alphabetically so
        # (word_a < word_b) matches the oracle's a.word < b.word join
        pairs = [
            tuple(sorted((words_sorted[i], words_sorted[j])))
            for i, j in zip(a, b)
        ]
        return pa.table(
            {
                "word_a": pa.array([x for x, _ in pairs], pa.string()),
                "word_b": pa.array([y for _, y in pairs], pa.string()),
                "n_docs": batch["n_docs"],
            }
        )

    return (
        counted.map_batches(decode, batch_format="pyarrow")
        .sort(["n_docs", "word_a", "word_b"], descending=[True, False, False])
        .limit(top_k)
    )


def c4_clean(
    ds,
    text_col: str = "text",
    keep_cols: tuple = ("doc_id",),
    min_words_per_line: int = 3,
    min_kept_lines: int = 1,
):
    """C4 cleaning heuristics (Raffel et al. 2020 §2.2, public): keep
    only lines that end in a terminal punctuation mark (. ! ? \"), have
    at least ``min_words_per_line`` words, and do not mention
    "javascript"; drop whole documents containing "lorem ipsum" or a
    curly brace, or with fewer than ``min_kept_lines`` surviving lines.
    Returns Dataset[keep_cols + (n_lines, n_kept, clean_text)] over the
    survivors, each rebuilt from its kept lines.

    Scale shape: entirely row-local — one stateless ``map_batches``
    pass, ZERO shuffle, no explode; all line predicates run as Arrow
    RE2 kernels over the flattened line array and documents reassemble
    through one offset-built ListArray + ``binary_join``.
    """

    def clean(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        lower = pc.utf8_lower(texts)
        bad_doc = pc.or_(
            pc.match_substring(lower, "lorem ipsum"),
            pc.match_substring(texts, "{"),
        )
        lines = pc.split_pattern(texts, "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = lines.flatten()
        offsets = np.asarray(lines.offsets, dtype=np.int64)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
        keep_line = (
            np.asarray(pc.match_substring_regex(flat, r'[.!?"]$'), bool)
            & (
                np.asarray(pc.count_substring_regex(flat, r"\w+"))
                >= min_words_per_line
            )
            & ~np.asarray(
                pc.match_substring_regex(flat, r"(?i)javascript"), bool
            )
        )
        n_lines = np.bincount(doc_of, minlength=n).astype(np.int64)
        n_kept = np.bincount(
            doc_of[keep_line], minlength=n
        ).astype(np.int64)
        keep_doc = (
            ~np.asarray(bad_doc, bool) & (n_kept >= min_kept_lines)
        )
        kept_flat = flat.filter(pa.array(keep_line))
        new_offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(n_kept, out=new_offsets[1:])
        rebuilt = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()), kept_flat
        )
        clean_text = pc.binary_join(rebuilt, "\n")
        mask = pa.array(keep_doc)
        cols = {c: batch[c].filter(mask) for c in keep_cols}
        cols["n_lines"] = pa.array(n_lines, pa.int64()).filter(mask)
        cols["n_kept"] = pa.array(n_kept, pa.int64()).filter(mask)
        cols["clean_text"] = clean_text.filter(mask)
        return pa.table(cols)

    return ds.map_batches(clean, batch_format="pyarrow")


def normalize_unicode(
    ds,
    text_col: str = "text",
    keep_cols: tuple = ("doc_id",),
):
    """Unicode canonicalization columns — the corpus-scale form of the
    reference's string normalizers (core/normalize.py mirrors
    WordHelpers.java:171-203): NFC composition plus accent stripping
    (canonical decomposition, combining marks removed). Returns
    Dataset[keep_cols + (len_raw, nfc_text, len_nfc, stripped_text,
    len_stripped)]; lengths are code-point counts (DuckDB ``length``).

    Row-local, zero shuffle. Accent strip is fully vectorized (Arrow
    NFD kernel + one RE2 ``\\p{Mn}`` removal). NFC composition runs
    ``unicodedata.normalize`` once per batch-DISTINCT text: pyarrow's
    ``utf8_normalize`` (16.x) decomposes but never RE-composes (NFC of
    U+00E1 returns U+0061 U+0301), so the C kernel can't express
    composition — the bounded per-distinct Python call is the exact
    fallback, same idiom as the md5 paths.
    """
    import unicodedata

    def norm(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col], "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        enc = texts.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        dic = enc.dictionary.to_pylist()
        nfc_dic = np.asarray(
            [unicodedata.normalize("NFC", t) for t in dic], dtype=object
        )
        nfc = pa.array(
            nfc_dic[codes] if len(codes) else [], pa.string()
        )
        nfd = pc.utf8_normalize(texts, form="NFD")
        stripped = pc.replace_substring_regex(nfd, r"\p{Mn}", "")
        cols = {c: batch[c] for c in keep_cols}
        cols["len_raw"] = pc.cast(pc.utf8_length(texts), pa.int64())
        cols["nfc_text"] = nfc
        cols["len_nfc"] = pc.cast(pc.utf8_length(nfc), pa.int64())
        cols["stripped_text"] = stripped
        cols["len_stripped"] = pc.cast(pc.utf8_length(stripped), pa.int64())
        return pa.table(cols)

    return ds.map_batches(norm, batch_format="pyarrow")


def vocab_coverage(
    ds,
    text_col: str = "text",
    num: int = 9,
    den: int = 10,
) -> pa.Table:
    """Nucleus-style vocabulary coverage: the MINIMUM number of distinct
    words (taken in decreasing frequency order) whose occurrences cover
    at least ``num/den`` of all corpus tokens — the statistic behind
    "how big must the tokenizer vocab be" sizing decisions. Returns one
    row (n_tokens, target, n_words_needed, boundary_cnt, vocab_size),
    exact integers (target = ceil(num*N/den)).

    Scale shape: pass 1 is the standard vocabulary-bounded
    ``groupby(word)`` count; pass 2 collapses the vocab table to its
    COUNT-OF-COUNTS histogram (per-batch partials over (count ->
    n_words, token_mass), one tiny groupby over the count domain) and
    the driver inverts the cumulative histogram — words with equal
    count are interchangeable, so the count-of-counts is sufficient and
    nothing vocabulary-sized reaches the driver.
    """
    from ray.data.aggregate import Sum

    def word_partial(batch: pa.Table) -> pa.Table:
        _, codes, dic = _doc_word_codes(batch[text_col])
        return pa.table(
            {
                "w": dic,
                "c": pa.array(
                    np.bincount(codes, minlength=len(dic)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    vocab = (
        ds.map_batches(word_partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("c", alias_name="c"))
    )

    def coc_partial(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["c"], dtype=np.int64)
        uniq, n_at = np.unique(c, return_counts=True)
        return pa.table(
            {
                "c": pa.array(uniq, pa.int64()),
                "n_words": pa.array(n_at.astype(np.int64), pa.int64()),
                "mass": pa.array(uniq * n_at, pa.int64()),
            }
        )

    hist = (
        vocab.map_batches(coc_partial, batch_format="pyarrow")
        .groupby("c")
        .aggregate(
            Sum("n_words", alias_name="n_words"),
            Sum("mass", alias_name="mass"),
        )
        .to_pandas()
    )
    schema = {
        "n_tokens": pa.int64(),
        "target": pa.int64(),
        "n_words_needed": pa.int64(),
        "boundary_cnt": pa.int64(),
        "vocab_size": pa.int64(),
    }
    if len(hist) == 0:
        return pa.table({k: pa.array([], t) for k, t in schema.items()})
    hist = hist.sort_values("c", ascending=False)
    counts = hist["c"].to_numpy().astype(np.int64)
    n_words = hist["n_words"].to_numpy().astype(np.int64)
    mass = hist["mass"].to_numpy().astype(np.int64)
    n_tokens = int(mass.sum())
    target = (num * n_tokens + den - 1) // den
    cum = np.cumsum(mass)
    lvl = int(np.searchsorted(cum, target, side="left"))
    above = int(cum[lvl - 1]) if lvl > 0 else 0
    c_star = int(counts[lvl])
    needed = int(n_words[:lvl].sum()) + max(
        0, -(-(target - above) // c_star)
    )
    return pa.table(
        {
            "n_tokens": pa.array([n_tokens], pa.int64()),
            "target": pa.array([target], pa.int64()),
            "n_words_needed": pa.array([needed], pa.int64()),
            "boundary_cnt": pa.array([c_star], pa.int64()),
            "vocab_size": pa.array([int(n_words.sum())], pa.int64()),
        }
    )


def trending_terms(
    ds,
    text_col: str = "text",
    hour_col: str = "hour",
    ratio_num: int = 3,
    ratio_den: int = 1,
    min_count: int = 20,
):
    """Burst detection over a timestamped corpus: words whose count in
    hour h is at least ``ratio_num/ratio_den`` times their count in hour
    h-1 (absent -> 0) and at least ``min_count`` — the trending-terms /
    anomaly shape of log analytics. ``ds`` must carry an integer
    epoch-hour column (``hour_col``). Returns
    Dataset[(hour, word, cnt, prev_cnt)].

    Scale shape: per-batch (hour, word) partial counts (one np.unique
    over combined keys — no Python loop over words), ONE
    groupby((hour, word)) sum, then the counts table self-joins on
    (hour-1, word) — everything after the first exchange is bounded by
    distinct (hour, word) pairs, not corpus rows; integer
    cross-multiplication keeps the ratio test exact.
    """
    from ray.data.aggregate import Sum

    from .dedup import _compact, _join_partitions

    def partial(batch: pa.Table) -> pa.Table:
        hours = np.asarray(batch[hour_col], dtype=np.int64)
        doc_of, codes, dic = _doc_word_codes(batch[text_col])
        if len(codes) == 0:
            return pa.table(
                {
                    "hour": pa.array([], pa.int64()),
                    "word": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        V = np.int64(len(dic))
        key = hours[doc_of] * V + codes
        u, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "hour": pa.array(u // V, pa.int64()),
                "word": dic.take(pa.array(u % V)),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    counts = _compact(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["hour", "word"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    empty = pa.schema(
        [
            ("hour", pa.int64()),
            ("word", pa.string()),
            ("cnt", pa.int64()),
            ("prev_cnt", pa.int64()),
        ]
    ).empty_table()
    if counts is None:
        import ray.data

        return ray.data.from_arrow(empty)

    def shifted(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "hour" not in batch.column_names:
            return pa.table(
                {
                    "hm1": pa.array([], pa.int64()),
                    "word": pa.array([], pa.string()),
                    "prev_cnt": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "hm1": pc.add(batch["hour"], 1),
                "word": batch["word"],
                "prev_cnt": batch["cnt"],
            }
        )

    prev = _compact(counts.map_batches(shifted, batch_format="pyarrow"))
    joined = counts.join(
        prev,
        "left_outer",
        _join_partitions(),
        on=("hour", "word"),
        right_on=("hm1", "word"),
    )

    def burst(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "cnt" not in batch.column_names:
            return empty
        cnt = np.asarray(batch["cnt"], dtype=np.int64)
        prev_c = np.asarray(
            pc.fill_null(pc.cast(batch["prev_cnt"], pa.int64()), 0),
            dtype=np.int64,
        )
        keep = (cnt >= min_count) & (
            cnt * ratio_den >= ratio_num * prev_c
        )
        mask = pa.array(keep)
        return pa.table(
            {
                "hour": batch["hour"].filter(mask),
                "word": batch["word"].filter(mask),
                "cnt": pa.array(cnt[keep], pa.int64()),
                "prev_cnt": pa.array(prev_c[keep], pa.int64()),
            }
        )

    return joined.map_batches(burst, batch_format="pyarrow")


def char_entropy(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Per-document Shannon character entropy — the compression-ratio
    proxy quality filters use to flag machine-generated or degenerate
    text (low entropy = repeated boilerplate, high = encrypted/binary
    junk; the C4/Gopher-family heuristics' information-theoretic
    sibling). Returns (id_col, n_chars, ent_micro) where

        ent_micro = sum over distinct codepoints c of
                    floor(cnt_c * ln(n_chars / cnt_c) * 1e6 + 0.5)

    i.e. n_chars * H(doc) in natural-log micro units, an
    order-independent integer (exact oracle parity; divide by n_chars
    for bits-per-char after a / ln 2). Row-local, zero shuffle; the
    per-text codepoint histogram is one np.unique over a utf-32 view,
    run once per batch-DISTINCT text; ln runs once per distinct
    (cnt, len) pair per batch. Codepoint semantics match DuckDB's
    string_split(t, '') on NFC text (combining sequences would split
    differently — normalize first, see normalize_unicode)."""
    import math

    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    enc = pc.fill_null(texts, "").dictionary_encode()
    codes = np.asarray(enc.indices, dtype=np.int64)
    dic = enc.dictionary.to_pylist()
    n_chars = np.empty(len(dic), np.int64)
    ent = np.empty(len(dic), np.int64)
    ln_cache: dict = {}
    for i, t in enumerate(dic):
        cp = np.frombuffer(t.encode("utf-32-le"), np.uint32)
        L = len(cp)
        n_chars[i] = L
        if L == 0:
            ent[i] = 0
            continue
        _, cnt = np.unique(cp, return_counts=True)
        s = 0
        for c in np.unique(cnt):
            v = ln_cache.get((int(c), L))
            if v is None:
                v = math.log(float(L) / float(c))
                ln_cache[(int(c), L)] = v
            k = int(np.sum(cnt == c))
            s += k * math.floor(float(c) * v * 1e6 + 0.5)
        ent[i] = s
    return pa.table(
        {
            id_col: batch[id_col],
            "n_chars": pa.array(n_chars[codes], pa.int64()),
            "ent_micro": pa.array(ent[codes], pa.int64()),
        }
    )


def readability(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Flesch reading-ease score (Flesch 1948; the classic readability
    quality signal a curation pipeline buckets documents by) as an EXACT
    integer rational per document: Dataset[(id, n_words, n_sents,
    n_syllables, flesch_num, flesch_den)] with

        score      = 206.835 - 1.015 * W/S - 84.6 * Y/W
        flesch_num = 206835 * S * W - 1015 * W * W - 84600 * Y * S
        flesch_den = 1000 * S * W

    so no float ever crosses the engine boundary (the doc_quality /
    gopher_quality discipline; generalizes the reference's surface
    letter/char-class features, SurfaceEncoder.java:60-82, to a
    document-level readability counter).

    Counter definitions — all non-overlapping RE2 match counts, so the
    DuckDB mirror is bit-identical (both engines embed RE2):
      * W (words)     = ``\\S+`` matches,
      * S (sentences) = ``[.!?]+`` runs, floored at 1,
      * Y (syllables) = ``[aeiouyAEIOUY]+`` vowel groups PLUS one per
        word containing no vowel letter (the standard min-1-syllable-
        per-word correction).

    W = 0 yields the (0, 1, 0, 0, 0) row — undefined score, den 0 is
    never emitted. Row-local and fully vectorized (the only per-word
    pass is the same Arrow flatten + regex match gopher_quality uses);
    int64 products hold to W ~ 3e6 words per document.
    """
    text = pc.fill_null(batch[text_col], "")
    n_words = _count_re(text, r"\S+")
    n_sents_raw = _count_re(text, r"[.!?]+")
    n_vowel_groups = _count_re(text, r"[aeiouyAEIOUY]+")

    # words with no vowel letter (each still counts one syllable)
    toks = pc.split_pattern_regex(text, r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    no_vowel = pc.and_(
        pc.not_equal(flat, ""),
        pc.invert(pc.match_substring_regex(flat, "[aeiouyAEIOUY]")),
    )
    off = np.asarray(toks.offsets, dtype=np.int64)
    cum = np.concatenate([[0], np.cumsum(np.asarray(no_vowel, dtype=np.int64))])
    n_no_vowel = cum[off[1:]] - cum[off[:-1]]

    def _np(a):
        return (
            a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        ).to_numpy(zero_copy_only=False)

    W = _np(n_words)
    S = np.maximum(_np(n_sents_raw), 1)
    Y = _np(n_vowel_groups) + n_no_vowel
    num = 206835 * S * W - 1015 * W * W - 84600 * Y * S
    den = 1000 * S * W
    empty = W == 0
    num[empty] = 0
    den[empty] = 0
    return pa.table(
        {
            id_col: batch[id_col],
            "n_words": pa.array(W, pa.int64()),
            "n_sents": pa.array(S, pa.int64()),
            "n_syllables": pa.array(Y, pa.int64()),
            "flesch_num": pa.array(num, pa.int64()),
            "flesch_den": pa.array(den, pa.int64()),
        }
    )


def term_burstiness(
    ds,
    vocab_size: int = 100,
    text_col: str = "text",
):
    """Term burstiness for the ``vocab_size`` highest-document-frequency
    words: the variance-to-mean ratio (dispersion index) of each word's
    per-document count over ALL documents (zeros included) as an EXACT
    integer rational — Church & Gale 1995's content-word signal (VMR ~ 1:
    Poisson-scattered function word; VMR >> 1: bursty topical word).
    Returns Dataset[(word, df, sum_c, sum_c2, vmr_num, vmr_den)] ordered
    by (df desc, word), with

        vmr_num = N * sum_c2 - sum_c * sum_c
        vmr_den = N * sum_c            (N = total documents)

    Shape: per-batch (doc, word)-distinct partials reduce each word to
    three int64 counters (df, sum of counts, sum of squared counts) plus
    one batch-total row; ONE vocab-sized groupby, a vocab-sized
    sort+limit cut (df-desc with the word tiebreak — deterministic,
    oracle-checkable), and the rational on the cut table in Python ints
    with an int64 bounds check (N * sum_c2 wraps near 1e12 docs x hot
    words; cut the vocab or subsample first, raised not wrapped).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        doc_of, codes, dic = _doc_word_codes(
            batch[text_col], nonword="[^a-z0-9]+"
        )
        nd = len(dic)
        tables = []
        if nd:
            pair = doc_of * np.int64(nd) + codes
            u, c = np.unique(pair, return_counts=True)
            w = (u % nd).astype(np.int64)
            c = c.astype(np.int64)
            # reduce the (doc, word) pairs to per-word counters
            order = np.argsort(w, kind="stable")
            w, c = w[order], c[order]
            starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
            ends = np.r_[starts[1:], len(w)]
            cum = np.concatenate([[0], np.cumsum(c)])
            cum2 = np.concatenate([[0], np.cumsum(c * c)])
            tables.append(
                pa.table(
                    {
                        "kind": pa.array(np.ones(len(starts), np.int64), pa.int64()),
                        "word": dic.take(pa.array(w[starts], pa.int64())),
                        "df": pa.array(ends - starts, pa.int64()),
                        "sum_c": pa.array(cum[ends] - cum[starts], pa.int64()),
                        "sum_c2": pa.array(cum2[ends] - cum2[starts], pa.int64()),
                    }
                )
            )
        tables.append(
            pa.table(
                {
                    "kind": pa.array([0], pa.int64()),
                    "word": pa.array([""], pa.string()),
                    "df": pa.array([batch.num_rows], pa.int64()),
                    "sum_c": pa.array([0], pa.int64()),
                    "sum_c2": pa.array([0], pa.int64()),
                }
            )
        )
        return pa.concat_tables(tables).combine_chunks()

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["kind", "word"])
        .aggregate(
            Sum("df", alias_name="df"),
            Sum("sum_c", alias_name="sum_c"),
            Sum("sum_c2", alias_name="sum_c2"),
        )
    ).materialize()

    total_row = agg.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], 0)), batch_format="pyarrow"
    ).sum("df")
    N = int(total_row or 0)

    top = (
        agg.map_batches(
            lambda b: b.filter(pc.equal(b["kind"], 1)), batch_format="pyarrow"
        )
        .select_columns(["word", "df", "sum_c", "sum_c2"])
        .sort(["df", "word"], descending=[True, False])
        .limit(vocab_size)
    )

    _I64 = 2**63

    def final(batch: pa.Table) -> pa.Table:
        nums, dens = [], []
        for sc, sc2 in zip(
            batch["sum_c"].to_pylist(), batch["sum_c2"].to_pylist()
        ):
            num = N * sc2 - sc * sc
            den = N * sc
            if not (0 <= num < _I64 and 0 <= den < _I64):
                raise OverflowError(
                    "term_burstiness: counters exceed int64 — cut the "
                    "vocab or subsample (num=%d den=%d)" % (num, den)
                )
            nums.append(num)
            dens.append(den)
        return batch.append_column(
            "vmr_num", pa.array(nums, pa.int64())
        ).append_column("vmr_den", pa.array(dens, pa.int64()))

    return top.map_batches(final, batch_format="pyarrow")


def distinct_ngram_ratio(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Distinct-1 / distinct-2 generation-diversity counters per
    document (Li et al. 2016, "A Diversity-Promoting Objective" — the
    standard repetition/mode-collapse diagnostic, and a strong
    low-quality-document signal in curation): Dataset[(id, t1, d1, t2,
    d2)] with t_n the total and d_n the DISTINCT alnum word n-gram
    count (distinct-n = d_n / t_n; left rational — integers only cross
    the engine boundary). Row-local and fully vectorized: one
    dictionary-encode pass, per-doc distinct counting via one
    np.unique over (doc, gram) keys — no shuffle, no Python row loop.
    """
    doc_of, codes, dic = _doc_word_codes(batch[text_col], nonword="[^a-z0-9]+")
    n_rows = batch.num_rows
    t1 = np.zeros(n_rows, np.int64)
    d1 = np.zeros(n_rows, np.int64)
    t2 = np.zeros(n_rows, np.int64)
    d2 = np.zeros(n_rows, np.int64)
    nd = np.int64(max(len(dic), 1))
    if len(codes):
        np.add.at(t1, doc_of, 1)
        u = np.unique(doc_of * nd + codes)
        np.add.at(d1, (u // nd).astype(np.int64), 1)
    if len(codes) >= 2:
        valid = doc_of[:-1] == doc_of[1:]
        if valid.any():
            a, b = codes[:-1][valid], codes[1:][valid]
            dd = doc_of[:-1][valid]
            np.add.at(t2, dd, 1)
            u2 = np.unique((dd * nd + a) * nd + b)
            np.add.at(d2, (u2 // (nd * nd)).astype(np.int64), 1)
    return pa.table(
        {
            id_col: batch[id_col],
            "t1": pa.array(t1, pa.int64()),
            "d1": pa.array(d1, pa.int64()),
            "t2": pa.array(t2, pa.int64()),
            "d2": pa.array(d2, pa.int64()),
        }
    )


def log_odds_terms(
    ds,
    side_col: str,
    side_a: str,
    side_b: str,
    min_count: int = 10,
    top_k: int = 40,
    text_col: str = "text",
):
    """Most side-A-distinctive terms by log-odds with an informative
    Dirichlet prior (Monroe, Colaresi & Quinn 2008, "Fightin' Words" —
    the statistically-grounded alternative to raw TF-IDF deltas for
    corpus comparison; the prior shrinks rare-word odds toward the
    pooled corpus, killing the low-count blowup PMI needs min_count
    for). For word w with side counts y_a, y_b, pooled prior
    a_w = y_a + y_b and prior strength a_0 = n_a + n_b:

        delta = ln((y_a + a_w) / (n_a + a_0 - y_a - a_w))
              - ln((y_b + a_w) / (n_b + a_0 - y_b - a_w))

    reported as floor(delta * 1e6 + 0.5) — two int64→double divisions
    + two libm lns in the SAME parse-tree order as the SQL oracle.
    Returns Dataset[(word, cnt_a, cnt_b, delta_micro)] for words with
    pooled count >= ``min_count``, ordered by (delta_micro desc, word),
    top ``top_k`` — a total order, deterministic and oracle-checkable.

    Shape: per-batch tagged word-count partials (one row per distinct
    word with a cnt_a / cnt_b pair, plus a totals row), ONE vocab-sized
    groupby, scalar totals off the materialized aggregate, then a
    row-local scoring map and a candidate-sized sort + limit.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        side = pc.fill_null(batch[side_col], "")
        is_a = np.asarray(pc.equal(side, side_a), dtype=bool)
        is_b = np.asarray(pc.equal(side, side_b), dtype=bool)
        doc_of, codes, dic = _doc_word_codes(
            batch[text_col], nonword="[^a-z0-9]+"
        )
        nd = len(dic)
        tables = []
        ta = tb = 0
        if nd and len(codes):
            w_a = is_a[doc_of]
            w_b = is_b[doc_of]
            ca = np.bincount(codes[w_a], minlength=nd).astype(np.int64)
            cb = np.bincount(codes[w_b], minlength=nd).astype(np.int64)
            keep = (ca > 0) | (cb > 0)
            ta, tb = int(ca.sum()), int(cb.sum())
            if keep.any():
                idx = np.flatnonzero(keep)
                tables.append(
                    pa.table(
                        {
                            "kind": pa.array(
                                np.ones(len(idx), np.int64), pa.int64()
                            ),
                            "word": dic.take(pa.array(idx, pa.int64())),
                            "cnt_a": pa.array(ca[idx], pa.int64()),
                            "cnt_b": pa.array(cb[idx], pa.int64()),
                        }
                    )
                )
        tables.append(
            pa.table(
                {
                    "kind": pa.array([0], pa.int64()),
                    "word": pa.array([""], pa.string()),
                    "cnt_a": pa.array([ta], pa.int64()),
                    "cnt_b": pa.array([tb], pa.int64()),
                }
            )
        )
        return pa.concat_tables(tables).combine_chunks()

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["kind", "word"])
        .aggregate(
            Sum("cnt_a", alias_name="cnt_a"),
            Sum("cnt_b", alias_name="cnt_b"),
        )
    ).materialize()

    tot = agg.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], 0)), batch_format="pyarrow"
    ).to_pandas()
    n_a = int(tot["cnt_a"].sum()) if len(tot) else 0
    n_b = int(tot["cnt_b"].sum()) if len(tot) else 0
    a0 = n_a + n_b

    def score(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["kind"], 1))
        ya = np.asarray(batch["cnt_a"], dtype=np.int64)
        yb = np.asarray(batch["cnt_b"], dtype=np.int64)
        aw = ya + yb
        keep = aw >= min_count
        ya, yb, aw = ya[keep], yb[keep], aw[keep]
        words = batch["word"].filter(pa.array(keep))
        # SAME parse tree as the SQL oracle: two divisions, two lns
        ra = (ya + aw).astype(np.float64) / (n_a + a0 - ya - aw).astype(
            np.float64
        )
        rb = (yb + aw).astype(np.float64) / (n_b + a0 - yb - aw).astype(
            np.float64
        )
        delta = np.floor(
            (np.log(ra) - np.log(rb)) * 1e6 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "word": words,
                "cnt_a": pa.array(ya, pa.int64()),
                "cnt_b": pa.array(yb, pa.int64()),
                "delta_micro": pa.array(delta, pa.int64()),
            }
        )

    return (
        agg.map_batches(score, batch_format="pyarrow")
        .sort(["delta_micro", "word"], descending=[True, False])
        .limit(top_k)
    )


def source_kl(
    ds,
    group_col: str = "source",
    text_col: str = "text",
    model_max: int = 4_000_000,
):
    """Per-source KL divergence (micro-nats, exact integer
    accumulation) between each source's unigram distribution and the
    pooled corpus distribution — the "which source drifted" corpus
    diagnostic (the corpus-level analogue of DSIR's importance ratios,
    Xie et al. 2023). For source s with word count c_sw, source total
    n_s, corpus word total c_w and corpus total N:

        kl_micro(s) = sum_w c_sw * floor(ln((c_sw/n_s) / (c_w/N)) * 1e6 + 0.5)

    Rounding each per-word log-ratio to integer micro-nats BEFORE the
    weighted sum keeps the aggregation pure int64 — order-independent
    and bit-equal to the SQL oracle — while the two int64→double
    divisions + one libm ln sit in the same parse-tree order as the
    SQL. True KL = kl_micro / (n_s * 1e6), left rational. Returns
    Dataset[(source, n_terms, n_tokens, kl_micro)] sorted by source.

    Shape (the kn_logprob/pmi broadcast-model plan): ONE
    (source × word-fingerprint) counting aggregate — only (source,
    word, count) rows ever cross the wire, never corpus rows; the
    vocab-sized word-total side reduces from that materialized
    aggregate and broadcasts via ``ray.put`` as sorted 128-bit FNV
    numpy (``model_max`` guard — at 100 TB apply a count cutoff or
    shard by language first); source totals are a source-domain
    collect; then ONE scoring map with per-batch per-source int64
    partial sums and a source-domain groupby. Raises on int64
    overflow of c_sw * delta_micro (bounds-checked per batch).
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..core.strhash import utf8_hash64
    from .dedup import _compact
    from .lm import _fp_lookup, _fp_sorted

    def partial(batch: pa.Table) -> pa.Table:
        src = pc.fill_null(batch[group_col], "")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        senc = src.dictionary_encode()
        scodes = np.asarray(senc.indices, dtype=np.int64)
        doc_of, codes, dic = _doc_word_codes(
            batch[text_col], nonword="[^a-z0-9]+"
        )
        nd = len(dic)
        if nd == 0 or len(codes) == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "k0": pa.array([], pa.int64()),
                    "k1": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        key = scodes[doc_of] * np.int64(nd) + codes
        u, cnt = np.unique(key, return_counts=True)
        us, uw = u // nd, u % nd
        h0 = utf8_hash64(dic, 0).view(np.int64)
        h1 = utf8_hash64(dic, 1).view(np.int64)
        return pa.table(
            {
                group_col: pc.cast(
                    senc.dictionary.take(pa.array(us, pa.int64())),
                    pa.string(),
                ),
                "k0": pa.array(h0[uw], pa.int64()),
                "k1": pa.array(h1[uw], pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    empty = pa.table(
        {
            group_col: pa.array([], pa.string()),
            "n_terms": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "kl_micro": pa.array([], pa.int64()),
        }
    )
    agg = _compact(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "k0", "k1"])
        .aggregate(Sum("n", alias_name="n"))
    )
    if agg is None:
        return ray.data.from_arrow(empty)

    wt = (
        agg.groupby(["k0", "k1"])
        .aggregate(Sum("n", alias_name="cw"))
        .to_pandas()
    )
    if len(wt) > model_max:
        raise ValueError(
            "source_kl word model exceeds model_max=%d; apply a count "
            "cutoff or shard by language first" % model_max
        )
    st = agg.groupby(group_col).aggregate(Sum("n", alias_name="ns")).to_pandas()
    ns_of = dict(zip(st[group_col], st["ns"].astype(np.int64)))
    n_total = int(st["ns"].sum())
    wfp, cw_vals = _fp_sorted(
        wt["k0"].to_numpy().view(np.uint64),
        wt["k1"].to_numpy().view(np.uint64),
        wt["cw"].to_numpy().astype(np.int64),
    )
    ref = ray.put((wfp, cw_vals))

    def score(batch: pa.Table) -> pa.Table:
        wfp, cw_vals = ray.get(ref)
        cnt = np.asarray(batch["n"], dtype=np.int64)
        cw = _fp_lookup(
            wfp,
            cw_vals,
            np.asarray(batch["k0"], dtype=np.int64).view(np.uint64),
            np.asarray(batch["k1"], dtype=np.int64).view(np.uint64),
        )
        src = batch[group_col]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        senc = src.dictionary_encode()
        scodes = np.asarray(senc.indices, dtype=np.int64)
        sdic = senc.dictionary
        ns = np.array(
            [ns_of[s] for s in sdic.to_pylist()], dtype=np.int64
        )[scodes]
        # SAME parse tree as the SQL oracle: (cnt/ns) / (cw/N), one ln
        delta = np.floor(
            np.log(
                (cnt.astype(np.float64) / ns.astype(np.float64))
                / (cw.astype(np.float64) / np.float64(n_total))
            )
            * 1e6
            + 0.5
        ).astype(np.int64)
        if len(cnt) and float(
            np.max(cnt.astype(np.float64) * np.abs(delta).astype(np.float64))
        ) > float(2**62):
            raise OverflowError(
                "source_kl: c_sw * delta_micro overflows exact int64 — "
                "shard the corpus or apply a count cutoff first"
            )
        nsrc = len(sdic)
        kl = np.zeros(nsrc, np.int64)
        np.add.at(kl, scodes, cnt * delta)
        tok = np.zeros(nsrc, np.int64)
        np.add.at(tok, scodes, cnt)
        terms = np.bincount(scodes, minlength=nsrc).astype(np.int64)
        return pa.table(
            {
                group_col: pc.cast(sdic, pa.string()),
                "n_terms": pa.array(terms, pa.int64()),
                "n_tokens": pa.array(tok, pa.int64()),
                "kl_micro": pa.array(kl, pa.int64()),
            }
        )

    return (
        agg.map_batches(score, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(
            Sum("n_terms", alias_name="n_terms"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("kl_micro", alias_name="kl_micro"),
        )
        .sort(group_col)
    )


def zipf_fit(ds, top_v: int = 500, text_col: str = "text"):
    """Zipf rank-frequency fit over the corpus vocabulary (Zipf 1949;
    natural text has ln(freq) ~ -1 * ln(rank) + c — a corrupted or
    machine-generated corpus drifts off the power law, making the
    fitted slope a one-number corpus-health diagnostic). OLS of
    y = floor(ln(count)*1e6+0.5) on x = floor(ln(rank)*1e6+0.5) over
    the ``top_v`` most frequent terms (rank = row_number by
    (count desc, word) — a total order). Returns a one-row Dataset
    [(n_terms, sum_x, sum_y, sum_xx, sum_xy, slope_micro)]: the int64
    sufficient statistics plus the slope in integer micros, where the
    final rational (which exceeds int64) is formed in Python ints and
    divided double-vs-double exactly as the SQL oracle's HUGEINT ->
    DOUBLE cast.

    Shape: ONE vocab-sized counting aggregate (word, count) — the only
    exchange; a candidate-sized sort+limit; then the regression runs
    on the ``top_v``-row block driver-side (the host_gini one-block
    budget). Per-term micro rounding BEFORE the sums keeps every
    distributed quantity int64-exact.
    """
    import math

    import ray
    import ray.data
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        doc_of, codes, dic = _doc_word_codes(
            batch[text_col], nonword="[^a-z0-9]+"
        )
        nd = len(dic)
        if nd == 0:
            return pa.table(
                {
                    "word": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "word": dic,
                "cnt": pa.array(
                    np.bincount(codes, minlength=nd).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    top = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "word"], descending=[True, False])
        .limit(top_v)
        .to_pandas()
    )
    n = len(top)
    empty = pa.table(
        {
            "n_terms": pa.array([0], pa.int64()),
            "sum_x": pa.array([0], pa.int64()),
            "sum_y": pa.array([0], pa.int64()),
            "sum_xx": pa.array([0], pa.int64()),
            "sum_xy": pa.array([0], pa.int64()),
            "slope_micro": pa.array([0], pa.int64()),
        }
    )
    if n < 2:
        return ray.data.from_arrow(empty)
    rank = np.arange(1, n + 1, dtype=np.float64)
    cnt = top["cnt"].to_numpy().astype(np.float64)
    # SAME parse tree as the SQL oracle: ln(v) * 1e6 + 0.5, floor
    x = np.floor(np.log(rank) * 1e6 + 0.5).astype(np.int64)
    y = np.floor(np.log(cnt) * 1e6 + 0.5).astype(np.int64)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, sxy = int((x * x).sum()), int((x * y).sum())
    if max(abs(sxx), abs(sxy)) > 2**62:
        raise OverflowError(
            "zipf_fit sufficient statistics overflow int64 — lower top_v"
        )
    num = n * sxy - sx * sy  # Python ints: exceeds int64 by design
    den = n * sxx - sx * sx
    slope_micro = (
        0 if den == 0 else math.floor((float(num) / float(den)) * 1e6 + 0.5)
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "n_terms": pa.array([n], pa.int64()),
                "sum_x": pa.array([sx], pa.int64()),
                "sum_y": pa.array([sy], pa.int64()),
                "sum_xx": pa.array([sxx], pa.int64()),
                "sum_xy": pa.array([sxy], pa.int64()),
                "slope_micro": pa.array([slope_micro], pa.int64()),
            }
        )
    )


def textrank_keywords(
    ds,
    top_k: int = 30,
    min_len: int = 3,
    iterations: int = 2,
    text_col: str = "text",
    num_partitions: int | None = None,
    local_threshold: int = 2_000_000,
):
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the corpus-level word co-occurrence graph — distinct
    symmetric adjacency pairs of alnum tokens with ``len >= min_len``
    (adjacency computed AFTER the length filter, windows never cross
    document boundaries, self-loops dropped) — run for ``iterations``
    exact-integer rounds (pipelines/graph.py::pagerank micro-rank
    floor-division trajectory, bit-equal to unrolled SQL CTEs).
    Returns Dataset[(word, pr)] ordered by (pr desc, word), top
    ``top_k`` — a total order, deterministic and oracle-checkable.
    Reference analogue: TeXoo's keyword/heading surface features
    (core/features.py family) lifted to a corpus-global ranking.

    Shape: ONE tagged corpus pass emits per-batch-distinct edge rows
    (node ids = 64-bit FNV of the word — collision odds ~2^-64·|V|²,
    the engine-side id space; the oracle ranks the words themselves)
    plus (id, word) vocab rows; one groupby dedupes both; pagerank
    runs vocab-sized joins per round; one vocab-sized inner join maps
    ids back to words and a candidate-sized sort+limit finishes. The
    corpus text never shuffles — only distinct pairs do.

    When the deduped (edges + vocab) table is at most
    ``local_threshold`` rows, the trajectory runs driver-local in one
    vectorized numpy loop over the already-materialized aggregate
    instead of ~6 sequential vocab-sized Ray jobs (the bpe/kcore
    local-loop precedent — each tiny job costs ~1 s of launch; a
    path-equivalence test pins both branches to the same ranks). The
    distributed branch is the over-threshold path.
    """
    import ray.data
    from ray.data.aggregate import Count

    from ..core.strhash import utf8_hash64
    from .dedup import _compact

    def partial(batch: pa.Table) -> pa.Table:
        doc_of, codes, dic = _doc_word_codes(
            batch[text_col], nonword="[^a-z0-9]+"
        )
        empty = pa.table(
            {
                "kind": pa.array([], pa.int64()),
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "word": pa.array([], pa.string()),
            }
        )
        nd = len(dic)
        if nd == 0:
            return empty
        ok_code = np.asarray(
            pc.greater_equal(pc.utf8_length(dic), min_len), dtype=bool
        )
        keep = ok_code[codes]
        doc_of, codes = doc_of[keep], codes[keep]
        kept_codes = np.flatnonzero(ok_code)
        if len(kept_codes) == 0:
            return empty
        h = utf8_hash64(dic).view(np.int64)
        tables = [
            pa.table(
                {
                    "kind": pa.array(
                        np.zeros(len(kept_codes), np.int64), pa.int64()
                    ),
                    "src": pa.array(h[kept_codes], pa.int64()),
                    "dst": pa.array(
                        np.zeros(len(kept_codes), np.int64), pa.int64()
                    ),
                    "word": dic.take(pa.array(kept_codes, pa.int64())),
                }
            )
        ]
        if len(codes) >= 2:
            same = doc_of[1:] == doc_of[:-1]
            a, b = codes[:-1][same], codes[1:][same]
            ne = a != b
            a, b = a[ne], b[ne]
            if len(a):
                src = np.concatenate([h[a], h[b]])
                dst = np.concatenate([h[b], h[a]])
                m = np.empty((len(src), 2), np.int64)
                m[:, 0], m[:, 1] = src, dst
                mu = np.unique(m.view([("a", "<i8"), ("b", "<i8")]).ravel())
                tables.append(
                    pa.table(
                        {
                            "kind": pa.array(
                                np.ones(len(mu), np.int64), pa.int64()
                            ),
                            "src": pa.array(mu["a"], pa.int64()),
                            "dst": pa.array(mu["b"], pa.int64()),
                            "word": pa.array([""] * len(mu), pa.string()),
                        }
                    )
                )
        return pa.concat_tables(tables).combine_chunks()

    tagged = _compact(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["kind", "src", "dst", "word"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["kind", "src", "dst", "word"])
    )
    empty_out = pa.table(
        {"word": pa.array([], pa.string()), "pr": pa.array([], pa.int64())}
    )
    if tagged is None:
        return ray.data.from_arrow(empty_out)

    if tagged.count() <= local_threshold:
        # driver-local trajectory over the materialized aggregate —
        # identical integer ops to graph.pagerank, proven by the
        # path-equivalence test
        df = tagged.to_pandas()
        if len(df) == 0 or "kind" not in df.columns:
            return ray.data.from_arrow(empty_out)
        e = df[df["kind"] == 1]
        v = df[df["kind"] == 0]
        if len(e) == 0 or len(v) == 0:
            return ray.data.from_arrow(empty_out)
        src = e["src"].to_numpy(np.int64)
        dst = e["dst"].to_numpy(np.int64)
        uniq = np.unique(np.concatenate([src, dst]))
        si = np.searchsorted(uniq, src)
        di = np.searchsorted(uniq, dst)
        n = len(uniq)
        outdeg = np.bincount(si, minlength=n).astype(np.int64)
        scale, dn, dd = 1_000_000, 85, 100
        base = scale * (dd - dn) // dd
        prv = np.full(n, scale, np.int64)
        for _ in range(iterations):
            share = prv[si] * dn // (dd * np.maximum(outdeg[si], 1))
            nxt = np.full(n, base, np.int64)
            np.add.at(nxt, di, share)
            prv = nxt
        vid = v["src"].to_numpy(np.int64)
        pos = np.searchsorted(uniq, vid)
        ok = (pos < n) & (uniq[np.clip(pos, 0, n - 1)] == vid)
        words = v["word"].to_numpy()[ok].astype(str)
        ranks = prv[pos[ok]]
        order = np.lexsort((words, -ranks))[:top_k]
        return ray.data.from_arrow(
            pa.table(
                {
                    "word": pa.array(words[order], pa.string()),
                    "pr": pa.array(ranks[order], pa.int64()),
                }
            )
        )

    def keep_kind(k: int, cols):
        def f(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch["kind"], k))
            return t.select(list(cols))

        return f

    edges = _compact(
        tagged.map_batches(keep_kind(1, ["src", "dst"]), batch_format="pyarrow")
    )
    if edges is None:
        return ray.data.from_arrow(empty_out)

    def vocab_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["kind"], 0))
        return pa.table({"id": t["src"], "word": t["word"]})

    vocab = _compact(tagged.map_batches(vocab_rows, batch_format="pyarrow"))

    from ..pipelines.graph import pagerank

    pr = _compact(
        pagerank(edges, iterations=iterations, num_partitions=num_partitions)
    )
    if pr is None or vocab is None:
        return ray.data.from_arrow(empty_out)
    P = max(2, min(8, 1 + vocab.count() // 100_000))
    joined = pr.join(vocab, "inner", P, on=("id",))
    return (
        joined.map_batches(
            lambda b: pa.table({"word": b["word"], "pr": b["pr"]}),
            batch_format="pyarrow",
        )
        .sort(["pr", "word"], descending=[True, False])
        .limit(top_k)
    )


def js_divergence(ds, side_col: str = "side", text_col: str = "text"):
    """Jensen-Shannon divergence between the unigram distributions of
    two corpus snapshots (Lin 1991 — the symmetric, bounded drift
    measure; the textual sibling of the exact-rational KS drift):
    rows tagged ``side_col`` in {0, 1}. With p_w = c0_w/n0,
    q_w = c1_w/n1, m_w = (p_w + q_w)/2, reports

        js_old_micro = sum_{w: c0>0} c0_w * floor(ln(p_w / m_w)*1e6 + 0.5)
        js_new_micro = sum_{w: c1>0} c1_w * floor(ln(q_w / m_w)*1e6 + 0.5)

    so JS = (js_old/n0 + js_new/n1) / (2·1e6), left rational. Per-word
    micro rounding BEFORE the count-weighted sums keeps the
    aggregation pure order-independent int64, and the division/ln
    chain sits in the SQL oracle's parse-tree order. Returns a
    one-row Dataset[(n_old, n_new, terms_old, terms_new,
    js_old_micro, js_new_micro)].

    Shape: ONE (word-fingerprint × side-pair) counting aggregate —
    no word STRINGS ever leave the batch (the output is corpus-level,
    so 128-bit FNV keys suffice; the dsir/kn fingerprint precedent);
    scalar totals off the materialized aggregate; ONE scoring map
    emits per-block int64 partial sums and a final tiny Sum. Raises
    on int64 overflow of count * micro (bounds-checked per batch).
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..core.strhash import utf8_hash64

    def partial(batch: pa.Table) -> pa.Table:
        side = np.asarray(batch[side_col], dtype=np.int64)
        doc_of, codes, dic = _doc_word_codes(
            batch[text_col], nonword="[^a-z0-9]+"
        )
        nd = len(dic)
        empty = pa.table(
            {
                "k0": pa.array([], pa.int64()),
                "k1": pa.array([], pa.int64()),
                "c0": pa.array([], pa.int64()),
                "c1": pa.array([], pa.int64()),
            }
        )
        if nd == 0 or len(codes) == 0:
            return empty
        s_tok = side[doc_of]
        c0 = np.bincount(codes[s_tok == 0], minlength=nd).astype(np.int64)
        c1 = np.bincount(codes[s_tok == 1], minlength=nd).astype(np.int64)
        keep = (c0 > 0) | (c1 > 0)
        if not keep.any():
            return empty
        idx = np.flatnonzero(keep)
        h0 = utf8_hash64(dic, 0).view(np.int64)
        h1 = utf8_hash64(dic, 1).view(np.int64)
        return pa.table(
            {
                "k0": pa.array(h0[idx], pa.int64()),
                "k1": pa.array(h1[idx], pa.int64()),
                "c0": pa.array(c0[idx], pa.int64()),
                "c1": pa.array(c1[idx], pa.int64()),
            }
        )

    from .combine import bucket_sum

    agg = bucket_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["k0", "k1"],
        ["c0", "c1"],
    ).materialize()

    n0 = int(agg.sum("c0") or 0)
    n1 = int(agg.sum("c1") or 0)
    if n0 == 0 or n1 == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_old": pa.array([n0], pa.int64()),
                    "n_new": pa.array([n1], pa.int64()),
                    "terms_old": pa.array([0], pa.int64()),
                    "terms_new": pa.array([0], pa.int64()),
                    "js_old_micro": pa.array([0], pa.int64()),
                    "js_new_micro": pa.array([0], pa.int64()),
                }
            )
        )

    def score(batch: pa.Table) -> pa.Table:
        c0 = np.asarray(batch["c0"], dtype=np.int64)
        c1 = np.asarray(batch["c1"], dtype=np.int64)
        # SAME parse tree as the SQL oracle
        p = c0.astype(np.float64) / np.float64(n0)
        q = c1.astype(np.float64) / np.float64(n1)
        m = (p + q) / 2.0
        with np.errstate(divide="ignore", invalid="ignore"):
            dp = np.floor(np.log(p / m) * 1e6 + 0.5)
            dq = np.floor(np.log(q / m) * 1e6 + 0.5)
        tp = np.where(c0 > 0, dp, 0.0)
        tq = np.where(c1 > 0, dq, 0.0)
        if len(c0) and (
            float(np.max(c0 * np.abs(tp))) > 2**62
            or float(np.max(c1 * np.abs(tq))) > 2**62
        ):
            raise OverflowError(
                "js_divergence: count * micro overflows exact int64 — "
                "shard the corpus first"
            )
        return pa.table(
            {
                "terms_old": pa.array([int((c0 > 0).sum())], pa.int64()),
                "terms_new": pa.array([int((c1 > 0).sum())], pa.int64()),
                "js_old_micro": pa.array(
                    [int((c0 * tp.astype(np.int64)).sum())], pa.int64()
                ),
                "js_new_micro": pa.array(
                    [int((c1 * tq.astype(np.int64)).sum())], pa.int64()
                ),
            }
        )

    parts = agg.map_batches(score, batch_format="pyarrow").to_pandas()
    return ray.data.from_arrow(
        pa.table(
            {
                "n_old": pa.array([n0], pa.int64()),
                "n_new": pa.array([n1], pa.int64()),
                "terms_old": pa.array([int(parts["terms_old"].sum())], pa.int64()),
                "terms_new": pa.array([int(parts["terms_new"].sum())], pa.int64()),
                "js_old_micro": pa.array(
                    [int(parts["js_old_micro"].sum())], pa.int64()
                ),
                "js_new_micro": pa.array(
                    [int(parts["js_new_micro"].sum())], pa.int64()
                ),
            }
        )
    )


def entropy_rate(ds, text_col: str = "text", model_max: int = 4_000_000):
    """Bigram conditional entropy H(w2 | w1) of the corpus in exact
    integer micro-nats (Shannon 1951's printed-English entropy
    estimate, the corpus-predictability diagnostic — templated or
    machine-generated text scores far lower than natural prose):

        h_micro = -sum_{(a,b)} c(a,b) * floor(ln(c(a,b) / c(a·)) * 1e6 + 0.5)

    with c(a·) the context total, so H = h_micro / (N·1e6) nats per
    token, left rational. Per-bigram micro rounding BEFORE the
    count-weighted sum keeps the aggregation order-independent int64;
    the int64→double division + ln sit in the SQL oracle's parse-tree
    order. Returns one-row Dataset[(n_bigrams, n_distinct_bigrams,
    n_contexts, h_micro)].

    Shape (the kn/pmi fingerprint plan, strings never leave the
    batch): per-batch tagged partials carry bigram counts keyed by
    the CONTEXT fp pair + the successor fp pair (4 int64 key columns,
    so the context key survives the groupby) and context totals; ONE
    groupby reduces both; the vocab-sized context side broadcasts via
    ``ray.put`` (``model_max`` guard); ONE scoring map emits
    per-block int64 partials. Overflow bounds-checked per batch.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..core.strhash import utf8_hash64
    from .lm import _fp_lookup, _fp_sorted

    def partial(batch: pa.Table) -> pa.Table:
        doc_of, codes, dic = _doc_word_codes(
            batch[text_col], nonword="[^a-z0-9]+"
        )
        empty = pa.table(
            {
                "kind": pa.array([], pa.int64()),
                "a0": pa.array([], pa.int64()),
                "a1": pa.array([], pa.int64()),
                "b0": pa.array([], pa.int64()),
                "b1": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        nd = len(dic)
        if nd == 0 or len(codes) < 2:
            return empty
        valid = doc_of[1:] == doc_of[:-1]
        a, b = codes[:-1][valid], codes[1:][valid]
        if len(a) == 0:
            return empty
        h0 = utf8_hash64(dic, 0).view(np.int64)
        h1 = utf8_hash64(dic, 1).view(np.int64)
        V = np.int64(nd)
        u, mult = np.unique(a * V + b, return_counts=True)
        ua, ub = u // V, u % V
        ctx, cmult = np.unique(a, return_counts=True)
        z = np.zeros(len(ctx), np.int64)
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "kind": pa.array(np.zeros(len(ctx), np.int64), pa.int64()),
                        "a0": pa.array(h0[ctx], pa.int64()),
                        "a1": pa.array(h1[ctx], pa.int64()),
                        "b0": pa.array(z, pa.int64()),
                        "b1": pa.array(z, pa.int64()),
                        "n": pa.array(cmult.astype(np.int64), pa.int64()),
                    }
                ),
                pa.table(
                    {
                        "kind": pa.array(np.ones(len(u), np.int64), pa.int64()),
                        "a0": pa.array(h0[ua], pa.int64()),
                        "a1": pa.array(h1[ua], pa.int64()),
                        "b0": pa.array(h0[ub], pa.int64()),
                        "b1": pa.array(h1[ub], pa.int64()),
                        "n": pa.array(mult.astype(np.int64), pa.int64()),
                    }
                ),
            ]
        ).combine_chunks()

    from .combine import bucket_sum

    agg = bucket_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["kind", "a0", "a1", "b0", "b1"],
        "n",
    ).materialize()

    one_row_empty = pa.table(
        {
            "n_bigrams": pa.array([0], pa.int64()),
            "n_distinct_bigrams": pa.array([0], pa.int64()),
            "n_contexts": pa.array([0], pa.int64()),
            "h_micro": pa.array([0], pa.int64()),
        }
    )

    def keep_kind(k: int):
        def f(batch: pa.Table) -> pa.Table:
            if "kind" not in batch.column_names:
                return batch
            return batch.filter(pc.equal(batch["kind"], k))

        return f

    ctx = agg.map_batches(keep_kind(0), batch_format="pyarrow").to_pandas()
    if len(ctx) == 0:
        return ray.data.from_arrow(one_row_empty)
    if len(ctx) > model_max:
        raise ValueError(
            "entropy_rate context model exceeds model_max=%d; shard by "
            "language first" % model_max
        )
    wfp, cn_vals = _fp_sorted(
        ctx["a0"].to_numpy().view(np.uint64),
        ctx["a1"].to_numpy().view(np.uint64),
        ctx["n"].to_numpy().astype(np.int64),
    )
    ref = ray.put((wfp, cn_vals))
    n_total = int(ctx["n"].sum())
    n_contexts = len(ctx)

    def score(batch: pa.Table) -> pa.Table:
        wfp, cn_vals = ray.get(ref)
        t = batch.filter(pc.equal(batch["kind"], 1))
        cb = np.asarray(t["n"], dtype=np.int64)
        cn = _fp_lookup(
            wfp,
            cn_vals,
            np.asarray(t["a0"], dtype=np.int64).view(np.uint64),
            np.asarray(t["a1"], dtype=np.int64).view(np.uint64),
        )
        # SAME parse tree as the SQL oracle: one division, one ln
        delta = np.floor(
            np.log(cb.astype(np.float64) / cn.astype(np.float64)) * 1e6 + 0.5
        ).astype(np.int64)
        if len(cb) and float(
            np.max(cb.astype(np.float64) * np.abs(delta).astype(np.float64))
        ) > float(2**62):
            raise OverflowError(
                "entropy_rate: count * micro overflows exact int64"
            )
        return pa.table(
            {
                "nb": pa.array([int(len(cb))], pa.int64()),
                "h": pa.array([-int((cb * delta).sum())], pa.int64()),
            }
        )

    parts = agg.map_batches(score, batch_format="pyarrow").to_pandas()
    return ray.data.from_arrow(
        pa.table(
            {
                "n_bigrams": pa.array([n_total], pa.int64()),
                "n_distinct_bigrams": pa.array(
                    [int(parts["nb"].sum())], pa.int64()
                ),
                "n_contexts": pa.array([n_contexts], pa.int64()),
                "h_micro": pa.array([int(parts["h"].sum())], pa.int64()),
            }
        )
    )


_CODE_SYMBOLS = r"[{}()\[\];=<>]"
_CODE_INDENT = r"\n(    |\t)"


def code_signals(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic code-vs-prose signals per document (the
    code-filtering primitive of corpus curation — both the "route code
    to the code pipeline" and the "keep code out of the prose mix"
    direction): symbol density and indented-line share, both RE2
    counts identical in Arrow and DuckDB, with the integer rule

        is_code = n_chars > 0 AND (100*n_symbols >= 3*n_chars
                                   OR 4*indent_lines >= n_lines)

    (3% structural-symbol density or a quarter of lines indented).
    Returns (doc_id, n_chars, n_symbols, n_lines, indent_lines,
    is_code) with is_code as int64 0/1 — row-local, zero shuffle.
    """
    t = pc.fill_null(batch[text_col], "")
    nch = pc.cast(pc.utf8_length(t), pa.int64())
    nsym = pc.cast(pc.count_substring_regex(t, _CODE_SYMBOLS), pa.int64())
    nnl = pc.cast(pc.count_substring_regex(t, "\n"), pa.int64())
    nlines = pc.add(nnl, 1)
    ind = pc.cast(pc.count_substring_regex(t, _CODE_INDENT), pa.int64())
    nch_np = np.asarray(nch)
    rule = (100 * np.asarray(nsym) >= 3 * nch_np) | (
        4 * np.asarray(ind) >= np.asarray(nlines)
    )
    is_code = (rule & (nch_np > 0)).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": nch,
            "n_symbols": nsym,
            "n_lines": nlines,
            "indent_lines": ind,
            "is_code": pa.array(is_code, pa.int64()),
        }
    )
