"""Corpus curation: the composed training-data pipeline.

quality score -> vectorized threshold filter -> exact dedup (keep-first)
with the survivor's stats carried through the aggregation — the standard
pre-training data shaping pass (quality gate then dedup), composed from
the engine's own operators (stages.text_stats, the exact_dedup shape of
stages/dedup.py:487-521).

Scale shape: one stateless ``map_batches`` computes stats, filters with
pyarrow.compute (no Python row loop for the gate), and pre-aggregates
per batch to ONE row per distinct surviving text before the shuffle;
the global ``groupby(text_hash)`` then moves only (hash, id, count,
stats) rows. Because duplicate rows share the text byte-for-byte, their
derived stats are identical, so Min() over each stat column reproduces
the surviving (minimum-id) row exactly — no row-payload join is needed
after the aggregation.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.text_stats import quality_stats, token_counts


def curate_corpus(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_alpha_ratio_x2: bool = True,
):
    """Dataset[(doc_id, dup_count, n_words, n_bpe_tokens)]: surviving
    documents after the quality gate (n_words >= min_words AND
    2*n_alpha >= n_chars — the integer form of alpha_ratio >= 0.5, exact
    in SQL) and exact keep-first dedup. Equivalent SQL: filter then
    GROUP BY text with min(doc_id)/count(*)."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = quality_stats(batch, text_col)
        batch = token_counts(batch, text_col)
        keep = pc.greater_equal(batch["n_words"], pa.scalar(min_words))
        if min_alpha_ratio_x2:
            keep = pc.and_(
                keep,
                pc.greater_equal(
                    pc.multiply(batch["n_alpha"], pa.scalar(2, pa.int64())),
                    batch["n_chars_q"],
                ),
            )
        batch = batch.filter(keep)
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        words = batch["n_words"].to_pylist()
        bpes = batch["n_bpe_tokens"].to_pylist()
        agg: Dict[str, Tuple[int, int, int, int]] = {}
        for t, i, w, bp in zip(texts, ids, words, bpes):
            h = hashlib.blake2b((t or "").encode("utf-8"), digest_size=16).hexdigest()
            prev = agg.get(h)
            if prev is None:
                agg[h] = (i, 1, w, bp)
            else:
                agg[h] = (min(prev[0], i), prev[1] + 1, w, bp)
        return pa.table(
            {
                "text_hash": pa.array(list(agg.keys()), pa.string()),
                "min_id": pa.array([v[0] for v in agg.values()], pa.int64()),
                "cnt": pa.array([v[1] for v in agg.values()], pa.int64()),
                "n_words": pa.array([v[2] for v in agg.values()], pa.int64()),
                "n_bpe_tokens": pa.array([v[3] for v in agg.values()], pa.int64()),
            }
        )

    from ray.data.aggregate import Min, Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(
            Min("min_id", alias_name="doc_id"),
            Sum("cnt", alias_name="dup_count"),
            Min("n_words", alias_name="n_words"),
            Min("n_bpe_tokens", alias_name="n_bpe_tokens"),
        )
    )
    return out.select_columns(["doc_id", "dup_count", "n_words", "n_bpe_tokens"])


def curate_training_set(
    ds,
    bench,
    text_col: str = "text",
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    min_words: int = 5,
    contamination_n: int = 4,
    rates: dict | None = None,
    default_rate: float = 0.5,
    min_bench_id: int = 20,
):
    """The full curation chain: quality gate -> benchmark decontamination
    -> deterministic stratified sampling, composed as ONE streaming pass.

    Returns Dataset[(doc_id, lang, n_words)] of the selected training
    documents. Every step is a pure per-row decision — quality thresholds
    are vectorized arithmetic, contamination probes a BROADCAST benchmark
    n-gram set, and sample membership is a content hash — so the whole
    chain runs with ZERO shuffles at any corpus size; only dedup (a
    separate operator) needs an exchange. ``bench`` is the benchmark
    text list or a ``ray.put`` ref of it; documents with id below
    ``min_bench_id`` are the benchmark itself and are excluded from the
    output.
    """
    from ..stages.text_stats import ContaminationStage, stratified_hash_sample

    rates = {"en": 0.2} if rates is None else rates

    def gate(batch: pa.Table) -> pa.Table:
        batch = quality_stats(batch, text_col)
        keep = pc.and_(
            pc.greater_equal(batch[id_col], pa.scalar(min_bench_id, pa.int64())),
            pc.and_(
                pc.greater_equal(batch["n_words"], pa.scalar(min_words)),
                pc.greater_equal(
                    pc.multiply(batch["n_alpha"], pa.scalar(2, pa.int64())),
                    batch["n_chars_q"],
                ),
            ),
        )
        return batch.filter(keep)

    def sample(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.invert(batch["contaminated"]))
        return stratified_hash_sample(
            batch, rates=rates, default_rate=default_rate,
            text_col=text_col, stratum_col=stratum_col,
        )

    out = (
        ds.map_batches(gate, batch_format="pyarrow")
        .map_batches(
            ContaminationStage,
            fn_constructor_kwargs=dict(bench=bench, n=contamination_n, text_col=text_col),
            batch_format="pyarrow",
            concurrency=2,
        )
        .map_batches(sample, batch_format="pyarrow")
    )
    return out.select_columns([id_col, stratum_col, "n_words"])


def _boundary_cutoff(bnd, residual: int, id_col: str, limit: int = 65536):
    """Largest ``cutoff`` such that the boundary-score docs with
    ``id <= cutoff`` have an inclusive running token sum <= ``residual``
    (ids are unique, ascending rank order); ``None`` when not even the
    first fits.

    Distributed radix-style selection: repeatedly histogram the current
    id window into <= ``limit`` id-range buckets (sum + max-id per
    bucket, partial per block then a tiny groupby), invert the cumsum on
    the driver, and descend into the single overflowing bucket. An id
    window of span <= ``limit`` holds <= ``limit`` docs (ids unique), so
    the final fetch is driver-sized no matter how skewed the score
    distribution is; 64-bit ids terminate in <= 4 levels.
    """
    from ray.data.aggregate import Max, Min, Sum

    if residual <= 0:
        return None
    stats = bnd.aggregate(Min(id_col), Max(id_col))
    lo = stats.get(f"min({id_col})")
    hi = stats.get(f"max({id_col})")
    if lo is None:
        return None
    lo, hi = int(lo), int(hi)
    accepted_max = None  # highest id proven accepted in earlier buckets

    while hi - lo + 1 > limit:
        width = (hi - lo) // limit + 1

        def hist(batch: pa.Table, lo=lo, hi=hi, width=width) -> pa.Table:
            ids = batch[id_col]
            m = pc.and_(
                pc.greater_equal(ids, pa.scalar(lo)),
                pc.less_equal(ids, pa.scalar(hi)),
            )
            batch = batch.filter(m)
            if batch.num_rows == 0:
                return pa.table(
                    {"b": pa.array([], pa.int64()),
                     "tok": pa.array([], pa.int64()),
                     "max_id": pa.array([], pa.int64())}
                )
            b = pc.divide(pc.subtract(batch[id_col], pa.scalar(lo)), pa.scalar(width))
            t = pa.table({"b": b, "tok": batch["tokens"], "max_id": batch[id_col]})
            grp = t.group_by(["b"]).aggregate([("tok", "sum"), ("max_id", "max")])
            return pa.table(
                {"b": grp["b"], "tok": grp["tok_sum"], "max_id": grp["max_id_max"]}
            )

        h = (
            bnd.map_batches(hist, batch_format="pyarrow")
            .groupby("b")
            .aggregate(Sum("tok", alias_name="tok"), Max("max_id", alias_name="max_id"))
            .to_pandas()
            .sort_values("b")
            .reset_index(drop=True)
        )
        cum = h["tok"].cumsum()
        over = cum > residual
        if not over.any():  # defensive: whole window fits
            return int(h["max_id"].max())
        k = int(over.idxmax())
        if k > 0:
            residual -= int(cum[k - 1])
            prior = int(h.loc[: k - 1, "max_id"].max())
            accepted_max = prior if accepted_max is None else max(accepted_max, prior)
        b_star = int(h.loc[k, "b"])
        lo, hi = lo + b_star * width, min(hi, lo + (b_star + 1) * width - 1)

    grp = (
        bnd.filter(expr=f"{id_col} >= {lo} and {id_col} <= {hi}")
        .to_pandas()
        .sort_values(id_col)
        .reset_index(drop=True)
    )
    run = grp["tokens"].cumsum()
    fits = run <= residual
    if fits.any():
        return int(grp.loc[fits, id_col].max())
    return accepted_max


def token_budget_select(
    ds,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Select the best documents that fit a token budget: rank by an
    integer quality score (``n_words``, descending; ``doc_id`` ascending
    tie-break) and keep the longest prefix whose INCLUSIVE running
    ``n_bpe_tokens`` sum stays <= ``budget`` — SQL's
    ``SUM(tokens) OVER (ORDER BY score DESC, id) <= budget``.

    NO global sort: selection-by-prefix-sum over a score histogram.

    1. one streaming pass scores every doc (vectorized regex counts),
    2. per-batch partial histogram -> tiny global ``groupby(score)``
       (cardinality = distinct integer scores, thousands at most —
       independent of corpus size),
    3. the driver inverts the histogram's descending cumsum to find the
       boundary score s* and the residual budget r entering it,
    4. the s* group is ranked by id against r DISTRIBUTIVELY
       (``_boundary_cutoff``): the same histogram inversion one level
       down, over id-range buckets, recursing until the candidate id
       window is driver-sized — so a skewed corpus where most documents
       share the boundary score (uniform short turns) never lands a
       corpus-scale group on the driver,
    5. a vectorized filter keeps score > s* plus the s* prefix.

    The same inversion trick as ``_q_turn_length_quantiles``; cost is
    three streaming scans (histogram, boundary-group probe, final
    filter) + a histogram-sized exchange, vs a full-corpus range sort.
    Returns Dataset[(doc_id, score, tokens)].
    """
    from ray.data.aggregate import Sum

    def score_pass(batch: pa.Table) -> pa.Table:
        batch = quality_stats(batch, text_col)
        batch = token_counts(batch, text_col)
        return pa.table(
            {
                id_col: batch[id_col],
                "score": batch["n_words"],
                "tokens": batch["n_bpe_tokens"],
            }
        )

    # materialize: the narrow (id, score) projection is consumed by the
    # histogram, by each boundary filter, and by the final pass — left
    # lazy, every consumer re-executes the whole read+score lineage (the
    # lazy-reconsumption pitfall in the round-3 dev notes; ADVICE r3).
    scored = ds.map_batches(score_pass, batch_format="pyarrow").materialize()

    def hist(batch: pa.Table) -> pa.Table:
        grp = batch.group_by(["score"]).aggregate([("tokens", "sum")])
        return pa.table(
            {"score": grp["score"], "tok": grp["tokens_sum"]}
        )

    h = (
        scored.map_batches(hist, batch_format="pyarrow")
        .groupby("score")
        .aggregate(Sum("tok", alias_name="tok"))
        .to_pandas()
        .sort_values("score", ascending=False)
        .reset_index(drop=True)
    )
    if h.empty:
        return scored
    cum = h["tok"].cumsum()
    over = cum > budget
    if not over.any():
        return scored  # everything fits
    b = int(over.idxmax())  # first (highest-score-first) bucket that overflows
    s_star = int(h.loc[b, "score"])
    prev_total = int(cum[b - 1]) if b > 0 else 0
    residual = budget - prev_total

    # boundary group: every doc with score == s_star, ranked by id.
    # Materialized once (two narrow columns) so the histogram levels of
    # the cutoff search don't re-run the scoring pass per level.
    bnd = (
        scored.filter(expr=f"score == {s_star}")
        .select_columns([id_col, "tokens"])
        .materialize()
    )
    cutoff_id = _boundary_cutoff(bnd, residual, id_col)

    def keep(batch: pa.Table) -> pa.Table:
        above = pc.greater(batch["score"], pa.scalar(s_star))
        if cutoff_id is None:
            return batch.filter(above)
        at = pc.and_(
            pc.equal(batch["score"], pa.scalar(s_star)),
            pc.less_equal(batch[id_col], pa.scalar(cutoff_id)),
        )
        return batch.filter(pc.or_(above, at))

    return scored.map_batches(keep, batch_format="pyarrow")


def chunk_documents(
    ds,
    size: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Context-window chunking: split each document's whitespace words
    into chunks of ``size`` words advancing by ``stride`` (overlap =
    size - stride), the standard pre-training sharding of long docs
    into model-context pieces.  A doc with n words emits
    ``1 + ceil((n - size) / stride)`` chunks (0 if empty); the last
    chunk may be short.  Returns Dataset[(doc_id, chunk_idx,
    chunk_text, n_words_chunk)].

    Fully vectorized flat-map — NO Python loop over docs or chunks:
    Arrow ``utf8_split_whitespace`` -> flatten, mask edge-empties with a
    cumsum over the list offsets, then one ``take`` with a
    numpy-composed gather index rebuilds every (overlapping) chunk as a
    ListArray rejoined by ``binary_join``.  Purely per-batch: streams,
    no shuffle, no state; output rows/input row ~= n/stride so block
    sizes stay bounded by the input block size times a small constant.
    """
    import numpy as np

    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")

    def chunks(batch: pa.Table) -> pa.Table:
        # ascii_split_whitespace: words are \S+ runs in the DuckDB oracle
        # (RE2 ASCII \s), so U+00A0 and friends must NOT split here either
        lst = pc.ascii_split_whitespace(
            pc.fill_null(batch[text_col], "")
        ).combine_chunks()
        flat = lst.flatten()
        keep = pc.not_equal(flat, "")
        words = flat.filter(keep)
        # non-empty word count + start offset per doc
        o = np.asarray(lst.offsets)
        cum = np.concatenate(
            [[0], np.cumsum(np.asarray(keep, dtype=np.int64))]
        )
        w_start = cum[o[:-1]]
        n_words = cum[o[1:]] - w_start
        n_chunks = np.where(
            n_words == 0,
            0,
            np.where(
                n_words <= size, 1, (n_words - size + stride - 1) // stride + 1
            ),
        )
        total = int(n_chunks.sum())
        ids = batch[id_col].combine_chunks()
        if total == 0:
            return pa.table(
                {
                    id_col: ids.slice(0, 0),
                    "chunk_idx": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                    "n_words_chunk": pa.array([], pa.int64()),
                }
            )
        doc_idx = np.repeat(np.arange(len(n_chunks)), n_chunks)
        excl = np.cumsum(n_chunks) - n_chunks
        chunk_idx = np.arange(total) - np.repeat(excl, n_chunks)
        starts = chunk_idx * stride
        ends = np.minimum(starts + size, n_words[doc_idx])
        lengths = ends - starts
        cl = np.cumsum(lengths)
        gidx = (
            np.arange(int(cl[-1]))
            - np.repeat(cl - lengths, lengths)
            + np.repeat(w_start[doc_idx] + starts, lengths)
        )
        chunk_words = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], cl]), pa.int32()),
            words.take(pa.array(gidx, pa.int64())),
        )
        return pa.table(
            {
                id_col: ids.take(pa.array(doc_idx, pa.int64())),
                "chunk_idx": pa.array(chunk_idx, pa.int64()),
                "chunk_text": pc.binary_join(chunk_words, " "),
                "n_words_chunk": pa.array(lengths, pa.int64()),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow")


def _md5_h32(texts) -> np.ndarray:
    """Per-row uniform 32-bit draw ``uint32(md5(text)[:8 hex])`` — md5
    runs once per DISTINCT text in the batch (transcript turns repeat
    heavily), then gathers through the dictionary codes. md5 itself is
    pinned by the DuckDB oracles (``substring(md5(text), 1, 8)``), so the
    hash function can't change — only how often it runs."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    enc = pc.fill_null(texts, "").dictionary_encode()
    codes = np.asarray(enc.indices, dtype=np.int64)
    dic = enc.dictionary.to_pylist()
    vals = np.fromiter(
        (
            int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:4], "big")
            for w in dic
        ),
        np.int64,
        len(dic),
    )
    return vals[codes]


def hash_split(
    ds,
    fractions: Tuple[float, float] = (0.9, 0.05),
    text_col: str = "text",
):
    """Attach a deterministic ``split`` column ('train'/'val'/'test') keyed
    by content hash: ``md5(text)[:8]`` is a uniform 32-bit draw, compared
    against the cumulative fraction boundaries. A pure function of the row
    (the reference's ``Dataset.getSplit`` — model/Dataset.java:81-88 — is
    positional and single-process; content-keyed hashing is the shape that
    survives re-partitioning and cluster-size changes): no RNG, no
    coordination, reproducible at any scale, and duplicate texts always
    land in the SAME split (no train/test leakage from exact dups).

    Boundaries use the same ``format(int(f * 16**8), "08x")`` integer
    truncation as the DuckDB oracle's hex-substring compare (an 8-char
    lowercase-hex string compare is exactly a uint32 compare).
    """
    b1 = int(fractions[0] * 16**8)
    b2 = int((fractions[0] + fractions[1]) * 16**8)

    def assign(batch: pa.Table) -> pa.Table:
        h32 = _md5_h32(batch[text_col])
        splits = np.where(h32 < b1, "train", np.where(h32 < b2, "val", "test"))
        return batch.append_column("split", pa.array(splits, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def source_mixture(
    ds,
    weights: Dict[str, int] = None,
    source_col: str = "source",
    text_col: str = "text",
):
    """Resample a multi-source corpus to INTEGER target mixture weights
    (the data-mixing step of LLM corpus assembly: e.g. web:books:code =
    4:2:1). Two phases, both scale-safe:

    1. per-source counts — a partial-agg ``groupby(source).count()``
       collected to the driver (|sources| rows, tiny);
    2. the largest feasible total T = min_s(n_s * W / w_s) (integer
       floor) gives per-source keep targets need_s = w_s * T // W; each
       row is kept iff ``uint32(md5(text)[:8]) * n_s < need_s * 2**32``
       — an EXACT-integer acceptance test (no float thresholds, so the
       engine and the SQL oracle agree bit-for-bit), evaluated row-local
       with the (source -> n_s, need_s) dict broadcast in the closure.

    Unspecified sources get weight 0 (dropped). The kept count per
    source is binomial around need_s — mixture targets are statistical,
    membership is deterministic and content-keyed.
    """
    counts = {
        r[source_col]: r["count()"]
        for r in ds.groupby(source_col).count().take_all()
    }
    if weights is None:
        weights = {s: 1 for s in counts}
    # weight mass only over sources actually present, so a weights dict
    # written for the full corpus stays valid on a subset (and matches an
    # oracle that derives everything from the data)
    W = sum(w for s, w in weights.items() if s in counts)
    if W <= 0:
        # no positive-weight source present in the data: empty mixture
        # (T = 0, every need_s = 0), not a ZeroDivisionError
        W, T = 1, 0
    else:
        feasible = [
            counts[s] * W // w for s, w in weights.items() if w > 0 and s in counts
        ]
        T = min(feasible) if feasible else 0
    # acceptance h32 * n_s < need_s << 32 rearranged to h32 < thr_s with
    # thr_s = ceil(need_s * 2^32 / n_s), computed ONCE per source in
    # arbitrary-precision Python ints (n_s can exceed 2^31 at corpus
    # scale, so the product form would overflow int64) — the per-row
    # compare is then a plain vectorized uint32-vs-int64 check
    plan = {
        s: (weights.get(s, 0) * T // W * 4294967296 + counts[s] - 1) // counts[s]
        for s in counts
    }

    def accept(batch: pa.Table) -> pa.Table:
        h32 = _md5_h32(batch[text_col])
        srcs_col = batch[source_col].to_pylist()
        thr = np.fromiter((plan.get(s, 0) for s in srcs_col), np.int64, len(srcs_col))
        return batch.filter(pa.array(h32 < thr, pa.bool_()))

    return ds.map_batches(accept, batch_format="pyarrow")


def _order_key_fn(value_type):
    """Order-preserving uint64 key for any numeric Arrow column.

    Integers: ``v XOR 2^63`` (shifts the sign range up — monotone).
    Floats: the IEEE-754 total-order bit trick — positive floats get the
    sign bit set, negative floats get all bits inverted, so unsigned key
    order equals numeric order (-0.0 keys just below +0.0; both sides of
    any range compare use the same mapping, so the filter is consistent).
    NaN keys sort above +inf and are masked out as invalid alongside
    nulls. Returns ``fn(arr) -> (keys: uint64[n], valid: bool[n])``.
    """
    is_float = pa.types.is_floating(value_type)

    def fn(arr):
        if is_float:
            a = pc.cast(arr, pa.float64())
            valid = np.asarray(pc.is_valid(a), dtype=bool)
            f = np.asarray(pc.fill_null(a, 0.0), dtype=np.float64)
            valid &= ~np.isnan(f)
            bits = f.view(np.uint64)
            neg = f < 0
            key = np.where(neg, ~bits, bits | np.uint64(1 << 63))
        else:
            a = pc.cast(arr, pa.int64())
            valid = np.asarray(pc.is_valid(a), dtype=bool)
            v = np.asarray(pc.fill_null(a, 0), dtype=np.int64)
            key = v.astype(np.uint64) ^ np.uint64(1 << 63)
        return key, valid

    return fn


def quantile_trim(
    ds,
    value_col: str,
    q_low: float = 0.05,
    q_high: float = 0.95,
    id_col: str = "doc_id",
    bucket_cap: int = 65536,
):
    """Winsor-style outlier TRIM over any numeric column: keep rows whose
    ``value_col`` lies within the corpus-wide [q_low, q_high]
    percentile_disc cutoffs (the standard "drop the too-short and the
    too-long tails" curation gate; cf. the length heuristics of the
    reference's DocumentFactory cleanup and Rae et al. 2021 A1.1).

    Exact at ANY domain width — float, high-cardinality, unbounded — via
    iterative bucket refinement in order-preserving uint64 key space
    (:func:`_order_key_fn`), never collecting more than ``bucket_cap``
    histogram rows per cutoff to the driver (r3 verdict #5: the old
    exact-value histogram was bounded by the distinct INTEGER domain and
    would have collected one row per distinct float):

    (1) one cheap min/max/count pass fixes the key domain;
    (2) each refinement round histograms only keys inside the current
        candidate interval per cutoff into <= ``bucket_cap`` equi-width
        buckets, and the driver descends into the bucket holding the
        target rank (percentile_disc: smallest value whose cumulative
        count reaches ceil(q*n)). Interval width shrinks by ``bucket_cap``
        per round, so <= ceil(64/log2(cap)) = 4 rounds worst case; one
        round when the domain fits (the common integer-length case);
    (3) the two cutoff KEYS broadcast into a vectorized filter.

    Nulls and NaNs are excluded from the histogram and the survivors.
    Returns Dataset[(id_col, value_col)] of survivors (integers cast to
    int64, floats to float64).
    """
    import math

    from ray.data.aggregate import Sum

    value_type = dict(zip(ds.schema().names, ds.schema().types))[value_col]
    keys_of = _order_key_fn(value_type)
    out_type = (
        pa.float64() if pa.types.is_floating(value_type) else pa.int64()
    )

    # Materialize the (id, value) projection ONCE: the min/max pass, every
    # refinement round, and the final filter all consume it — leaving the
    # input lazy would re-execute the caller's whole upstream lineage per
    # round (the dev-notes lazy-reconsumption trap). ~16-24 B/row in the
    # object store (spills at scale) vs 3-6 full upstream re-reads.
    ds = ds.select_columns([id_col, value_col]).materialize()

    def minmax(batch: pa.Table) -> pa.Table:
        key, valid = keys_of(batch[value_col])
        k = key[valid]
        if k.size == 0:
            return pa.table(
                {"mn": pa.array([], pa.uint64()),
                 "mx": pa.array([], pa.uint64()),
                 "n": pa.array([], pa.int64())}
            )
        return pa.table(
            {"mn": pa.array([int(k.min())], pa.uint64()),
             "mx": pa.array([int(k.max())], pa.uint64()),
             "n": pa.array([int(k.size)], pa.int64())}
        )

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    total = int(mm["n"].sum()) if len(mm) else 0
    if total == 0:
        return ds.select_columns([id_col, value_col]).limit(0)
    gmin, gmax = int(mm["mn"].min()), int(mm["mx"].max())

    # target cumulative ranks (1-indexed); clamp rank 0 -> 1 (q=0 keeps min)
    ranks = {
        "lo": max(1, math.ceil(q_low * total)),
        "hi": max(1, math.ceil(q_high * total)),
    }
    # per cutoff: (interval lo key, interval hi key, count strictly below)
    state = {t: (gmin, gmax, 0) for t in ranks}

    while any(b > a for a, b, _ in state.values()):
        specs = []  # (tag, a, b, width) for still-wide intervals
        for t, (a, b, _) in state.items():
            if b > a:
                specs.append((t, a, b, -(-(b - a + 1) // bucket_cap)))

        def hist(batch: pa.Table, specs=tuple(specs)) -> pa.Table:
            key, valid = keys_of(batch[value_col])
            k = key[valid]
            tags, bks, cns = [], [], []
            for tag, a, b, w in specs:
                m = (k >= np.uint64(a)) & (k <= np.uint64(b))
                if not m.any():
                    continue
                bk = (k[m] - np.uint64(a)) // np.uint64(w)
                u, c = np.unique(bk, return_counts=True)
                tags.extend([tag] * len(u))
                bks.append(u)
                cns.append(c)
            if not tags:
                return pa.table(
                    {"t": pa.array([], pa.string()),
                     "b": pa.array([], pa.uint64()),
                     "c": pa.array([], pa.int64())}
                )
            return pa.table(
                {"t": pa.array(tags, pa.string()),
                 "b": pa.array(np.concatenate(bks)),
                 "c": pa.array(np.concatenate(cns).astype(np.int64))}
            )

        rows = (
            ds.map_batches(hist, batch_format="pyarrow")
            .groupby(["t", "b"])
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas()
        )
        for tag, a, b, w in specs:
            below = state[tag][2]
            sub = rows[rows["t"] == tag].sort_values("b")
            cum = below + sub["c"].cumsum()
            hit = sub[cum >= ranks[tag]].index[0]
            bi = int(sub.loc[hit, "b"])
            new_below = int(cum.loc[hit]) - int(sub.loc[hit, "c"])
            state[tag] = (a + w * bi, min(b, a + w * (bi + 1) - 1), new_below)

    lo_key = np.uint64(state["lo"][0])
    hi_key = np.uint64(state["hi"][0])

    def keep(batch: pa.Table) -> pa.Table:
        key, valid = keys_of(batch[value_col])
        mask = valid & (key >= lo_key) & (key <= hi_key)
        return pa.table(
            {id_col: batch[id_col],
             value_col: pc.cast(batch[value_col], out_type)}
        ).filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_sample(
    ds,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Weighted sampling WITHOUT replacement, weight = document token
    count: the distributed one-pass A-ES scheme of Efraimidis &
    Spirakis 2006 ("Weighted random sampling with a reservoir", IPL —
    public paper). Each document draws priority ``ln(u) / w`` (u a
    content-keyed uniform, w its alnum token count) and the global
    top-k priorities ARE the weighted sample — so the whole operation
    is one stateless map plus a <= k-rows-per-block top-k exchange,
    with no RNG state, no sequential reservoir, no coordination.

    Determinism/oracle parity: u = (md5_h32(text) + 1) / 2^32 — md5 is
    pinned by the other sampling oracles, (h+1) and the 2^-32 scale are
    exact in doubles, and ln runs through the same libm as DuckDB — so
    ``pri_micro = floor(ln(u)/w * 1e6 + 0.5)`` is bit-equal across
    engines (ties break on id). Zero-token documents draw nothing.

    Reference parity: the per-record sampling surface of the reference
    is unweighted (Sampler shapes over datasets); length-weighted
    selection is the LLM-curation extension (sampling proportional to
    token mass keeps the TOKEN budget, not the document count,
    representative).
    """
    import math

    from ..stages.text_stats import _doc_word_codes

    out_schema = pa.schema([(id_col, pa.int64()), ("pri_micro", pa.int64())])

    def pri(batch: pa.Table) -> pa.Table:
        doc_of, _, _ = _doc_word_codes(
            batch[text_col], nonword="[^a-z0-9]+"
        )
        w = np.bincount(doc_of, minlength=batch.num_rows).astype(np.float64)
        h32 = _md5_h32(batch[text_col])
        sel = w > 0
        if not sel.any():
            return out_schema.empty_table()
        # scalar math.log per DISTINCT draw — numpy's SIMD log can differ
        # from libm by 1 ulp, which would break the floor() oracle parity
        hu, inv = np.unique(h32[sel], return_inverse=True)
        lnu = np.array(
            [math.log((float(h) + 1.0) / 4294967296.0) for h in hu],
            np.float64,
        )
        pri_micro = np.floor(
            lnu[inv] / w[sel] * 1e6 + 0.5
        ).astype(np.int64)
        ids = np.asarray(batch[id_col], dtype=np.int64)[sel]
        keep = min(k, len(ids))
        order = np.lexsort((ids, -pri_micro))[:keep]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "pri_micro": pa.array(pri_micro[order], pa.int64()),
            }
        )

    partial = ds.map_batches(pri, batch_format="pyarrow")
    return partial.sort(["pri_micro", id_col], descending=[True, False]).limit(k)


def weighted_sample_grouped(
    ds,
    k_per_group: int = 20,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-group weighted sampling without replacement: the A-ES scheme
    of :func:`weighted_sample` ranked WITHIN each group (source, lang,
    shard...) — "keep the best-weighted k documents of every source",
    the per-stratum form of token-mass-preserving selection.

    Shape: the stateless priority map runs once; each batch pre-trims
    to its own per-group top-k (a lexsort + segment-head pick, so the
    exchange carries <= k rows per group per block), then ONE
    groupby(group) finishes the top-k inside map_groups. Priorities are
    the same content-keyed ln(u)/w micros as the global operator, so
    group membership changes never reshuffle the randomness.
    """
    import math

    from ..stages.text_stats import _doc_word_codes

    out_schema = pa.schema(
        [
            (group_col, pa.string()),
            (id_col, pa.int64()),
            ("pri_micro", pa.int64()),
        ]
    )

    def pri(batch: pa.Table) -> pa.Table:
        doc_of, _, _ = _doc_word_codes(batch[text_col], nonword="[^a-z0-9]+")
        w = np.bincount(doc_of, minlength=batch.num_rows).astype(np.float64)
        h32 = _md5_h32(batch[text_col])
        sel = w > 0
        if not sel.any():
            return out_schema.empty_table()
        hu, inv = np.unique(h32[sel], return_inverse=True)
        lnu = np.array(
            [math.log((float(h) + 1.0) / 4294967296.0) for h in hu],
            np.float64,
        )
        pri_micro = np.floor(lnu[inv] / w[sel] * 1e6 + 0.5).astype(np.int64)
        ids = np.asarray(batch[id_col], dtype=np.int64)[sel]
        grp = batch[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        grp = pc.fill_null(grp, "").dictionary_encode()
        gcodes = np.asarray(grp.indices, dtype=np.int64)[sel]
        gdic = grp.dictionary
        # per-group top-k inside the batch: sort (group, -pri, id), keep
        # the first k of every group run
        order = np.lexsort((ids, -pri_micro, gcodes))
        gs = gcodes[order]
        new_seg = np.r_[True, gs[1:] != gs[:-1]]
        seg_id = np.cumsum(new_seg) - 1
        starts = np.flatnonzero(new_seg)
        rank_in_seg = np.arange(len(gs)) - starts[seg_id]
        keep = rank_in_seg < k_per_group
        sel_idx = order[keep]
        return pa.table(
            {
                group_col: gdic.take(pa.array(gcodes[sel_idx])),
                id_col: pa.array(ids[sel_idx], pa.int64()),
                "pri_micro": pa.array(pri_micro[sel_idx], pa.int64()),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        pri_micro = np.asarray(group["pri_micro"], dtype=np.int64)
        ids = np.asarray(group[id_col], dtype=np.int64)
        order = np.lexsort((ids, -pri_micro))[:k_per_group]
        return pa.table(
            {
                group_col: group[group_col].take(pa.array(order)),
                id_col: pa.array(ids[order], pa.int64()),
                "pri_micro": pa.array(pri_micro[order], pa.int64()),
            }
        )

    return (
        ds.map_batches(pri, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(finish, batch_format="pyarrow")
    )


def ntile_shards(
    ds,
    n_shards: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Exact distributed NTILE: assign every document to one of
    ``n_shards`` equal-size shards by global ``(score, id)`` rank —
    curriculum sharding (easy->hard training order) without a global
    sort. Score = text length in codepoints. Returns
    Dataset[(id_col, score, shard)] with SQL NTILE semantics: the first
    ``N % S`` shards get the extra row.

    NO corpus sort and NO corpus-sized driver state: the global rank
    structure comes from one score-histogram aggregate (distinct-score
    cardinality), and each of the S-1 shard boundaries resolves to an
    exact ``(score, id)`` threshold via the same radix histogram
    inversion ``token_budget_select`` uses (``_boundary_cutoff`` with
    unit weights = the r-th smallest id of the boundary score group,
    found without collecting the group). Assignment is then a row-local
    broadcast compare against S-1 thresholds.
    """
    from ray.data.aggregate import Sum

    def score_pass(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch[text_col].cast(pa.string()), "")
        return pa.table(
            {
                id_col: batch[id_col],
                "score": pc.cast(pc.utf8_length(t), pa.int64()),
            }
        )

    # materialize: the narrow (id, score) projection is consumed by the
    # histogram, by each boundary filter, and by the final pass — left
    # lazy, every consumer re-executes the whole read+score lineage (the
    # lazy-reconsumption pitfall in the round-3 dev notes; ADVICE r3).
    scored = ds.map_batches(score_pass, batch_format="pyarrow").materialize()

    def hist(batch: pa.Table) -> pa.Table:
        grp = batch.group_by(["score"]).aggregate([("score", "count")])
        return pa.table(
            {
                "score": grp["score"],
                "cnt": pc.cast(grp["score_count"], pa.int64()),
            }
        )

    h = (
        scored.map_batches(hist, batch_format="pyarrow")
        .groupby("score")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("score")
        .reset_index(drop=True)
    )
    if h.empty:
        return scored.map_batches(
            lambda b: b.append_column(
                "shard", pa.array([1] * b.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        )
    n_total = int(h["cnt"].sum())
    cum = h["cnt"].cumsum()
    base, extra = divmod(n_total, n_shards)

    # shard-boundary ranks c_j (inclusive last rank of shard j)
    cuts = []
    c = 0
    for j in range(1, n_shards):
        c += base + (1 if j <= extra else 0)
        cuts.append(c)

    # resolve each boundary rank to an exact (score, id) threshold
    thresholds = []
    cutoff_cache: dict = {}
    for c_j in cuts:
        if c_j <= 0:
            # degenerate empty-prefix shard: threshold below everything
            thresholds.append((int(h.loc[0, "score"]) - 1, -1))
            continue
        b = int((cum >= c_j).idxmax())
        s_star = int(h.loc[b, "score"])
        below = int(cum[b - 1]) if b > 0 else 0
        residual = c_j - below
        key = (s_star, residual)
        if key not in cutoff_cache:
            bnd = (
                scored.filter(expr=f"score == {s_star}")
                .map_batches(
                    lambda t: pa.table(
                        {
                            id_col: t[id_col],
                            "tokens": pa.array([1] * t.num_rows, pa.int64()),
                        }
                    ),
                    batch_format="pyarrow",
                )
                .materialize()
            )
            cutoff_cache[key] = _boundary_cutoff(bnd, residual, id_col)
        thresholds.append((s_star, int(cutoff_cache[key])))

    def assign(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["score"], dtype=np.int64)
        i = np.asarray(batch[id_col], dtype=np.int64)
        shard = np.ones(batch.num_rows, dtype=np.int64)
        for s_j, i_j in thresholds:
            shard += (s > s_j) | ((s == s_j) & (i > i_j))
        return batch.append_column("shard", pa.array(shard, pa.int64()))

    return scored.map_batches(assign, batch_format="pyarrow")


def host_cap(ds, k: int, url_col: str = "url", id_col: str = "doc_id"):
    """Per-host document cap — the crawl-balancing gate that stops a
    handful of giant hosts from dominating a training mix (the FineWeb /
    CommonCrawl curation idiom; the reference's per-directory file caps,
    `DirectoryDatasetReader.java:86-96`, are the filesystem analogue):
    keep at most ``k`` documents per canonical host, deterministically
    the ``k`` smallest ``id_col`` values.

    Scale shape: one stateless map extracts the host
    (:func:`..core.url.host_of`, vectorized per batch-distinct URL),
    then :func:`..stages.retrieval.grouped_topk` does a per-BATCH
    partial top-k before the single host-keyed exchange — a hot host
    ships at most k rows per source block, so skew is capped by design.

    Returns Dataset[(id_col, host)].
    """
    from ..core.url import host_array
    from ..stages.retrieval import grouped_topk

    def hostify(batch: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: batch[id_col], "host": host_array(batch[url_col])}
        )

    return grouped_topk(
        ds.map_batches(hostify, batch_format="pyarrow"),
        group_col="host",
        k=k,
        id_col=id_col,
        order_by=[(id_col, "ascending")],
    )


def domain_block(ds, blocked, url_col: str = "url", id_col: str = "doc_id"):
    """Domain blocklist filter: drop documents whose canonical host IS a
    blocked domain or is a SUBDOMAIN of one (suffix match on a dot
    boundary — ``ads.example.com`` is blocked by ``example.com`` but
    ``notexample.com`` is not). Row-local, zero shuffle: the blocklist
    is a broadcast constant captured in the task closure, and the
    membership test runs once per batch-DISTINCT host.

    Returns the surviving rows as Dataset[(id_col, host)].
    """
    from ..core.url import host_array

    blocked = sorted({d.lower() for d in blocked})
    exact = set(blocked)
    suffixes = tuple("." + d for d in blocked)

    def keep(batch: pa.Table) -> pa.Table:
        hosts = host_array(batch[url_col])
        enc = hosts.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        dic = enc.dictionary.to_pylist()
        ok_dic = np.array(
            [not (h in exact or h.endswith(suffixes)) for h in dic],
            dtype=bool,
        )
        mask = pa.array(ok_dic[codes], pa.bool_())
        return pa.table(
            {id_col: batch[id_col], "host": hosts}
        ).filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def host_gini(ds, url_col: str = "url"):
    """Gini coefficient of the per-canonical-host document distribution
    as an EXACT integer rational — the crawl-concentration diagnostic
    that tells a web-curation pipeline whether :func:`host_cap` is even
    needed (G ~ 0: balanced crawl; G -> 1: a few hosts dominate).
    Returns ONE row ``(n_hosts, total_docs, gini_num, gini_den)`` with

        gini_num = 2 * sum(i * x_i) - (n + 1) * sum(x)   (x ascending,
        gini_den = n * sum(x)                             i 1-based)

    the standard sorted-cumulative form; ties make the i*x_i sum
    order-invariant, so the result hash-checks.

    Shape: one stateless map extracts canonical hosts
    (:func:`..core.url.host_array`, vectorized per batch-distinct URL),
    per-batch host-count partials, ONE host-domain-sized groupby, and
    the rank/sum scan on that one small block (the ks_drift budget —
    host tables are millions of rows at web scale, never corpus-sized).
    """
    from ray.data.aggregate import Sum

    from ..core.url import host_array

    def partial(batch: pa.Table) -> pa.Table:
        hosts = host_array(batch[url_col])
        enc = hosts.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        return pa.table(
            {
                "host": enc.dictionary,
                "cnt": pa.array(
                    np.bincount(codes, minlength=len(enc.dictionary)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    t = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def final(batch: pa.Table) -> pa.Table:
        cols = ("n_hosts", "total_docs", "gini_num", "gini_den")
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        x = np.sort(np.asarray(batch["cnt"], dtype=np.int64))
        n = len(x)
        tot = int(x.sum())
        i = np.arange(1, n + 1, dtype=np.int64)
        gini_num = 2 * int((i * x).sum()) - (n + 1) * tot
        return pa.table(
            {
                "n_hosts": pa.array([n], pa.int64()),
                "total_docs": pa.array([tot], pa.int64()),
                "gini_num": pa.array([gini_num], pa.int64()),
                "gini_den": pa.array([n * tot], pa.int64()),
            }
        )

    return t.repartition(1).map_batches(final, batch_format="pyarrow")


def mixture_weights(ds, source_col: str = "source", alpha: float = 0.5):
    """Temperature-scaled source-mixture weights — the standard
    multilingual / multi-source sampling rule (mT5 §3.2, XLM-R: sample
    source s with probability proportional to p_s^alpha, alpha < 1
    upweights the tail): Dataset[(source, n_docs, pow_micro)] ordered
    by source, with

        pow_micro = floor(exp(alpha * ln(n_docs)) * 1e6 + 0.5)

    i.e. n_docs^alpha in integer micros, evaluated exp/ln so the parse
    tree is ONE libm ln + ONE libm exp in the same order as the SQL
    oracle (the kn_score / cluster_top_terms IEEE discipline). Weights
    are UNNORMALIZED on purpose: the normalizing sum over sources is
    the only float-order-dependent step, so it stays at the edge
    (callers divide by the micro sum — source domains are
    driver-trivial).

    Shape: per-batch source-count partials, ONE source-domain-sized
    groupby, a row-local scalar map. Feeds :func:`source_mixture`'s
    resampler with principled rates instead of hand-set ones.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        enc = pc.fill_null(batch[source_col], "").dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices, dtype=np.int64)
        return pa.table(
            {
                "source": enc.dictionary,
                "n_docs": pa.array(
                    np.bincount(codes, minlength=len(enc.dictionary)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    t = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )

    a = float(alpha)

    def final(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n_docs"], dtype=np.int64)
        p = np.floor(
            np.exp(a * np.log(n.astype(np.float64))) * 1e6 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "source": batch["source"],
                "n_docs": pa.array(n, pa.int64()),
                "pow_micro": pa.array(p, pa.int64()),
            }
        )

    return t.map_batches(final, batch_format="pyarrow").sort("source")
