"""Mergeable sketches as Ray Data ``AggregateFn``s.

The reference's only sketch is the Bloom membership filter
(texoo-core encoder/impl/BloomEncoder.java:29-76, mirrored in
stages/encoders.py); this module adds the distinct-COUNT side: a KMV
(k-minimum-values) sketch for estimating the number of distinct words
in a corpus without a corpus-wide distinct shuffle.

KMV over a deterministic hash is itself deterministic AND exactly
reproducible in SQL (the k smallest distinct md5-prefix values are a
plain ``ORDER BY h LIMIT k``), so the sketch — an *approximate*
algorithm — still gets a bit-exact DuckDB oracle: both engines agree on
the estimate because they agree on the k-th smallest hash. Estimation
error vs the true distinct count is the usual ~1/sqrt(k) (Bar-Yossef
et al. 2002, "Counting distinct elements in a data stream"). The same
trick extends to the register-sketch family: ``hll_bigram_distinct``
below is a HyperLogLog (Flajolet et al. 2007) whose register index and
rank derive from the md5 prefix, with the estimator evaluated in exact
integer arithmetic — so even HLL hash-matches a DuckDB mirror.

Scale shape: the sketch state is <= k int64s; blocks accumulate locally
(vectorized md5 over each batch's DISTINCT words only) and states merge
in Ray's aggregate tree — ZERO shuffle, driver receives k values. At
100 TB this replaces the `groupby(word)` distinct count whose exchange
is corpus-sized.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_KMV_BITS = 60  # md5-prefix width: 15 hex chars, fits int64 with headroom
_KMV_CAP = 1 << 62  # estimate clamp so the BIGINT cast can never overflow


def _word_hashes(texts, max_hashes: int | None = None) -> np.ndarray:
    """Distinct-word 60-bit md5-prefix hashes for a batch of texts
    (lowercase ``\\w+`` words — the corpus tokenization every dedup
    oracle uses). md5 runs once per batch-DISTINCT word (dictionary
    encode first), the advisor-approved bound on per-row hashing."""
    from .text_stats import _doc_word_codes

    _, _, dictionary = _doc_word_codes(texts)
    hs = np.fromiter(
        (
            int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)
            for w in dictionary.to_pylist()
        ),
        dtype=np.int64,
        count=len(dictionary),
    )
    hs = np.unique(hs)
    if max_hashes is not None and len(hs) > max_hashes:
        hs = hs[:max_hashes]
    return hs


def kmv_aggregate(k: int = 256, text_col: str = "text"):
    """The KMV sketch as a mergeable Ray ``AggregateFn``: state is the
    sorted array of the <= ``k`` smallest distinct word hashes seen;
    blocks accumulate vectorized, states merge by union + truncate."""
    from ray.data.aggregate import AggregateFn

    def accumulate(state: np.ndarray, block: pa.Table) -> np.ndarray:
        hs = _word_hashes(block[text_col], max_hashes=k)
        return np.unique(np.concatenate([state, hs]))[:k]

    return AggregateFn(
        init=lambda _: np.zeros(0, np.int64),
        merge=lambda a, b: np.unique(np.concatenate([a, b]))[:k],
        accumulate_block=accumulate,
        finalize=lambda a: a.tolist(),
        name="kmv",
    )


def kmv_estimate(minima: list, k: int) -> tuple[int, int, int]:
    """(k_used, kth_hash, est_distinct) from a finalized KMV state.

    Fewer than ``k`` minima means the hash set was exhausted — the
    estimate IS the exact distinct-hash count. Otherwise the classic
    (k-1) / normalized-kth-minimum estimator, in exact integer
    arithmetic clamped to ``_KMV_CAP`` (mirrored by the oracle's
    ``least``)."""
    if len(minima) < k:
        return len(minima), (minima[-1] if minima else 0), len(minima)
    kth = minima[k - 1]
    est = min((k - 1) * (1 << _KMV_BITS) // kth, _KMV_CAP)
    return k, kth, est


def kmv_distinct_words(ds, text_col: str = "text", k: int = 256) -> pa.Table:
    """Corpus distinct-word count via the KMV sketch: one shuffle-free
    aggregate pass; returns a single-row table
    (k_used, kth_hash, est_distinct)."""
    res = ds.aggregate(kmv_aggregate(k=k, text_col=text_col))
    k_used, kth, est = kmv_estimate(res["kmv"], k)
    return pa.table(
        {
            "k_used": pa.array([k_used], pa.int64()),
            "kth_hash": pa.array([kth], pa.int64()),
            "est_distinct": pa.array([est], pa.int64()),
        }
    )


def _mg_reduce(state: dict, capacity: int) -> dict:
    """Misra-Gries reduction: if more than ``capacity`` counters live,
    subtract the (capacity+1)-th largest count from every counter and
    drop the non-positive ones. Total undercount stays <= N/(capacity+1)
    across arbitrary merges (Agarwal et al. 2013, "Mergeable summaries",
    Thm 1), so no word with true count > N/(capacity+1) can be lost."""
    if len(state) <= capacity:
        return state
    counts = np.sort(np.fromiter(state.values(), np.int64, len(state)))
    cut = counts[len(state) - capacity - 1]  # (capacity+1)-th largest
    return {w: c - cut for w, c in state.items() if c > cut}


def mg_aggregate(capacity: int, text_col: str = "text"):
    """Misra-Gries heavy-hitter summary as a mergeable ``AggregateFn``:
    state is a dict of <= ``capacity`` word counters. Blocks accumulate
    via vectorized dictionary-coded bincount (one Python update per
    batch-DISTINCT word); states merge by counter addition + reduction.
    ZERO shuffle — the aggregate tree carries dicts of bounded size."""
    from ray.data.aggregate import AggregateFn

    from .text_stats import _doc_word_codes

    def accumulate(state: dict, block: pa.Table) -> dict:
        _, codes, dictionary = _doc_word_codes(block[text_col])
        if len(codes) == 0:
            return state
        counts = np.bincount(codes, minlength=len(dictionary))
        for w, c in zip(dictionary.to_pylist(), counts.tolist()):
            if c:
                state[w] = state.get(w, 0) + c
        return _mg_reduce(state, capacity)

    def merge(a: dict, b: dict) -> dict:
        for w, c in b.items():
            a[w] = a.get(w, 0) + c
        return _mg_reduce(a, capacity)

    return AggregateFn(
        init=lambda _: {},
        merge=merge,
        accumulate_block=accumulate,
        finalize=lambda a: sorted(a),  # candidate words only
        name="mg",
    )


def _word_count_aggregate(text_col: str = "text"):
    """Total corpus word count as a trivial mergeable aggregate."""
    from ray.data.aggregate import AggregateFn

    from .text_stats import _doc_word_codes

    return AggregateFn(
        init=lambda _: 0,
        merge=lambda a, b: a + b,
        accumulate_block=lambda a, blk: a
        + len(_doc_word_codes(blk[text_col])[1]),
        name="n_words",
    )


def heavy_hitter_words(
    ds, text_col: str = "text", threshold_den: int = 200
) -> pa.Table:
    """EXACT frequent-word mining at sketch cost: every word whose count
    is >= N / ``threshold_den`` of the N corpus words, with its exact
    count — computed in two shuffle-free aggregate passes instead of a
    corpus-wide ``groupby(word)`` exchange.

    Pass 1 runs a mergeable Misra-Gries summary with capacity
    2*threshold_den (plus the total-N counter in the same pass): MG's
    deterministic no-false-negative guarantee means every word at the
    threshold survives as a candidate, though its counter undercounts.
    Pass 2 broadcasts the <= 2*threshold_den candidates into a vector
    recount (per-batch bincount gathered into a fixed-size int64 vector,
    summed up the aggregate tree) and filters by the EXACT integer
    threshold ``cnt * threshold_den >= N``. Output is driver-sized and
    bit-reproducible, so this approximate-sketch pipeline still carries
    an exact SQL oracle (GROUP BY ... HAVING cnt*den >= N).

    The reference's closest shape is the corpus vocab build
    (texoo-core WordHelpers/BagOfWordsEncoder vocab counting); this is
    the scale path for its frequent-term side at 100 TB.
    """
    from ray.data.aggregate import AggregateFn

    from .text_stats import _doc_word_codes

    capacity = 2 * threshold_den
    first = ds.aggregate(
        mg_aggregate(capacity, text_col=text_col),
        _word_count_aggregate(text_col=text_col),
    )
    candidates: list = first["mg"]
    n_total: int = first["n_words"]
    if not candidates or n_total == 0:
        return pa.table(
            {
                "word": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    cand_index = {w: i for i, w in enumerate(candidates)}

    def recount(state: np.ndarray, block: pa.Table) -> np.ndarray:
        _, codes, dictionary = _doc_word_codes(block[text_col])
        if len(codes) == 0:
            return state
        counts = np.bincount(codes, minlength=len(dictionary))
        for w, c in zip(dictionary.to_pylist(), counts.tolist()):
            j = cand_index.get(w)
            if j is not None:
                state[j] += c
        return state

    exact = ds.aggregate(
        AggregateFn(
            init=lambda _: np.zeros(len(candidates), np.int64),
            merge=lambda a, b: a + b,
            accumulate_block=recount,
            finalize=lambda a: a.tolist(),
            name="cand_counts",
        )
    )["cand_counts"]
    rows = sorted(
        (
            (w, c)
            for w, c in zip(candidates, exact)
            if c * threshold_den >= n_total
        ),
        key=lambda wc: (-wc[1], wc[0]),
    )
    return pa.table(
        {
            "word": pa.array([w for w, _ in rows], pa.string()),
            "cnt": pa.array([c for _, c in rows], pa.int64()),
        }
    )


def kmv_source_overlap(
    ds, source_col: str = "source", text_col: str = "text", k: int = 256
) -> pa.Table:
    """Distinct-vocabulary overlap between sources via KMV set algebra
    (Beyer et al. 2007, "On synopses for distinct-value estimation"):
    one grouped sketch aggregate builds a per-source KMV state, then
    every source pair combines DRIVER-SIDE (states are <= k int64s;
    sources are few) — union minima estimate the union's distinct count,
    and the share of union minima present in BOTH sketches estimates the
    intersection: ``est_inter = n_common * est_union // k_used``.

    Returns one row per unordered source pair
    (source_a < source_b): (source_a, source_b, k_used, n_common,
    est_union, est_intersection) — all exact integers given the hash, so
    the approximate overlap still hash-matches a SQL oracle running the
    same ORDER BY hash LIMIT k algebra.

    Contrast with ``text_stats.cross_source_overlap`` (exact distinct
    n-gram pair counts, one corpus-sized exchange): this sketch answers
    the same curation question — which sources duplicate each other's
    vocabulary — with ZERO shuffle beyond the per-source partial
    states, the right first pass at 100 TB before paying for the exact
    matrix.
    """
    rows = ds.groupby(source_col).aggregate(
        kmv_aggregate(k=k, text_col=text_col)
    ).take_all()  # one row per source: driver-sized
    states = {r[source_col]: np.asarray(r["kmv"], np.int64) for r in rows}
    srcs = sorted(states)
    out = {
        "source_a": [],
        "source_b": [],
        "k_used": [],
        "n_common": [],
        "est_union": [],
        "est_intersection": [],
    }
    for i, a in enumerate(srcs):
        sa = states[a]
        for b in srcs[i + 1 :]:
            sb = states[b]
            union = np.unique(np.concatenate([sa, sb]))[:k]
            k_used, _, est_union = kmv_estimate(union.tolist(), k)
            common = int(
                (
                    np.isin(union, sa, assume_unique=True)
                    & np.isin(union, sb, assume_unique=True)
                ).sum()
            )
            est_inter = common * est_union // max(k_used, 1)
            out["source_a"].append(a)
            out["source_b"].append(b)
            out["k_used"].append(k_used)
            out["n_common"].append(common)
            out["est_union"].append(est_union)
            out["est_intersection"].append(est_inter)
    return pa.table(
        {
            "source_a": pa.array(out["source_a"], pa.string()),
            "source_b": pa.array(out["source_b"], pa.string()),
            "k_used": pa.array(out["k_used"], pa.int64()),
            "n_common": pa.array(out["n_common"], pa.int64()),
            "est_union": pa.array(out["est_union"], pa.int64()),
            "est_intersection": pa.array(out["est_intersection"], pa.int64()),
        }
    )


# --- HyperLogLog with a bit-exact SQL mirror ------------------------------

_HLL_M = 64  # registers (b = 6 index bits)
_HLL_WBITS = 58  # rank bits; rho in [1, 59]
# alpha_64 = 0.709 (Flajolet et al. 2007, Fig. 3 constants) as a rational
_HLL_ALPHA_NUM, _HLL_ALPHA_DEN = 709, 1000


def _hll_update(regs: np.ndarray, items) -> None:
    """Fold distinct string items into a 64-register HLL state.

    The hash is the md5 16-hex-char prefix as a uint64 — top 6 bits pick
    the register, rho = position of the highest set bit in the low 58
    bits counted from the top (59 when they are all zero). md5 keeps the
    whole sketch SQL-expressible: DuckDB rebuilds the identical
    registers from ('0x' || substr(md5(x), 1, 16))::UBIGINT.
    """
    for it in items:
        h = int(hashlib.md5(it.encode("utf-8")).hexdigest()[:16], 16)
        j = h >> _HLL_WBITS
        w = h & ((1 << _HLL_WBITS) - 1)
        rho = _HLL_WBITS - w.bit_length() + 1
        if rho > regs[j]:
            regs[j] = rho


def hll_estimate_micro(regs: np.ndarray) -> tuple[int, int]:
    """(est_micro, v_empty) from a 64-register state — EXACT integer
    arithmetic on the raw branch (sum of 2^-M with common denominator
    2^59, floor division), libm ln on the linear-counting branch (the
    same ln DuckDB uses; precedent: stages/lm.py log-prob micros)."""
    import math

    v = int((regs == 0).sum())
    snum = int(sum(1 << (59 - int(mj)) for mj in regs))
    raw_micro = (
        _HLL_ALPHA_NUM * _HLL_M * _HLL_M * (1 << 59) * (10**6 // _HLL_ALPHA_DEN)
    ) // snum
    if raw_micro <= 25 * _HLL_M * 10**5 and v > 0:  # raw <= 2.5 m
        est_micro = int(
            math.floor(_HLL_M * math.log(_HLL_M / v) * 1e6 + 0.5)
        )
    else:
        est_micro = raw_micro
    return est_micro, v


def hll_bigram_distinct(ds, text_col: str = "text") -> pa.Table:
    """Distinct-BIGRAM count: HLL estimate + exact check in one result
    row (est_micro, v_empty, exact_distinct).

    Two passes: (1) per-batch partials fold each batch's DISTINCT
    adjacent word pairs into <= 64 (register, rho) rows, merged by one
    64-group ``Max`` aggregate — zero corpus shuffle; (2) the exact
    count is the plain distinct-bigram groupby for comparison. KMV
    (above) covers distinct WORDS with an order-statistics mirror; this
    shows the register-sketch family gets a bit-exact DuckDB oracle
    too, because the register index and rank derive from the md5 prefix
    both engines compute.
    """
    from ray.data.aggregate import Count, Max, Sum

    from .text_stats import _doc_word_codes

    def partial(batch: pa.Table) -> pa.Table:
        doc_of, codes, dic = _doc_word_codes(batch[text_col])
        words = np.asarray(dic.to_pylist(), dtype=object)
        if len(codes) > 1:
            adj = doc_of[1:] == doc_of[:-1]
            c1 = codes[:-1][adj]
            c2 = codes[1:][adj]
            pairs = np.unique(np.stack([c1, c2], axis=1), axis=0)
            grams = [
                words[a] + " " + words[b] for a, b in pairs.tolist()
            ]
        else:
            grams = []
        regs = np.zeros(_HLL_M, dtype=np.int64)
        _hll_update(regs, grams)
        nz = np.nonzero(regs)[0]
        return pa.table(
            {
                "j": pa.array(nz, pa.int64()),
                "rho": pa.array(regs[nz], pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("j")
        .aggregate(Max("rho", alias_name="rho"))
        .take_all()
    )
    regs = np.zeros(_HLL_M, dtype=np.int64)
    for r in merged:
        regs[int(r["j"])] = int(r["rho"])
    est_micro, v = hll_estimate_micro(regs)

    # exact distinct bigrams: per-batch distinct pairs -> one groupby
    def bg_rows(batch: pa.Table) -> pa.Table:
        doc_of, codes, dic = _doc_word_codes(batch[text_col])
        words = np.asarray(dic.to_pylist(), dtype=object)
        if len(codes) > 1:
            adj = doc_of[1:] == doc_of[:-1]
            pairs = np.unique(
                np.stack([codes[:-1][adj], codes[1:][adj]], axis=1), axis=0
            )
            grams = [words[a] + " " + words[b] for a, b in pairs.tolist()]
        else:
            grams = []
        return pa.table({"g": pa.array(grams, pa.string())})

    exact = (
        ds.map_batches(bg_rows, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Count(alias_name="c"))
        .count()
    )
    return pa.table(
        {
            "est_micro": pa.array([est_micro], pa.int64()),
            "v_empty": pa.array([v], pa.int64()),
            "exact_distinct": pa.array([int(exact)], pa.int64()),
        }
    )


# --- Count-Min Sketch with a bit-exact SQL mirror -------------------------

_CMS_D = 4  # hash rows
_CMS_W = 512  # counters per row


def _cms_buckets(words: list) -> np.ndarray:
    """(d, n_words) bucket indices — row ``i``'s hash of word ``w`` is
    the md5 16-hex-char prefix of ``"{i}:{w}"`` as a uint64, mod the
    row width. Seeding the row index INTO the hashed string (rather
    than into a multiplier) keeps every row SQL-expressible:
    ``('0x' || substr(md5(i::VARCHAR || ':' || w), 1, 16))::UBIGINT
    % 512`` rebuilds the identical bucket in DuckDB."""
    out = np.empty((_CMS_D, len(words)), dtype=np.int64)
    for i in range(_CMS_D):
        pre = "%d:" % i
        for j, w in enumerate(words):
            h = int(
                hashlib.md5((pre + w).encode("utf-8")).hexdigest()[:16], 16
            )
            out[i, j] = h % _CMS_W
    return out


def cms_word_counts(ds, text_col: str = "text", top_n: int = 20) -> pa.Table:
    """Count-Min Sketch (Cormode & Muthukrishnan 2005) word-frequency
    estimates, probed at the corpus's exact top-``top_n`` words —
    Table[(word, exact_count, cms_count)] ordered by (exact_count desc,
    word asc).

    Completes the sketch family next to KMV (order statistics), HLL
    (registers) and Misra-Gries (heavy hitters, stages/sketches.py:123):
    CMS answers POINT-FREQUENCY queries from d*w = 4*512 mergeable
    counters, overestimating by at most the collision mass in the
    lightest of d rows (``cms_count >= exact_count`` always — pinned by
    test and visible in the result table).

    Shape (zero corpus shuffle, the KMV/HLL discipline):
    1. per-batch partial: ``np.bincount`` over the batch's dictionary
       codes gives per-distinct-word counts; md5 runs once per
       batch-DISTINCT word; counts scatter into a local (4, 512) array
       via ``np.add.at``; the block emits <= 2048 nonzero
       (row, bucket, count) cells;
    2. one 2048-group ``Sum`` merges all blocks — the sketch is
       counter-wise additive, so block partials merge exactly;
    3. the probe list (exact top-N words) comes from the plain
       word-count aggregate, and each probe reads min over d cells.

    The md5-prefix hashing makes the whole sketch — hash, scatter,
    merge, min-probe — reproducible in DuckDB, so an approximate
    structure still gets a bit-exact oracle (``cms_counts`` in
    __ray_entry__.py). The reference has no frequency sketch; its
    nearest relative is the Bloom membership filter
    (texoo-core/.../BloomEncoder.java:29-76)."""
    from ray.data.aggregate import Sum

    from .text_stats import _doc_word_codes

    def partial(batch: pa.Table) -> pa.Table:
        _, codes, dic = _doc_word_codes(batch[text_col])
        if len(codes) == 0:
            return pa.table(
                {
                    "i": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        counts = np.bincount(codes, minlength=len(dic)).astype(np.int64)
        buckets = _cms_buckets(dic.to_pylist())
        grid = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
        for i in range(_CMS_D):
            np.add.at(grid[i], buckets[i], counts)
        ii, bb = np.nonzero(grid)
        return pa.table(
            {
                "i": pa.array(ii.astype(np.int64)),
                "b": pa.array(bb.astype(np.int64)),
                "c": pa.array(grid[ii, bb]),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "b"])
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    grid = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    for r in cells:
        grid[int(r["i"]), int(r["b"])] = int(r["c"])

    def word_rows(batch: pa.Table) -> pa.Table:
        _, codes, dic = _doc_word_codes(batch[text_col])
        counts = np.bincount(codes, minlength=len(dic)).astype(np.int64)
        return pa.table({"word": dic, "c": pa.array(counts)})

    top = (
        ds.map_batches(word_rows, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("c", alias_name="c"))
        .sort(["c", "word"], descending=[True, False])
        .limit(top_n)
        .take_all()
    )
    words = [r["word"] for r in top]
    exact = np.asarray([r["c"] for r in top], dtype=np.int64)
    if words:
        probe = _cms_buckets(words)
        est = grid[np.arange(_CMS_D)[:, None], probe].min(axis=0)
    else:
        est = np.array([], dtype=np.int64)
    return pa.table(
        {
            "word": pa.array(words, pa.string()),
            "exact_count": pa.array(exact),
            "cms_count": pa.array(est),
        }
    )
