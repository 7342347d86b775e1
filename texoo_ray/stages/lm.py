"""Distributed n-gram language-model scoring (CCNet-style quality filter).

The reference's encoder family trains a corpus statistic once and then
applies it per document (BagOfWordsEncoder.java:64-118 trainModel ->
encode); here the trained statistic is a Laplace-smoothed bigram LM over
the corpus itself and the application is per-document log-probability —
the perplexity-filter shape of CCNet (Wenzek et al., LREC 2020, public
paper), which ranks web documents by LM score before keeping the
best-scoring tercile.

Scale shape (everything stays a Dataset; nothing corpus-sized touches
the driver):

1. unigram counts: per-batch partial Counter -> ``groupby(u).sum`` —
   the shuffle moves one row per distinct word per block;
2. bigram counts: same shape over adjacent-pair keys;
3. model assembly: the (bigram -> count) table joins the (word -> count)
   table on the bigram's FIRST word — a vocabulary-bounded hash join,
   never the corpus;
4. scoring: the per-document bigram rows (with multiplicity, so a
   document contributes one row per DISTINCT bigram) hash-join the
   model table once, then integer-micro log-probs aggregate per doc.

Log-probs are stabilized to integer micros (floor(x*1e6+0.5), DuckDB
round semantics) BEFORE summing, so the per-document sum is an integer
and order-independent — bit-equal across engines. ``math.log`` is
evaluated once per distinct (c_uv, c_u) pair (libm, same as DuckDB ln).

At 100 TB the bigram table wants a count cutoff (drop hapax bigrams
before the model join — smoothing already assigns them the +1 floor);
the parameter is exposed but defaults to keeping everything so the SQL
oracle matches exactly.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pyarrow as pa

import pyarrow.compute as pc

from .text_stats import _doc_word_codes

_ALNUM_NONWORD = "[^a-z0-9]+"  # matches the oracle's [a-z0-9]+ extraction


def _word_codes(batch: pa.Table, text_col: str):
    """Vectorized (doc_of, codes, dictionary) for the alnum tokenization."""
    return _doc_word_codes(batch[text_col], nonword=_ALNUM_NONWORD)


_MIX_A = np.uint64(0x9E3779B97F4A7C15)
_MIX_B = np.uint64(0xC2B2AE3D27D4EB4F)
_K2 = [("a", "<u8"), ("b", "<u8")]


def _bigram_fp(h0: np.ndarray, h1: np.ndarray, ua: np.ndarray, ub: np.ndarray):
    """128-bit fingerprint of a word PAIR from the two per-word FNV
    streams (core/strhash.py) — must be identical in the counting and
    scoring passes."""
    err = np.seterr(over="ignore")
    try:
        k0 = (h0[ua] * _MIX_A) ^ h0[ub]
        k1 = (h1[ua] * _MIX_B) ^ h1[ub]
    finally:
        np.seterr(**err)
    return k0, k1


def _fp_sorted(k0: np.ndarray, k1: np.ndarray, vals: np.ndarray):
    """(sorted structured fingerprint view, values in that order)."""
    m = np.empty((len(k0), 2), np.uint64)
    m[:, 0], m[:, 1] = k0, k1
    mv = m.view(_K2).ravel()
    order = np.argsort(mv)
    return mv[order], vals[order]


def _fp_lookup(sorted_fp: np.ndarray, vals: np.ndarray, k0, k1) -> np.ndarray:
    """Exact lookup of fingerprints built by :func:`_fp_sorted` (every
    query must exist — the model was counted from the same corpus)."""
    q = np.empty((len(k0), 2), np.uint64)
    q[:, 0], q[:, 1] = k0, k1
    qv = q.view(_K2).ravel()
    pos = np.searchsorted(sorted_fp, qv)
    pos = np.clip(pos, 0, len(sorted_fp) - 1)
    if len(qv) and not (sorted_fp[pos] == qv).all():
        raise AssertionError("bigram-LM fingerprint missing from model")
    return vals[pos]


def _ngram_logprob_broadcast(ds, id_col, text_col, model_max: int):
    """The small-model plan of :func:`ngram_logprob`: one tagged
    counting aggregate (words AND bigrams in the same pass — N tiny
    sequential aggregates are launch-bound, dev-notes round 3), model
    collected once to sorted fingerprint arrays, scored in one
    broadcast map. Returns None when the model exceeds ``model_max``
    (caller falls back to the join plan)."""
    import ray
    from ray.data.aggregate import Sum

    from ..core.strhash import utf8_hash64
    from .dedup import _compact

    def count_partial(batch: pa.Table) -> pa.Table:
        doc_of, codes, dic = _word_codes(batch, text_col)
        nd = len(dic)
        h0 = utf8_hash64(dic, 0)
        h1 = utf8_hash64(dic, 1)
        kinds = [np.zeros(nd, np.int64)]
        k0s, k1s = [h0], [h1]
        ns = [np.bincount(codes, minlength=nd).astype(np.int64)]
        if len(codes) >= 2:
            valid = doc_of[:-1] == doc_of[1:]
            a, b = codes[:-1][valid], codes[1:][valid]
            if len(a):
                V = np.int64(nd)
                u, mult = np.unique(a * V + b, return_counts=True)
                bk0, bk1 = _bigram_fp(h0, h1, u // V, u % V)
                kinds.append(np.ones(len(u), np.int64))
                k0s.append(bk0)
                k1s.append(bk1)
                ns.append(mult.astype(np.int64))
        return pa.table(
            {
                "kind": pa.array(np.concatenate(kinds), pa.int64()),
                "k0": pa.array(
                    np.concatenate(k0s).view(np.int64), pa.int64()
                ),
                "k1": pa.array(
                    np.concatenate(k1s).view(np.int64), pa.int64()
                ),
                "n": pa.array(np.concatenate(ns), pa.int64()),
            }
        )

    from .combine import bucket_sum

    counts = _compact(
        bucket_sum(
            ds.map_batches(count_partial, batch_format="pyarrow"),
            ["kind", "k0", "k1"],
            "n",
        )
    )
    if counts is None:  # corpus has no tokens at all
        def zeros_only(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    id_col: batch[id_col],
                    "n_bigrams": pa.array([0] * n, pa.int64()),
                    "sum_logprob_micro": pa.array([0] * n, pa.int64()),
                }
            )

        return ds.map_batches(zeros_only, batch_format="pyarrow")
    if counts.count() > model_max:
        return None

    t = counts.to_pandas()
    kind = t["kind"].to_numpy()
    k0 = t["k0"].to_numpy().view(np.uint64)
    k1 = t["k1"].to_numpy().view(np.uint64)
    n = t["n"].to_numpy().astype(np.int64)
    w = kind == 0
    wfp, cu_vals = _fp_sorted(k0[w], k1[w], n[w])
    bfp, cuv_vals = _fp_sorted(k0[~w], k1[~w], n[~w])
    V = int(w.sum())
    ref = ray.put((wfp, cu_vals, bfp, cuv_vals, V))

    def score(batch: pa.Table) -> pa.Table:
        wfp, cu_vals, bfp, cuv_vals, V = ray.get(ref)
        doc_of, codes, dic = _word_codes(batch, text_col)
        n_rows = batch.num_rows
        out_n = np.zeros(n_rows, np.int64)
        out_s = np.zeros(n_rows, np.int64)
        if len(codes) >= 2 and len(dic):
            valid = doc_of[:-1] == doc_of[1:]
            a, b = codes[:-1][valid], codes[1:][valid]
            d = doc_of[:-1][valid]
            if len(a):
                h0 = utf8_hash64(dic, 0)
                h1 = utf8_hash64(dic, 1)
                Vb = np.int64(len(dic))
                u, mult = np.unique(
                    (d * Vb + a) * Vb + b, return_counts=True
                )
                dd = u // (Vb * Vb)
                rest = u % (Vb * Vb)
                ua, ub = rest // Vb, rest % Vb
                cu = _fp_lookup(wfp, cu_vals, h0[ua], h1[ua])
                bk0, bk1 = _bigram_fp(h0, h1, ua, ub)
                cuv = _fp_lookup(bfp, cuv_vals, bk0, bk1)
                pairs = np.stack([cuv, cu], axis=1)
                uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
                logs = np.array(
                    [
                        math.log(float(x + 1) / (float(y) + V))
                        for x, y in uniq
                    ],
                    dtype=np.float64,
                )
                micro = (
                    np.floor(logs[inv] * 1e6 + 0.5).astype(np.int64)
                    * mult.astype(np.int64)
                )
                np.add.at(out_s, dd, micro)
                np.add.at(out_n, dd, mult.astype(np.int64))
        return pa.table(
            {
                id_col: batch[id_col],
                "n_bigrams": pa.array(out_n, pa.int64()),
                "sum_logprob_micro": pa.array(out_s, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def ngram_logprob(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: Optional[int] = None,
    broadcast_model_max: int = 2_000_000,
):
    """Per-document bigram LM score: Dataset[(id_col, n_bigrams,
    sum_logprob_micro)], one row per input document (documents with < 2
    tokens score (0, 0)).

    p(v|u) = (c(uv) + 1) / (c(u) + V) with corpus-wide counts and
    vocabulary size V (Laplace smoothing); the score is the sum over the
    document's token bigrams of floor(ln(p)*1e6 + 0.5).

    Two plans, same algebra (path-equivalence pinned in tests/test_lm.py):
    when the model (distinct words + distinct bigrams) fits under
    ``broadcast_model_max`` rows, ONE tagged counting aggregate builds
    it, the driver ships it as sorted 128-bit-fingerprint numpy arrays
    (``ray.put``, zero-copy reads — the dsir_logratio fast path), and
    one scoring map finishes: 2 Ray jobs, no joins (the join path was
    launch-bound at query scale: ~6 sequential jobs, measured 13.6 s vs
    ~3 s at sf0.1). Above the threshold — a 100 TB vocabulary fits no
    broadcast — the honest big-big join path below runs instead; pass
    ``broadcast_model_max=0`` to force it.
    """
    from ray.data.aggregate import Sum

    from .dedup import _compact, _join_partitions

    if broadcast_model_max:
        out = _ngram_logprob_broadcast(
            ds, id_col, text_col, broadcast_model_max
        )
        if out is not None:
            return out

    P = _join_partitions(cap=num_partitions or 16)

    # --- corpus unigram counts ------------------------------------------
    def uni_partial(batch: pa.Table) -> pa.Table:
        _, codes, dic = _word_codes(batch, text_col)
        return pa.table(
            {
                "u": dic,
                "cu": pa.array(np.bincount(codes, minlength=len(dic)), pa.int64()),
            }
        )

    uni = _compact(
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("u")
        .aggregate(Sum("cu", alias_name="cu"))
    )
    id_type = pa.int64()
    empty = pa.table(
        {
            id_col: pa.array([], id_type),
            "n_bigrams": pa.array([], pa.int64()),
            "sum_logprob_micro": pa.array([], pa.int64()),
        }
    )
    if uni is None:  # corpus has no tokens at all
        def zeros_only(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    id_col: batch[id_col],
                    "n_bigrams": pa.array([0] * n, pa.int64()),
                    "sum_logprob_micro": pa.array([0] * n, pa.int64()),
                }
            )

        return ds.map_batches(zeros_only, batch_format="pyarrow")

    vocab_size = uni.count()

    # --- per-document bigram rows (distinct bigram + multiplicity) ------
    def bg_explode(batch: pa.Table) -> pa.Table:
        doc_of, codes, dic = _word_codes(batch, text_col)
        id_t = batch.schema.field(id_col).type
        if len(codes) < 2:
            return pa.table(
                {
                    id_col: pa.array([], id_t),
                    "bgk": pa.array([], pa.string()),
                    "mult": pa.array([], pa.int64()),
                }
            )
        valid = doc_of[:-1] == doc_of[1:]
        a = codes[:-1][valid]
        b = codes[1:][valid]
        d = doc_of[:-1][valid]
        if len(a) == 0:
            return pa.table(
                {
                    id_col: pa.array([], id_t),
                    "bgk": pa.array([], pa.string()),
                    "mult": pa.array([], pa.int64()),
                }
            )
        # distinct (doc, bigram) + multiplicity in one np.unique; key fits
        # int64 for any realistic batch (docs/batch * V^2 << 2^63)
        V = np.int64(len(dic))
        u, mult = np.unique((d * V + a) * V + b, return_counts=True)
        dd = u // (V * V)
        rest = u % (V * V)
        bgk = pc.binary_join_element_wise(
            dic.take(pa.array(rest // V)), dic.take(pa.array(rest % V)), " "
        )
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(dd)),
                "bgk": bgk,
                "mult": pa.array(mult.astype(np.int64), pa.int64()),
            }
        )

    doc_bigrams = ds.map_batches(bg_explode, batch_format="pyarrow")

    # --- corpus bigram counts -> model table (bgk, cuv, cu) -------------
    def cb_partial(batch: pa.Table) -> pa.Table:
        grp = batch.group_by(["bgk"]).aggregate([("mult", "sum")])
        return pa.table({"b": grp["bgk"], "cuv": grp["mult_sum"].cast(pa.int64())})

    cb = _compact(
        doc_bigrams.map_batches(cb_partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("cuv", alias_name="cuv"))
    )

    def zeros(batch: pa.Table) -> pa.Table:
        """(id, 0, 0) rows for documents with no bigrams — unioned into
        the final aggregate instead of a corpus-wide left-outer join."""
        doc_of, _, _ = _word_codes(batch, text_col)
        n_words = np.bincount(doc_of, minlength=batch.num_rows)
        ids = batch[id_col].filter(pa.array(n_words < 2)).to_pylist()
        if not ids:
            return empty.cast(
                pa.schema(
                    [
                        (id_col, batch.schema.field(id_col).type),
                        ("n_bigrams", pa.int64()),
                        ("sum_logprob_micro", pa.int64()),
                    ]
                )
            )
        return pa.table(
            {
                id_col: pa.array(ids, batch.schema.field(id_col).type),
                "n_bigrams": pa.array([0] * len(ids), pa.int64()),
                "sum_logprob_micro": pa.array([0] * len(ids), pa.int64()),
            }
        )

    zero_rows = ds.map_batches(zeros, batch_format="pyarrow")
    if cb is None:  # every document is < 2 tokens
        return zero_rows.groupby(id_col).aggregate(
            Sum("n_bigrams", alias_name="n_bigrams"),
            Sum("sum_logprob_micro", alias_name="sum_logprob_micro"),
        )

    def first_word(batch: pa.Table) -> pa.Table:
        fw = pc.list_element(pc.ascii_split_whitespace(batch["b"]), 0)
        return batch.append_column("fw", fw)

    model = _compact(
        cb.map_batches(first_word, batch_format="pyarrow").join(
            uni, "inner", max(2, P // 2), on=("fw",), right_on=("u",)
        )
    )

    joined = doc_bigrams.join(model, "inner", P, on=("bgk",), right_on=("b",))

    V = float(vocab_size)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "cuv" not in batch.column_names:
            return empty
        cuv = np.asarray(batch["cuv"], dtype=np.int64)
        cu = np.asarray(batch["cu"], dtype=np.int64)
        mult = np.asarray(batch["mult"], dtype=np.int64)
        # one libm log per distinct (cuv, cu) pair
        pairs = np.stack([cuv, cu], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        logs = np.array(
            [math.log(float(a + 1) / (float(b) + V)) for a, b in uniq],
            dtype=np.float64,
        )
        micro = np.floor(logs[inv] * 1e6 + 0.5).astype(np.int64) * mult
        t = pa.table(
            {
                id_col: batch[id_col],
                "n_bigrams": pa.array(mult),
                "sum_logprob_micro": pa.array(micro),
            }
        )
        grp = t.group_by([id_col]).aggregate(
            [("n_bigrams", "sum"), ("sum_logprob_micro", "sum")]
        )
        return pa.table(
            {
                id_col: grp[id_col],
                "n_bigrams": grp["n_bigrams_sum"],
                "sum_logprob_micro": grp["sum_logprob_micro_sum"],
            }
        )

    partials = joined.map_batches(score, batch_format="pyarrow")
    return (
        partials.union(zero_rows)
        .groupby(id_col)
        .aggregate(
            Sum("n_bigrams", alias_name="n_bigrams"),
            Sum("sum_logprob_micro", alias_name="sum_logprob_micro"),
        )
    )


def dsir_logratio(
    ds,
    target_col: str = "is_target",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: Optional[int] = None,
    broadcast_vocab_max: int = 2_000_000,
):
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data selection for language models via importance
    resampling"): per-document sum over tokens of
    ``log p_target(w) - log p_raw(w)`` under Laplace-smoothed unigram
    models, where the target model trains on the rows flagged true in
    boolean ``target_col`` and the raw model on the whole corpus.
    Returns Dataset[(id_col, n_words, dsir_micro)] — one row per input
    document; wordless documents score (0, 0).

    Exactness: like :func:`ngram_logprob`, the per-token log-ratio is
    stabilized to integer micros (floor(x*1e6+0.5)) before summation, so
    per-document sums are order-independent integers, bit-equal to the
    DuckDB oracle; libm log runs once per distinct (c_target, c_raw)
    pair per batch.

    Scale shape: BOTH unigram models build in ONE pass (per-batch
    partial (word, c_raw, c_target) counts -> vocabulary-bounded
    groupby). Scoring picks between two shapes by model size:

    - vocab <= ``broadcast_vocab_max`` (the common case — vocabulary
      grows sublinearly even at 100 TB): the model broadcasts once via
      ``ray.put`` and every document scores IN PLACE in one stateless
      map pass — ZERO scoring shuffle;
    - larger vocab: hash-join the per-document DISTINCT-word rows (with
      multiplicity) against the model table — the shuffle moves
      (doc, word, mult) rows, never raw text.

    The top-k / threshold selection over the scores is the caller's
    (compose with retrieval.grouped_topk or a threshold filter).
    """
    from ray.data.aggregate import Sum

    from .dedup import _compact, _join_partitions

    P = _join_partitions(cap=num_partitions or 16)

    def model_partial(batch: pa.Table) -> pa.Table:
        doc_of, codes, dic = _word_codes(batch, text_col)
        if len(codes) == 0:
            return pa.table(
                {
                    "u": pa.array([], pa.string()),
                    "cr": pa.array([], pa.int64()),
                    "ct": pa.array([], pa.int64()),
                }
            )
        tgt_rows = np.asarray(
            pc.fill_null(batch[target_col], False), dtype=bool
        )
        cr = np.bincount(codes, minlength=len(dic))
        tmask = tgt_rows[doc_of]
        ct = np.bincount(codes[tmask], minlength=len(dic))
        return pa.table(
            {
                "u": dic,
                "cr": pa.array(cr.astype(np.int64), pa.int64()),
                "ct": pa.array(ct.astype(np.int64), pa.int64()),
            }
        )

    model = _compact(
        ds.map_batches(model_partial, batch_format="pyarrow")
        .groupby("u")
        .aggregate(Sum("cr", alias_name="cr"), Sum("ct", alias_name="ct"))
    )
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "n_words": pa.array([], pa.int64()),
            "dsir_micro": pa.array([], pa.int64()),
        }
    )

    def zeros(batch: pa.Table) -> pa.Table:
        doc_of, _, _ = _word_codes(batch, text_col)
        n_words = np.bincount(doc_of, minlength=batch.num_rows)
        keep = pa.array(n_words == 0)
        ids = batch[id_col].filter(keep)
        return pa.table(
            {
                id_col: ids,
                "n_words": pa.array([0] * len(ids), pa.int64()),
                "dsir_micro": pa.array([0] * len(ids), pa.int64()),
            }
        )

    zero_rows = ds.map_batches(zeros, batch_format="pyarrow")
    if model is None:  # corpus has no tokens at all
        return zero_rows

    tot = model.aggregate(
        Sum("cr", alias_name="nr"), Sum("ct", alias_name="nt")
    )
    V = float(model.count())
    NR = float(tot["nr"])
    NT = float(tot["nt"])

    if V <= broadcast_vocab_max:
        # broadcast fast path: model fits in memory -> every document
        # scores in place, zero scoring shuffle (wordless docs get 0,0
        # inline — no zero-rows union needed)
        import ray as _ray

        mt = model.to_pandas()
        model_ref = _ray.put(
            {
                u: (int(ct_), int(cr_))
                for u, ct_, cr_ in zip(mt["u"], mt["ct"], mt["cr"])
            }
        )

        class ScoreBroadcast:
            def __init__(self):
                self.model = _ray.get(model_ref)
                self.cache: dict = {}  # word -> micro, across batches

            def __call__(self, batch: pa.Table) -> pa.Table:
                n = batch.num_rows
                doc_of, codes, dic = _word_codes(batch, text_col)
                if len(codes) == 0:
                    z = pa.array(np.zeros(n, np.int64), pa.int64())
                    return pa.table(
                        {id_col: batch[id_col], "n_words": z, "dsir_micro": z}
                    )
                cache, model_d = self.cache, self.model
                per_word = np.empty(len(dic), np.int64)
                for i, w in enumerate(dic.to_pylist()):
                    v = cache.get(w)
                    if v is None:
                        ct_, cr_ = model_d[w]
                        v = math.floor(
                            (
                                math.log(float(ct_ + 1) / (NT + V))
                                - math.log(float(cr_ + 1) / (NR + V))
                            )
                            * 1e6
                            + 0.5
                        )
                        cache[w] = v
                    per_word[i] = v
                sums = np.zeros(n, np.int64)
                np.add.at(sums, doc_of, per_word[codes])
                nw = np.bincount(doc_of, minlength=n).astype(np.int64)
                return pa.table(
                    {
                        id_col: batch[id_col],
                        "n_words": pa.array(nw, pa.int64()),
                        "dsir_micro": pa.array(sums, pa.int64()),
                    }
                )

        return ds.map_batches(
            ScoreBroadcast, batch_format="pyarrow", concurrency=(1, 8)
        )

    def word_rows(batch: pa.Table) -> pa.Table:
        doc_of, codes, dic = _word_codes(batch, text_col)
        id_t = batch.schema.field(id_col).type
        if len(codes) == 0:
            return pa.table(
                {
                    id_col: pa.array([], id_t),
                    "u": pa.array([], pa.string()),
                    "mult": pa.array([], pa.int64()),
                }
            )
        V_b = np.int64(len(dic))
        u, mult = np.unique(doc_of * V_b + codes, return_counts=True)
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(u // V_b)),
                "u": dic.take(pa.array(u % V_b)),
                "mult": pa.array(mult.astype(np.int64), pa.int64()),
            }
        )

    joined = ds.map_batches(word_rows, batch_format="pyarrow").join(
        model, "inner", P, on=("u",)
    )

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "cr" not in batch.column_names:
            return empty
        cr = np.asarray(batch["cr"], dtype=np.int64)
        ct = np.asarray(batch["ct"], dtype=np.int64)
        mult = np.asarray(batch["mult"], dtype=np.int64)
        pairs = np.stack([ct, cr], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        logs = np.array(
            [
                math.log(float(a + 1) / (NT + V))
                - math.log(float(b + 1) / (NR + V))
                for a, b in uniq
            ],
            dtype=np.float64,
        )
        micro = np.floor(logs[inv] * 1e6 + 0.5).astype(np.int64) * mult
        t = pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(mult),
                "dsir_micro": pa.array(micro),
            }
        )
        grp = t.group_by([id_col]).aggregate(
            [("n_words", "sum"), ("dsir_micro", "sum")]
        )
        return pa.table(
            {
                id_col: grp[id_col],
                "n_words": grp["n_words_sum"],
                "dsir_micro": grp["dsir_micro_sum"],
            }
        )

    partials = joined.map_batches(score, batch_format="pyarrow")
    return (
        partials.union(zero_rows)
        .groupby(id_col)
        .aggregate(
            Sum("n_words", alias_name="n_words"),
            Sum("dsir_micro", alias_name="dsir_micro"),
        )
    )


def bm25_topk(
    ds,
    query_text: str,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Corpus-wide BM25 top-k for ONE free-text query (Robertson &
    Zaragoza 2009, the Okapi BM25 the reference's Lucene candidate
    retrieval runs under the hood — KnowledgeBase.java's
    `searchCandidates` BM25 scoring, reference
    texoo-entity-recognition/.../KnowledgeBase.java:1 semantics made
    corpus-scale). Returns Dataset[(id_col, bm25_micro)] with exactly
    min(k, matching docs) rows, ordered (bm25_micro DESC, id ASC).

    Exactness: per-(doc, term) contributions are stabilized to integer
    micros (floor(x*1e6+0.5)) before the per-document sum, so results
    are order-independent and bit-equal to the DuckDB oracle; ``idf``
    uses the Lucene form ln(1 + (N - df + 0.5)/(df + 0.5)) evaluated
    once per query term.

    Scale shape (two streaming passes, zero corpus shuffle):

    1. stats pass — ONE partial aggregate emits per-batch (term, df)
       rows for the QUERY terms only plus a sentinel row carrying
       (doc count, total token count); the groupby output is
       |query|+1 rows, driver-sized by construction.
    2. score pass — idf/avgdl broadcast in the task closure (a dict of
       |query| floats); each batch computes tf/dl with one
       ``np.unique`` over (doc, term) codes and emits its own top-k,
       so the final exchange sorts <= k rows per block.
    """
    import re

    from ray.data.aggregate import Sum

    q_terms = sorted(set(re.findall(r"[a-z0-9]+", query_text.lower())))
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "bm25_micro": pa.array([], pa.int64()),
        }
    )
    if not q_terms:
        import ray.data

        return ray.data.from_arrow(empty)
    q_index = {w: i for i, w in enumerate(q_terms)}

    def stats_partial(batch: pa.Table) -> pa.Table:
        doc_of, codes, dic = _word_codes(batch, text_col)
        ws, dfs = ["\x00stats"], [np.int64(0)]
        nd = [np.int64(batch.num_rows)]
        tl = [np.int64(len(codes))]
        if len(codes):
            # df partial: count DISTINCT docs per query term in block
            hit = np.array([w in q_index for w in dic.to_pylist()], bool)
            if hit.any():
                sel = hit[codes]
                pair = np.unique(
                    doc_of[sel].astype(np.int64) * np.int64(len(dic))
                    + codes[sel]
                )
                term_codes = (pair % np.int64(len(dic))).astype(np.int64)
                cnt = np.bincount(term_codes, minlength=len(dic))
                for code in np.flatnonzero(cnt):
                    ws.append(dic[int(code)].as_py())
                    dfs.append(np.int64(cnt[code]))
                    nd.append(np.int64(0))
                    tl.append(np.int64(0))
        return pa.table(
            {
                "w": pa.array(ws, pa.string()),
                "df": pa.array(dfs, pa.int64()),
                "nd": pa.array(nd, pa.int64()),
                "tl": pa.array(tl, pa.int64()),
            }
        )

    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(
            Sum("df", alias_name="df"),
            Sum("nd", alias_name="nd"),
            Sum("tl", alias_name="tl"),
        )
        .to_pandas()
    )
    N = float(stats["nd"].sum())
    TL = float(stats["tl"].sum())
    if N == 0 or TL == 0:
        import ray.data

        return ray.data.from_arrow(empty)
    avgdl = TL / N
    # idf per query term, Lucene form; same expression order as the oracle
    idf = np.zeros(len(q_terms), np.float64)
    for w, df in zip(stats["w"], stats["df"]):
        i = q_index.get(w)
        if i is not None and df > 0:
            idf[i] = math.log(1.0 + ((N - float(df)) + 0.5) / (float(df) + 0.5))

    def score(batch: pa.Table) -> pa.Table:
        doc_of, codes, dic = _word_codes(batch, text_col)
        if len(codes) == 0:
            return empty
        # dic word -> query-term index (or -1)
        tmap = np.full(len(dic), -1, np.int64)
        for j, w in enumerate(dic.to_pylist()):
            tmap[j] = q_index.get(w, -1)
        term_of = tmap[codes]
        dl = np.bincount(doc_of, minlength=batch.num_rows).astype(np.float64)
        sel = term_of >= 0
        if not sel.any():
            return empty
        T = np.int64(len(q_terms))
        key = doc_of[sel].astype(np.int64) * T + term_of[sel]
        uniq, tf = np.unique(key, return_counts=True)
        d_i = (uniq // T).astype(np.int64)
        t_i = (uniq % T).astype(np.int64)
        tf = tf.astype(np.float64)
        # identical expression order to the SQL oracle
        part = (tf * (k1 + 1.0)) / (
            tf + k1 * ((1.0 - b) + (b * dl[d_i]) / avgdl)
        )
        micro = np.floor(idf[t_i] * part * 1e6 + 0.5).astype(np.int64)
        n = batch.num_rows
        sums = np.zeros(n, np.int64)
        np.add.at(sums, d_i, micro)
        hit = np.zeros(n, bool)
        hit[d_i] = True
        ids = np.asarray(batch[id_col], dtype=np.int64)[hit]
        sc = sums[hit]
        keep = min(k, len(sc))
        # block-local top-k with the global tiebreak (score desc, id asc)
        order = np.lexsort((ids, -sc))[:keep]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "bm25_micro": pa.array(sc[order], pa.int64()),
            }
        )

    partial = ds.map_batches(score, batch_format="pyarrow")
    return partial.sort(["bm25_micro", id_col], descending=[True, False]).limit(k)


def lm_perplexity_buckets(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    q_low: float = 0.25,
    q_high: float = 0.75,
    num_partitions: Optional[int] = None,
):
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2019 §3.3: score each document with a corpus LM, split every
    language into head / middle / tail by perplexity percentile; the
    head feeds the training mix). Here the LM is this engine's own
    corpus bigram model (:func:`ngram_logprob`) and the per-document
    score is the FLOOR-divided mean log-prob in integer micro-nats —
    higher mean log-prob = lower perplexity = ``head``.

    Buckets: ``tail`` if avg <= percentile_disc(q_low),
    ``head`` if avg > percentile_disc(q_high), else ``middle`` —
    cutoffs computed PER LANGUAGE. Documents with no bigrams are
    dropped (no score exists).

    Scale shape: one LM scoring pass (big-big word join inside
    ngram_logprob), one doc-sized hash join to attach the language,
    ONE materialization of the doc-sized (id, lang, avg) table that
    both the cutoff pass and the assign pass consume (a lazy
    intermediate would re-run the scoring per consumer — the
    round-3 lesson), a |langs| x |distinct avg| histogram exchange
    for the cutoffs, and a row-local broadcast assignment. For
    corpora where the avg-score histogram itself is too wide, the
    key-space refinement of pipelines/curation.py::quantile_trim is
    the drop-in replacement for the cutoff pass.

    Returns Dataset[(id_col, lang_col, avg_logprob_micro, bucket)].
    """
    from ..pipelines.analytics import grouped_quantiles
    from .dedup import _compact, _join_partitions

    scored = ngram_logprob(
        ds, id_col=id_col, text_col=text_col, num_partitions=num_partitions
    )

    def to_avg(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n_bigrams"], dtype=np.int64)
        s = np.asarray(batch["sum_logprob_micro"], dtype=np.int64)
        keep = n > 0
        avg = np.floor_divide(s[keep], n[keep])
        return pa.table(
            {
                id_col: pa.array(
                    np.asarray(batch[id_col], dtype=np.int64)[keep], pa.int64()
                ),
                "avg_logprob_micro": pa.array(avg, pa.int64()),
            }
        )

    # ngram_logprob ends in a hash aggregate whose EMPTY partitions emit
    # schema-less blocks; those poison the next join's key resolution
    # (dedup.py::_compact docstring) — compact the doc-sized result
    # before joining. map_batches can't repair them (empty blocks
    # bypass the UDF).
    avgs = _compact(scored.map_batches(to_avg, batch_format="pyarrow"))
    if avgs is None:  # no document has >= 2 tokens
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    lang_col: pa.array([], pa.string()),
                    "avg_logprob_micro": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.string()),
                }
            )
        )
    joined = avgs.join(
        ds.select_columns([id_col, lang_col]),
        "inner",
        _join_partitions(cap=num_partitions or 16),
        on=(id_col,),
    ).materialize()

    cuts = grouped_quantiles(
        joined, lang_col, "avg_logprob_micro", qs=(q_low, q_high)
    )
    cut_map = {}
    for lang, sub in cuts.groupby(lang_col, sort=False):
        by_q = dict(zip(sub["q"], sub["avg_logprob_micro"]))
        cut_map[lang] = (int(by_q[q_low]), int(by_q[q_high]))

    def assign(batch: pa.Table) -> pa.Table:
        enc = batch[lang_col].combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        dic = enc.dictionary.to_pylist()
        avg = np.asarray(batch["avg_logprob_micro"], dtype=np.int64)
        lo = np.array([cut_map[l][0] for l in dic], dtype=np.int64)[codes]
        hi = np.array([cut_map[l][1] for l in dic], dtype=np.int64)[codes]
        bucket = np.where(
            avg <= lo, "tail", np.where(avg <= hi, "middle", "head")
        )
        return pa.table(
            {
                id_col: batch[id_col],
                lang_col: batch[lang_col],
                "avg_logprob_micro": batch["avg_logprob_micro"],
                "bucket": pa.array(bucket.tolist(), pa.string()),
            }
        )

    return joined.map_batches(assign, batch_format="pyarrow")


def kn_logprob(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
    model_max: int = 4_000_000,
):
    """Per-document INTERPOLATED KNESER-NEY bigram score (Kneser & Ney
    1995; the standard n-gram smoothing): Dataset[(id_col, n_bigrams,
    sum_kn_micro)], one row per document, documents with < 2 tokens
    scoring (0, 0).

        p(v|u) = (max(c(uv) - d, 0) + d * N1+(u.) * Pcont(v)) / c(u)
        Pcont(v) = N1+(.v) / N1+(..)

    with d = ``discount``; the score sums floor(ln(p)*1e6 + 0.5) over
    the document's bigrams. The float expression is evaluated in the
    SAME parse-tree order as the SQL oracle (one libm log per distinct
    count tuple), so scores are bit-equal across engines.

    Plan: broadcast-model only — ONE tagged counting aggregate carries
    per-bigram (pair-fp, u-fp, v-fp, count); the driver derives c(u),
    N1+(u.), N1+(.v), N1+(..) from the vocab-sized model with numpy
    uniques and ships sorted fingerprint arrays (``ray.put``); one
    scoring map finishes. Raises when the model exceeds ``model_max`` —
    at 100 TB vocabulary, shrink the model first with the standard
    count cutoff (hapax bigrams sit at the discount floor), then
    broadcast; a shuffled-join KN plan would need four joins per
    bigram and is not worth its launch depth below that point.
    """
    import ray
    from ray.data.aggregate import Min, Sum

    from ..core.strhash import utf8_hash64
    from .dedup import _compact

    d = float(discount)

    def count_partial(batch: pa.Table) -> pa.Table:
        doc_of, codes, dic = _word_codes(batch, text_col)
        nd = len(dic)
        h0 = utf8_hash64(dic, 0)
        h1 = utf8_hash64(dic, 1)
        z = np.zeros(nd, np.int64)
        kinds = [z]
        k0s, k1s = [h0.view(np.int64)], [h1.view(np.int64)]
        uk0s, uk1s, vk0s, vk1s = [z], [z], [z], [z]
        ns = [np.bincount(codes, minlength=nd).astype(np.int64)]
        if len(codes) >= 2:
            valid = doc_of[:-1] == doc_of[1:]
            a, b = codes[:-1][valid], codes[1:][valid]
            if len(a):
                V = np.int64(nd)
                u, mult = np.unique(a * V + b, return_counts=True)
                ua, ub = u // V, u % V
                bk0, bk1 = _bigram_fp(h0, h1, ua, ub)
                kinds.append(np.ones(len(u), np.int64))
                k0s.append(bk0.view(np.int64))
                k1s.append(bk1.view(np.int64))
                uk0s.append(h0[ua].view(np.int64))
                uk1s.append(h1[ua].view(np.int64))
                vk0s.append(h0[ub].view(np.int64))
                vk1s.append(h1[ub].view(np.int64))
                ns.append(mult.astype(np.int64))
        cols = {
            "kind": np.concatenate(kinds),
            "k0": np.concatenate(k0s),
            "k1": np.concatenate(k1s),
            "uk0": np.concatenate(uk0s),
            "uk1": np.concatenate(uk1s),
            "vk0": np.concatenate(vk0s),
            "vk1": np.concatenate(vk1s),
            "n": np.concatenate(ns),
        }
        return pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})

    from .combine import bucket_sum

    counts = _compact(
        bucket_sum(
            ds.map_batches(count_partial, batch_format="pyarrow"),
            ["kind", "k0", "k1"],
            "n",
            # u/v fps are functions of the bigram key: carried through
            carry_cols=["uk0", "uk1", "vk0", "vk1"],
        )
    )
    if counts is None:
        def zeros_only(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    id_col: batch[id_col],
                    "n_bigrams": pa.array([0] * n, pa.int64()),
                    "sum_kn_micro": pa.array([0] * n, pa.int64()),
                }
            )

        return ds.map_batches(zeros_only, batch_format="pyarrow")
    if counts.count() > model_max:
        raise ValueError(
            "KN model exceeds model_max=%d; apply a count cutoff first"
            % model_max
        )

    t = counts.to_pandas()
    kind = t["kind"].to_numpy()
    k0 = t["k0"].to_numpy().view(np.uint64)
    k1 = t["k1"].to_numpy().view(np.uint64)
    n = t["n"].to_numpy().astype(np.int64)
    w = kind == 0
    # per-word table: cu aligned to the sorted word fingerprints
    wfp, cu_vals = _fp_sorted(k0[w], k1[w], n[w])
    # bigram table + continuation counts from the model itself
    bfp, cuv_vals = _fp_sorted(k0[~w], k1[~w], n[~w])
    uk = np.empty((int((~w).sum()), 2), np.uint64)
    uk[:, 0] = t["uk0"].to_numpy().view(np.uint64)[~w]
    uk[:, 1] = t["uk1"].to_numpy().view(np.uint64)[~w]
    vk = np.empty((len(uk), 2), np.uint64)
    vk[:, 0] = t["vk0"].to_numpy().view(np.uint64)[~w]
    vk[:, 1] = t["vk1"].to_numpy().view(np.uint64)[~w]
    n1all = len(uk)
    # N1+(u.) / N1+(.v): distinct-bigram row counts per u / per v word,
    # scattered onto the sorted word-fp axis (0 where never in position)
    n1u_vals = np.zeros(len(wfp), np.int64)
    n1v_vals = np.zeros(len(wfp), np.int64)
    for mat, out in ((uk, n1u_vals), (vk, n1v_vals)):
        mv = mat.view(_K2).ravel()
        uniq, cnt = np.unique(mv, return_counts=True)
        pos = np.searchsorted(wfp, uniq)
        if len(uniq) and not (wfp[pos] == uniq).all():
            raise AssertionError("KN continuation word missing from vocab")
        out[pos] = cnt
    ref = ray.put((wfp, cu_vals, n1u_vals, n1v_vals, bfp, cuv_vals, n1all))

    def score(batch: pa.Table) -> pa.Table:
        wfp, cu_vals, n1u_vals, n1v_vals, bfp, cuv_vals, n1all = ray.get(ref)
        doc_of, codes, dic = _word_codes(batch, text_col)
        n_rows = batch.num_rows
        out_n = np.zeros(n_rows, np.int64)
        out_s = np.zeros(n_rows, np.int64)
        if len(codes) >= 2 and len(dic):
            valid = doc_of[:-1] == doc_of[1:]
            a, b = codes[:-1][valid], codes[1:][valid]
            dd0 = doc_of[:-1][valid]
            if len(a):
                h0 = utf8_hash64(dic, 0)
                h1 = utf8_hash64(dic, 1)
                Vb = np.int64(len(dic))
                u, mult = np.unique(
                    (dd0 * Vb + a) * Vb + b, return_counts=True
                )
                dd = u // (Vb * Vb)
                rest = u % (Vb * Vb)
                ua, ub = rest // Vb, rest % Vb
                cu = _fp_lookup(wfp, cu_vals, h0[ua], h1[ua])
                n1u = _fp_lookup(wfp, n1u_vals, h0[ua], h1[ua])
                n1v = _fp_lookup(wfp, n1v_vals, h0[ub], h1[ub])
                bk0, bk1 = _bigram_fp(h0, h1, ua, ub)
                cuv = _fp_lookup(bfp, cuv_vals, bk0, bk1)
                tuples = np.stack([cuv, cu, n1u, n1v], axis=1)
                uniq, inv = np.unique(tuples, axis=0, return_inverse=True)
                # SAME parse tree as the SQL oracle, one libm log per
                # distinct count tuple
                logs = np.empty(len(uniq), np.float64)
                for i, (x, y, p_, q_) in enumerate(uniq):
                    pv = (
                        max(float(x) - d, 0.0)
                        + (d * float(p_)) * (float(q_) / float(n1all))
                    ) / float(y)
                    logs[i] = math.log(pv)
                micro = (
                    np.floor(logs[inv] * 1e6 + 0.5).astype(np.int64)
                    * mult.astype(np.int64)
                )
                np.add.at(out_s, dd, micro)
                np.add.at(out_n, dd, mult.astype(np.int64))
        return pa.table(
            {
                id_col: batch[id_col],
                "n_bigrams": pa.array(out_n, pa.int64()),
                "sum_kn_micro": pa.array(out_s, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def pmi_collocations(
    ds,
    min_count: int = 5,
    top_k: int = 50,
    text_col: str = "text",
    model_max: int = 4_000_000,
):
    """Top-``top_k`` adjacent-bigram collocations by pointwise mutual
    information (Church & Hanks 1990, the standard collocation score):
    Dataset[(w1, w2, n, pmi_micro)] over the alnum tokenization, with

        pmi_micro = floor(ln((n * N) / (c(w1) * c(w2))) * 1e6 + 0.5)

    where N is the corpus total bigram count and c(w) the unigram
    count; only bigrams with ``n >= min_count`` are scored (the
    classic low-count PMI blowup guard), ordered by
    (pmi_micro desc, w1, w2) — a total order, so the cut is
    deterministic and oracle-checkable. The float expression is ONE
    int64→double division + one libm log in the same parse-tree order
    as the SQL oracle, so scores are bit-equal across engines.

    Shape (the kn_logprob broadcast-model plan — ONE counting
    aggregate, ONE scoring map, no per-bigram joins): per-batch tagged
    partials carry word-fingerprint unigram counts (no strings — the
    scoring lookup is by 128-bit FNV pair), string-keyed bigram
    counts, and a batch-total row; one groupby reduces all three; the
    vocab-sized unigram side broadcasts via ``ray.put`` as sorted
    fingerprint numpy (zero-copy per batch); the min_count-filtered
    bigram table scores row-locally and a candidate-sized sort+limit
    finishes. Raises when the unigram model exceeds ``model_max`` or
    corpus counts overflow the exact-int64 products — at 100 TB apply
    a count cutoff or shard by language first, noted deliberately.
    """
    import ray
    from ray.data.aggregate import Sum

    from ..core.strhash import utf8_hash64
    from .dedup import _compact

    def partial(batch: pa.Table) -> pa.Table:
        doc_of, codes, dic = _word_codes(batch, text_col)
        nd = len(dic)
        h0 = utf8_hash64(dic, 0).view(np.int64) if nd else np.empty(0, np.int64)
        h1 = utf8_hash64(dic, 1).view(np.int64) if nd else np.empty(0, np.int64)
        empty_s = pa.array([""] * nd, pa.string())
        parts = [
            pa.table(
                {
                    "kind": pa.array(np.zeros(nd, np.int64), pa.int64()),
                    "k0": pa.array(h0, pa.int64()),
                    "k1": pa.array(h1, pa.int64()),
                    "w1": empty_s,
                    "w2": empty_s,
                    "n": pa.array(
                        np.bincount(codes, minlength=nd).astype(np.int64),
                        pa.int64(),
                    ),
                }
            )
        ]
        n_bigrams = 0
        if len(codes) >= 2 and nd:
            valid = doc_of[:-1] == doc_of[1:]
            a, b = codes[:-1][valid], codes[1:][valid]
            n_bigrams = int(len(a))
            if len(a):
                V = np.int64(nd)
                u, mult = np.unique(a * V + b, return_counts=True)
                ua, ub = u // V, u % V
                z = np.zeros(len(u), np.int64)
                parts.append(
                    pa.table(
                        {
                            "kind": pa.array(np.ones(len(u), np.int64), pa.int64()),
                            "k0": pa.array(z, pa.int64()),
                            "k1": pa.array(z, pa.int64()),
                            "w1": dic.take(pa.array(ua, pa.int64())),
                            "w2": dic.take(pa.array(ub, pa.int64())),
                            "n": pa.array(mult.astype(np.int64), pa.int64()),
                        }
                    )
                )
        parts.append(
            pa.table(
                {
                    "kind": pa.array([2], pa.int64()),
                    "k0": pa.array([0], pa.int64()),
                    "k1": pa.array([0], pa.int64()),
                    "w1": pa.array([""], pa.string()),
                    "w2": pa.array([""], pa.string()),
                    "n": pa.array([n_bigrams], pa.int64()),
                }
            )
        )
        return pa.concat_tables(parts).combine_chunks()

    empty = pa.table(
        {
            "w1": pa.array([], pa.string()),
            "w2": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "pmi_micro": pa.array([], pa.int64()),
        }
    )

    counts = _compact(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["kind", "k0", "k1", "w1", "w2"])
        .aggregate(Sum("n", alias_name="n"))
    )
    if counts is None:
        return ray.data.from_arrow(empty)

    def keep_kind(k: int):
        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch["kind"], k))

        return f

    uni = counts.map_batches(keep_kind(0), batch_format="pyarrow")
    if uni.count() > model_max:
        raise ValueError(
            "PMI unigram model exceeds model_max=%d; apply a count "
            "cutoff or shard by language first" % model_max
        )
    ut = uni.select_columns(["k0", "k1", "n"]).to_pandas()
    n_total = counts.map_batches(keep_kind(2), batch_format="pyarrow").sum("n")
    n_total = int(n_total or 0)
    if n_total == 0:
        return ray.data.from_arrow(empty)
    wfp, cu_vals = _fp_sorted(
        ut["k0"].to_numpy().view(np.uint64),
        ut["k1"].to_numpy().view(np.uint64),
        ut["n"].to_numpy().astype(np.int64),
    )
    ref = ray.put((wfp, cu_vals))

    def score(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.equal(batch["kind"], 1),
                pc.greater_equal(batch["n"], min_count),
            )
        )
        wfp, cu_vals = ray.get(ref)
        w1, w2 = batch["w1"], batch["w2"]
        n = np.asarray(batch["n"], dtype=np.int64)
        cu = _fp_lookup(wfp, cu_vals, utf8_hash64(w1, 0), utf8_hash64(w1, 1))
        cv = _fp_lookup(wfp, cu_vals, utf8_hash64(w2, 0), utf8_hash64(w2, 1))
        if len(n) and (
            int(n.max()) > (2**63 - 1) // n_total
            or int(cu.max()) > (2**63 - 1) // max(int(cv.max()), 1)
        ):
            raise OverflowError(
                "pmi_collocations: counts overflow exact int64 products "
                "— shard the corpus or apply a count cutoff first"
            )
        # SAME parse tree as the SQL oracle: one int64→double division,
        # one libm log per row
        pmi = np.floor(
            np.log((n * n_total).astype(np.float64) / (cu * cv).astype(np.float64))
            * 1e6
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "w1": w1,
                "w2": w2,
                "n": pa.array(n, pa.int64()),
                "pmi_micro": pa.array(pmi, pa.int64()),
            }
        )

    return (
        counts.map_batches(score, batch_format="pyarrow")
        .sort(["pmi_micro", "w1", "w2"], descending=[True, False, False])
        .limit(top_k)
    )
