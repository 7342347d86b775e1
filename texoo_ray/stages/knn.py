"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: numpy matmul per batch against a broadcast query
  matrix (``ray.put`` once, read per actor) + per-batch partial top-k ->
  tiny global top-k. The baseline and the exact answer.
- ``lsh_topk``: random-hyperplane LSH bucketing; only candidate buckets are
  scored. The scale path when the corpus is huge and recall < 1 is fine.

Mirrors the reference's InMemoryIndex cosine top-k contract
(InMemoryIndex.java:497-558: normalized matrix, cosine scores, k best).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=-1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.values, dtype=np.float32)
    offsets = np.asarray(arr.offsets)
    dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
    return flat.reshape(-1, dim) if dim else np.zeros((len(batch), 0), np.float32)


class BruteForceScorer:
    """Actor-pool stage: scores each batch against the broadcast queries."""

    def __init__(self, queries_ref=None, queries: Optional[np.ndarray] = None, vec_col: str = "embedding"):
        if queries is None:
            import ray

            queries = ray.get(queries_ref)
        self.q = _normalize(np.asarray(queries, dtype=np.float32))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, self.vec_col))
        sims = m @ self.q.T  # (rows, n_queries)
        best_q = np.argmax(sims, axis=1).astype(np.int32)
        best_s = sims[np.arange(sims.shape[0]), best_q].astype(np.float64)
        out = batch.drop_columns([self.vec_col])
        out = out.append_column("query_idx", pa.array(best_q))
        out = out.append_column("score", pa.array(best_s))
        return out


def brute_force_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: int = 4,
):
    """Exact cosine top-k for ONE query vector: per-batch partial top-k,
    then global sort+limit over <= k rows per block."""
    qn = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]

    def score(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, vec_col).astype(np.float64))
        sims = m @ qn
        keep = min(k, len(sims))
        if keep == 0:
            return pa.table({id_col: pa.array([], pa.int64()), "score": pa.array([], pa.float64())})
        idx = np.argpartition(-sims, keep - 1)[:keep]
        ids = np.asarray(batch[id_col], dtype=np.int64)[idx]
        return pa.table({id_col: pa.array(ids), "score": pa.array(sims[idx])})

    partial = ds.map_batches(score, batch_format="pyarrow")
    return partial.sort(["score", id_col], descending=[True, False]).limit(k)


def lsh_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
    probe_hamming: int = 2,
):
    """Approximate top-k: random-hyperplane signatures; score only rows
    whose signature is within ``probe_hamming`` bits of the query's."""
    q = np.asarray(query, dtype=np.float64).reshape(-1)
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, q.shape[0])
    q_bits = (planes @ q > 0).astype(np.int64)
    q_sig = int(sum(int(b) << i for i, b in enumerate(q_bits)))
    qn = _normalize(q.reshape(1, -1))[0]

    def score(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, vec_col).astype(np.float64)
        sigs_bits = (m @ planes.T > 0).astype(np.uint8)
        sigs = np.zeros(len(m), dtype=np.int64)
        for b in range(n_planes):
            sigs |= sigs_bits[:, b].astype(np.int64) << b
        ham = np.zeros(len(m), dtype=np.int64)
        x = sigs ^ q_sig
        while True:
            nz = x != 0
            if not nz.any():
                break
            ham[nz] += 1
            x = x & (x - 1)
        mask = ham <= probe_hamming
        if not mask.any():
            return pa.table({id_col: pa.array([], pa.int64()), "score": pa.array([], pa.float64())})
        mm = _normalize(m[mask])
        sims = mm @ qn
        ids = np.asarray(batch[id_col], dtype=np.int64)[mask]
        keep = min(k, len(sims))
        idx = np.argpartition(-sims, keep - 1)[:keep]
        return pa.table({id_col: pa.array(ids[idx]), "score": pa.array(sims[idx])})

    partial = ds.map_batches(score, batch_format="pyarrow")
    return partial.sort(["score", id_col], descending=[True, False]).limit(k)


class MultiQueryScorer:
    """Actor-pool stage for batched ANN: the broadcast query matrix is
    fetched once per actor; each Arrow batch computes ALL query
    similarities in one (rows x Q) matmul and emits a per-query partial
    top-k (<= Q*k rows per block)."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        import ray

        self.q = _normalize(np.asarray(ray.get(queries_ref), dtype=np.float64))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.vec_col).astype(np.float64)
        empty = pa.table(
            {
                "query_idx": pa.array([], pa.int32()),
                self.id_col: pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if m.shape[0] == 0 or self.q.shape[0] == 0:
            return empty
        sims = _normalize(m) @ self.q.T  # (rows, Q)
        ids = np.asarray(batch[self.id_col], dtype=np.int64)
        keep = min(self.k, sims.shape[0])
        top = np.argpartition(-sims, keep - 1, axis=0)[:keep]  # (keep, Q)
        n_q = sims.shape[1]
        q_col = np.repeat(np.arange(n_q, dtype=np.int32), keep)
        flat_rows = top.T.reshape(-1)
        return pa.table(
            {
                "query_idx": pa.array(q_col),
                self.id_col: pa.array(ids[flat_rows]),
                "score": pa.array(sims[flat_rows, np.repeat(np.arange(n_q), keep)]),
            }
        )


def multi_query_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: int = 2,
):
    """Exact cosine top-k for a BATCH of queries: broadcast query matrix,
    per-batch per-query partial top-k, then a per-query merge over
    <= blocks*k candidate rows. Returns Dataset[(query_idx, rank, id)]
    ordered by (query_idx, rank); ties break (score desc, id asc)."""
    import ray

    q_ref = ray.put(np.asarray(queries, dtype=np.float64))

    partial = ds.map_batches(
        MultiQueryScorer,
        fn_constructor_kwargs=dict(
            queries_ref=q_ref, k=k, vec_col=vec_col, id_col=id_col
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def topk(group: pa.Table) -> pa.Table:
        srt = group.sort_by([("score", "descending"), (id_col, "ascending")]).slice(
            0, k
        )
        return pa.table(
            {
                "query_idx": srt["query_idx"],
                "rank": pa.array(np.arange(1, srt.num_rows + 1, dtype=np.int64)),
                id_col: srt[id_col],
            }
        )

    return (
        partial.groupby("query_idx")
        .map_groups(topk, batch_format="pyarrow")
        .sort(["query_idx", "rank"])
    )


def label_centroids(
    ds,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale_bits: int = 20,
):
    """Per-label element-wise vector aggregate — the distributed form of
    the reference's mean-of-sentence-vectors labeling
    (SectorAnnotator.java:332-363) lifted to corpus scale: one centroid
    per class over millions of vectors.

    Returns Dataset[(label, dim, sum_q, n_vecs)] where
    ``sum_q = sum(floor(v * 2**scale_bits + 0.5))`` — elements are
    quantized to EXACT int64 before summation, so the sum is
    order-independent (bit-equal across block layouts, cluster sizes,
    and the SQL oracle; float accumulation is neither). The caller
    derives ``centroid = sum_q / n_vecs / 2**scale_bits``.

    Scale shape: each batch reduces to at most |labels| x dim partial
    rows via one vectorized ``np.add.at`` (no Python loop over vectors),
    and the only shuffle is a ``groupby((label, dim)).Sum`` over those
    partials — shuffle volume is O(blocks x labels x dim), independent
    of corpus size.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    scale = float(1 << scale_bits)

    def partial(batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, vec_col).astype(np.float64)
        q = np.floor(mat * scale + 0.5).astype(np.int64)
        labels = np.asarray(batch[label_col], dtype=np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        dim = q.shape[1]
        sums = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, dim), pa.int64()),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), len(uniq)), pa.int64()),
                "sum_q": pa.array(sums.reshape(-1), pa.int64()),
                "n_vecs": pa.array(np.repeat(cnt, dim), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("sum_q", alias_name="sum_q"), Sum("n_vecs", alias_name="n_vecs"))
    )


def _centroid_matrix(centroids: pa.Table):
    """(labels, cq) from a label_centroids table: round-half-up integer
    centroid elements via pure floor arithmetic (matches the oracle's
    floor-division formula on negatives too)."""
    t = centroids.sort_by([("label", "ascending"), ("dim", "ascending")])
    labels = np.unique(np.asarray(t["label"], dtype=np.int64))
    dim = len(t) // len(labels)
    s = np.asarray(t["sum_q"], dtype=np.int64).reshape(len(labels), dim)
    n = np.asarray(t["n_vecs"], dtype=np.int64).reshape(len(labels), dim)
    return labels, (2 * s + n) // (2 * n)


def kmeans_assign(
    ds,
    centroids: pa.Table,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale_bits: int = 20,
    keep_vec: bool = False,
):
    """One exact distributed Lloyd assignment step: each vector goes to
    the nearest centroid, ENTIRELY in int64 arithmetic so the result is
    bit-equal across block layouts, cluster sizes and the SQL oracle.

    ``centroids`` is the (label, dim, sum_q, n_vecs) table produced by
    :func:`label_centroids` (driver-sized: labels x dim rows). Each
    centroid element is rounded to the same 2**scale_bits grid as the
    vectors via floor((2*sum_q + n) / (2*n)) — exact round-half-up of
    sum_q/n in pure integer math — and distances are
    sum((v_q - c_q)^2), which fits int64 (|v_q| ~ 3 * 2^20, squared and
    summed over <=2^10 dims < 2^63). Ties break to the lowest label
    (np.argmin takes the first minimum; the oracle orders by (d2,
    label)).

    Scale shape: the centroid matrix is closure-broadcast (KB-sized);
    assignment is one stateless vectorized ``map_batches`` — no shuffle
    at all. ``keep_vec=True`` carries the vector column through for a
    following centroid pass (:func:`kmeans_iterate`).
    """
    labels, cq = _centroid_matrix(centroids)
    scale = float(1 << scale_bits)

    def assign(batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, vec_col).astype(np.float64)
        vq = np.floor(mat * scale + 0.5).astype(np.int64)
        diff = vq[:, None, :] - cq[None, :, :]
        d2 = np.einsum("ijk,ijk->ij", diff, diff)
        best = np.argmin(d2, axis=1)
        cols = {
            id_col: batch[id_col],
            "assigned_label": pa.array(labels[best], pa.int64()),
        }
        if keep_vec:
            cols[vec_col] = batch[vec_col]
        else:
            cols["d2"] = pa.array(d2[np.arange(len(best)), best], pa.int64())
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_iterate(
    ds,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init_label_col: str = "label",
    scale_bits: int = 20,
):
    """Lloyd's algorithm, distributed and EXACT: alternate
    :func:`label_centroids` (one pass, tiny integer partial-sum shuffle)
    and :func:`kmeans_assign` (one shuffle-free broadcast pass) for
    ``n_iter`` rounds, starting from the ``init_label_col`` seeding.

    The driver loop iterates over PLANS, not data — per round the only
    driver-side materialization is the labels x dim centroid table
    (``take_all`` of a KB-sized aggregate). Because every step is int64
    arithmetic, the trajectory is bit-reproducible at any cluster size
    and block layout (and SQL-checkable by unrolling the rounds — the
    ``kmeans_iter2`` oracle does exactly that).

    Returns the final assignment Dataset[(id, assigned_label, d2)].
    """
    current, label_col = ds, init_label_col
    for round_idx in range(n_iter):
        cent = pa.Table.from_pylist(
            label_centroids(
                current, label_col=label_col, vec_col=vec_col, scale_bits=scale_bits
            ).take_all()
        )
        last = round_idx == n_iter - 1
        nxt = kmeans_assign(
            ds, cent, vec_col=vec_col, id_col=id_col,
            scale_bits=scale_bits, keep_vec=not last,
        )
        if last:
            return nxt
        current, label_col = nxt, "assigned_label"
    return current


def embedding_gram(
    ds, vec_col: str = "embedding", scale_bits: int = 10
) -> pa.Table:
    """EXACT corpus Gram matrix X^T X over int64-quantized embeddings —
    the one-pass sufficient statistic behind PCA whitening, covariance
    estimation, and linear probes at corpus scale (with the per-dim sums
    from :func:`label_centroids`, the centered covariance follows as
    (G - s s^T / n) / n).

    Shape: each batch quantizes to ``floor(v * 2**scale_bits + 0.5)``
    int64 (the family's order-independent exact-arithmetic trick) and
    reduces to ONE dim x dim partial via a single integer matmul; the
    partials sum up a mergeable AggregateFn tree — ZERO shuffle, the
    driver receives one dim^2 matrix regardless of corpus size. Keep
    ``scale_bits`` low enough that n * 2**(2*scale_bits) fits int64
    (default 10 leaves ~2^43 rows of headroom for unit-norm vectors).

    Returns a driver-sized pa.Table[(i, j, gram_q, n_vecs)] over the
    upper triangle i <= j.
    """
    from ray.data.aggregate import AggregateFn

    scale = float(1 << scale_bits)

    def accumulate(state, block: pa.Table):
        mat = _batch_matrix(block, vec_col).astype(np.float64)
        if mat.size == 0:
            return state
        q = np.floor(mat * scale + 0.5).astype(np.int64)
        g = q.T @ q
        n = mat.shape[0]
        if state is None:
            return [g, n]
        state[0] += g
        state[1] += n
        return state

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        a[0] += b[0]
        a[1] += b[1]
        return a

    res = ds.aggregate(
        AggregateFn(
            init=lambda _: None,
            merge=merge,
            accumulate_block=accumulate,
            finalize=lambda a: a if a is None else [a[0].tolist(), a[1]],
            name="gram",
        )
    )["gram"]
    if res is None:
        return pa.table(
            {
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "gram_q": pa.array([], pa.int64()),
                "n_vecs": pa.array([], pa.int64()),
            }
        )
    g = np.asarray(res[0], dtype=np.int64)
    n = int(res[1])
    iu, ju = np.triu_indices(g.shape[0])
    return pa.table(
        {
            "i": pa.array(iu.astype(np.int64), pa.int64()),
            "j": pa.array(ju.astype(np.int64), pa.int64()),
            "gram_q": pa.array(g[iu, ju], pa.int64()),
            "n_vecs": pa.array(np.full(len(iu), n, np.int64), pa.int64()),
        }
    )


def rrf_fusion(runs, k: int = 10, c: int = 60, id_col: str = "doc_id",
               query_col: str | None = None, n_buckets: int = 64):
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    N retriever runs — each a Dataset[(id[, query], rank)] with rank
    1-based — into fused top-``k`` per query:
    ``rrf_micro = sum over runs of 1_000_000 // (c + rank)`` (integer
    floor division, so the score algebra is bit-exact in the DuckDB
    mirror). Ties at the cut break by ascending id, making the top-k
    set deterministic. Returns Dataset[(id[, query], rrf_micro)].

    The multi-retriever composition layer over this engine's retriever
    zoo (bm25_topk, brute/LSH/IVF/PQ cosine top-k): rank lists are
    k-sized per query, so fusion is ONE union + ONE grouped sum; with
    ``query_col`` set, millions of queries fuse in the same two steps —
    the sum groups on (query, id) and per-query top-k runs block-local
    after a query-hash bucket exchange (no per-query dispatch)."""
    import ray.data
    from ray.data.aggregate import Sum

    def score(batch: pa.Table) -> pa.Table:
        r = np.asarray(batch["rank"], dtype=np.int64)
        cols = {
            id_col: batch[id_col].cast(pa.int64()),
            "s": pa.array(1_000_000 // (c + r), pa.int64()),
        }
        if query_col is not None:
            cols[query_col] = batch[query_col]
        return pa.table(cols)

    united = runs[0]
    for r in runs[1:]:
        united = united.union(r)
    scored = united.map_batches(score, batch_format="pyarrow")
    keys = [query_col, id_col] if query_col is not None else [id_col]
    summed = scored.groupby(keys).aggregate(Sum("s", alias_name="rrf_micro"))
    if query_col is None:
        def cut(batch: pa.Table) -> pa.Table:
            s = np.asarray(batch["rrf_micro"], dtype=np.int64)
            i = np.asarray(batch[id_col], dtype=np.int64)
            order = np.lexsort((i, -s))[:k]
            return pa.table(
                {
                    id_col: pa.array(i[order], pa.int64()),
                    "rrf_micro": pa.array(s[order], pa.int64()),
                }
            )

        # fused lists are k*N-run-sized: one final block
        return summed.repartition(1).map_batches(cut, batch_format="pyarrow")

    def bucketize(batch: pa.Table) -> pa.Table:
        q = np.asarray(batch[query_col], dtype=np.int64)
        h = q.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        b = ((h >> np.uint64(33)) % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    def cut_block(group: pa.Table) -> pa.Table:
        q = np.asarray(group[query_col], dtype=np.int64)
        s = np.asarray(group["rrf_micro"], dtype=np.int64)
        i = np.asarray(group[id_col], dtype=np.int64)
        order = np.lexsort((i, -s, q))
        q, s, i = q[order], s[order], i[order]
        pos = np.arange(len(q))
        starts = np.maximum.accumulate(
            np.where(np.concatenate([[True], q[1:] != q[:-1]]), pos, 0)
        )
        keep = (pos - starts) < k
        return pa.table(
            {
                query_col: pa.array(q[keep], pa.int64()),
                id_col: pa.array(i[keep], pa.int64()),
                "rrf_micro": pa.array(s[keep], pa.int64()),
            }
        )

    return (
        summed.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cut_block, batch_format="pyarrow")
    )
