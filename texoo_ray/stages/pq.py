"""Product quantization (PQ) for ANN at corpus scale.

Public algorithm: Jégou, Douze & Schmid, "Product Quantization for
Nearest Neighbor Search" (IEEE TPAMI 2011) — split the embedding into M
subspaces, learn a small codebook per subspace (k-means), store each
vector as M small codes, and answer queries with asymmetric distance
computation (ADC): one (M x K) distance table per query, then each
stored vector costs M table lookups instead of a D-dim dot product.
This is the compression leg of the ANN scale path next to IVF
(stages/ivf.py): at 100 TB the raw fp32 vectors do not fit hot storage,
the M-byte codes do. Reference tie-in: the in-memory cosine index this
accelerates is InMemoryIndex.find(vec, k)
(texoo-retrieval/.../index/InMemoryIndex.java:497-558).

Everything is EXACT int64 arithmetic on the same 2**scale_bits grid as
stages/knn.py's k-means family, so training, encoding, and search are
bit-reproducible across block layouts and cluster sizes, and the SQL
oracles replay the identical algebra:

- training (:func:`pq_train`): codebooks are seeded from the corpus
  ``label`` column (per-label subspace centroids — the same seeding the
  kmeans_iter* queries use) and refined with ONE per-subspace Lloyd
  round. Cost: two aggregate passes whose shuffle volume is
  O(blocks x K x D) integer rows — corpus-size independent — plus a
  KB-sized driver table.
- encoding (:func:`pq_encode`): shuffle-free; the codebook matrix is
  closure-broadcast and assignment is an einsum per subspace per batch
  (loop over M subspaces, never over rows).
- search (:func:`pq_search`): the ADC table is driver-computed
  (M x K ints), per-block partial top-k keeps the exchange at <= k rows
  per block.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa

from .knn import _batch_matrix, label_centroids


def _round_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Exact round-half-up of s/n in pure int64 floor arithmetic —
    identical to the kmeans oracles' ((2s+n) ... ) // (2n) formula."""
    return (2 * s + n) // (2 * n)


def _codebook_matrices(
    tbl: pa.Table, m: int, dim: int
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Per-subspace (codes, cq) from a (sub, code, dim, sum_q, n_vecs)
    table: codes ascending, cq shape (K_sub, dim // m) on the int grid."""
    sub_dim = dim // m
    t = tbl.sort_by(
        [("sub", "ascending"), ("code", "ascending"), ("dim", "ascending")]
    )
    subs = np.asarray(t["sub"], dtype=np.int64)
    codes = np.asarray(t["code"], dtype=np.int64)
    s = np.asarray(t["sum_q"], dtype=np.int64)
    n = np.asarray(t["n_vecs"], dtype=np.int64)
    cq = _round_div(s, n)
    out: List[Tuple[np.ndarray, np.ndarray]] = []
    for sub in range(m):
        sel = subs == sub
        c_sub = codes[sel].reshape(-1, sub_dim)[:, 0]
        out.append((c_sub, cq[sel].reshape(-1, sub_dim)))
    return out

def _assign_subspaces(vq: np.ndarray, books, sub_dim: int) -> np.ndarray:
    """(n, M) argmin code INDEX per subspace; ties to the lowest code
    (codes are sorted ascending, np.argmin takes the first minimum)."""
    n = vq.shape[0]
    best = np.empty((n, len(books)), dtype=np.int64)
    for sub, (_, cq) in enumerate(books):
        sl = vq[:, sub * sub_dim : (sub + 1) * sub_dim]
        diff = sl[:, None, :] - cq[None, :, :]
        d2 = np.einsum("ijk,ijk->ij", diff, diff)
        best[:, sub] = np.argmin(d2, axis=1)
    return best


def pq_train(
    ds,
    m: int = 8,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale_bits: int = 20,
) -> pa.Table:
    """Train per-subspace codebooks: label-seeded centroids + ONE Lloyd
    refinement round per subspace. Returns the driver-sized table
    (sub, code, dim, sum_q, n_vecs); derive centroid elements with the
    exact integer round ``(2*sum_q + n) // (2*n)``.

    Two aggregate passes total: the label_centroids pass (init) and the
    refinement pass — each a per-batch ``np.add.at`` partial plus one
    O(blocks x K x D)-row integer groupby. Codes that lose every member
    in refinement disappear from the table (SQL semantics).
    """
    from ray.data.aggregate import Sum

    cent0 = pa.Table.from_pylist(
        label_centroids(
            ds, label_col=label_col, vec_col=vec_col, scale_bits=scale_bits
        ).take_all()
    )
    labels0 = np.unique(np.asarray(cent0["label"], dtype=np.int64))
    dim = cent0.num_rows // len(labels0)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_dim = dim // m
    t0 = cent0.sort_by([("label", "ascending"), ("dim", "ascending")])
    cq0 = _round_div(
        np.asarray(t0["sum_q"], dtype=np.int64).reshape(len(labels0), dim),
        np.asarray(t0["n_vecs"], dtype=np.int64).reshape(len(labels0), dim),
    )
    books0 = [
        (labels0, cq0[:, s * sub_dim : (s + 1) * sub_dim]) for s in range(m)
    ]
    scale = float(1 << scale_bits)

    def refine_partial(batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, vec_col).astype(np.float64)
        vq = np.floor(mat * scale + 0.5).astype(np.int64)
        best = _assign_subspaces(vq, books0, sub_dim)
        subs, codes, dims, sums, cnts = [], [], [], [], []
        for sub in range(m):
            sl = vq[:, sub * sub_dim : (sub + 1) * sub_dim]
            k = len(labels0)
            acc = np.zeros((k, sub_dim), dtype=np.int64)
            np.add.at(acc, best[:, sub], sl)
            cnt = np.bincount(best[:, sub], minlength=k).astype(np.int64)
            present = np.nonzero(cnt)[0]
            for ci in present:
                subs.extend([sub] * sub_dim)
                codes.extend([int(labels0[ci])] * sub_dim)
                dims.extend(range(sub * sub_dim, (sub + 1) * sub_dim))
                sums.extend(acc[ci].tolist())
                cnts.extend([int(cnt[ci])] * sub_dim)
        return pa.table(
            {
                "sub": pa.array(subs, pa.int64()),
                "code": pa.array(codes, pa.int64()),
                "dim": pa.array(dims, pa.int64()),
                "sum_q": pa.array(sums, pa.int64()),
                "n_vecs": pa.array(cnts, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(refine_partial, batch_format="pyarrow")
        .groupby(["sub", "code", "dim"])
        .aggregate(
            Sum("sum_q", alias_name="sum_q"), Sum("n_vecs", alias_name="n_vecs")
        )
    )
    return pa.Table.from_pylist(agg.take_all())


def pq_encode(
    ds,
    codebook: pa.Table,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale_bits: int = 20,
):
    """Encode every vector: Dataset[(id_col, sub, code)] — M rows per
    vector, the PQ compressed representation. Shuffle-free; the
    codebook ships once in the closure."""
    dim = int(np.asarray(codebook["dim"], dtype=np.int64).max()) + 1
    sub_dim = dim // m
    books = _codebook_matrices(codebook, m, dim)
    scale = float(1 << scale_bits)

    def encode(batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, vec_col).astype(np.float64)
        vq = np.floor(mat * scale + 0.5).astype(np.int64)
        best = _assign_subspaces(vq, books, sub_dim)
        n = batch.num_rows
        ids = np.repeat(np.asarray(batch[id_col], dtype=np.int64), m)
        subs = np.tile(np.arange(m, dtype=np.int64), n)
        code_vals = np.concatenate(
            [books[s][0][best[:, s]][:, None] for s in range(m)], axis=1
        ).reshape(-1)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "sub": pa.array(subs, pa.int64()),
                "code": pa.array(code_vals, pa.int64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def pq_search(
    ds,
    codebook: pa.Table,
    query: np.ndarray,
    k: int = 10,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale_bits: int = 20,
):
    """ADC top-k: Dataset[(id_col, ad2)] of the k nearest vectors by
    approximate (PQ-reconstructed) squared distance, ties to the lowest
    id. The (M x K) distance table is computed once on the driver and
    closure-broadcast; each block emits <= k partial rows."""
    dim = int(np.asarray(codebook["dim"], dtype=np.int64).max()) + 1
    sub_dim = dim // m
    books = _codebook_matrices(codebook, m, dim)
    scale = float(1 << scale_bits)
    qq = np.floor(np.asarray(query, dtype=np.float64) * scale + 0.5).astype(
        np.int64
    )
    # dt[sub] : per-code squared distance of the query's subvector
    dt = []
    for sub, (_, cq) in enumerate(books):
        d = qq[sub * sub_dim : (sub + 1) * sub_dim][None, :] - cq
        dt.append(np.einsum("ij,ij->i", d, d))

    def partial(batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, vec_col).astype(np.float64)
        vq = np.floor(mat * scale + 0.5).astype(np.int64)
        best = _assign_subspaces(vq, books, sub_dim)
        ad2 = np.zeros(batch.num_rows, dtype=np.int64)
        for sub in range(m):
            ad2 += dt[sub][best[:, sub]]
        ids = np.asarray(batch[id_col], dtype=np.int64)
        order = np.lexsort((ids, ad2))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "ad2": pa.array(ad2[order], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort(["ad2", id_col])
        .limit(k)
    )


def ivf_pq_search(
    ds,
    query: np.ndarray,
    k: int = 10,
    nprobe: int = 3,
    m: int = 8,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale_bits: int = 20,
):
    """IVF + PQ composed search — the classic two-level ANN pipeline
    (Jégou et al. 2011 §V: inverted file for candidate pruning,
    product-quantizer codes for ranking): vectors are coarse-assigned
    to K cells; a query probes only its ``nprobe`` nearest cells and
    ranks the survivors by ADC distance.

    Unlike :func:`~.ivf.ivf_topk` (float path, exact only when probing
    every cell), every step here is int64 on the 2**scale_bits grid —
    the coarse quantizer is the label-seeded exact centroid table and
    the ranker is :func:`pq_train`'s refined codebook — so the search is
    GENUINELY pruned (nprobe < K skips most of the corpus) yet still
    bit-reproducible and SQL-hash-checkable end to end.

    Scale shape: three aggregate passes build the KB-sized coarse +
    codebook tables (all O(blocks x K x D) integer partials); the search
    itself is one shuffle-free pass emitting <= k rows per block — and
    with a cell-partitioned layout (build_ivf_index's trick) the read
    itself would touch only nprobe/K of the data.

    Returns Dataset[(id_col, cell, ad2)] of the k best candidates by
    (ad2, id).
    """
    cent0 = pa.Table.from_pylist(
        label_centroids(
            ds, label_col=label_col, vec_col=vec_col, scale_bits=scale_bits
        ).take_all()
    )
    labels0 = np.unique(np.asarray(cent0["label"], dtype=np.int64))
    dim = cent0.num_rows // len(labels0)
    sub_dim = dim // m
    t0 = cent0.sort_by([("label", "ascending"), ("dim", "ascending")])
    cq0 = _round_div(
        np.asarray(t0["sum_q"], dtype=np.int64).reshape(len(labels0), dim),
        np.asarray(t0["n_vecs"], dtype=np.int64).reshape(len(labels0), dim),
    )
    book = pq_train(
        ds, m=m, label_col=label_col, vec_col=vec_col, scale_bits=scale_bits
    )
    books = _codebook_matrices(book, m, dim)
    scale = float(1 << scale_bits)
    qq = np.floor(np.asarray(query, dtype=np.float64) * scale + 0.5).astype(
        np.int64
    )
    # probed cells: nprobe smallest exact distances, ties to lowest label
    dq = np.einsum("ij,ij->i", qq[None, :] - cq0, qq[None, :] - cq0)
    probe = np.lexsort((labels0, dq))[:nprobe]
    probe_set = np.zeros(len(labels0), dtype=bool)
    probe_set[probe] = True
    dt = []
    for sub, (_, cq) in enumerate(books):
        d = qq[sub * sub_dim : (sub + 1) * sub_dim][None, :] - cq
        dt.append(np.einsum("ij,ij->i", d, d))

    def partial(batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, vec_col).astype(np.float64)
        vq = np.floor(mat * scale + 0.5).astype(np.int64)
        diff = vq[:, None, :] - cq0[None, :, :]
        cell_idx = np.argmin(np.einsum("ijk,ijk->ij", diff, diff), axis=1)
        mask = probe_set[cell_idx]
        sel = np.nonzero(mask)[0]
        ids = np.asarray(batch[id_col], dtype=np.int64)[sel]
        if len(sel) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                    "ad2": pa.array([], pa.int64()),
                }
            )
        best = _assign_subspaces(vq[sel], books, sub_dim)
        ad2 = np.zeros(len(sel), dtype=np.int64)
        for sub in range(m):
            ad2 += dt[sub][best[:, sub]]
        order = np.lexsort((ids, ad2))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "cell": pa.array(labels0[cell_idx[sel]][order], pa.int64()),
                "ad2": pa.array(ad2[order], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort(["ad2", id_col])
        .limit(k)
    )
