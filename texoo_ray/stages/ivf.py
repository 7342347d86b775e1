"""IVF (inverted-file) approximate nearest-neighbour search.

The scale path for similarity search over an embedding column, alongside
``knn.brute_force_topk`` (exact baseline) and ``knn.lsh_topk``:

- ``train_centroids``: k-means (k-means++ init, Lloyd iterations, fixed
  seed) over a driver-side SAMPLE of the corpus — the classic IVF
  training recipe (train on ~100·nlist vectors, not the corpus). The
  centroid matrix is tiny (nlist × dim) and is broadcast via ``ray.put``.
- ``ivf_topk``: one-pass streaming search. Each batch assigns its rows to
  their nearest centroid with one matmul, keeps only rows whose cell is
  among the query's ``nprobe`` closest cells, scores those, and emits a
  per-batch partial top-k; a k-row global sort finishes. Never
  materializes the dataset; the non-probed fraction costs one assign
  matmul and no scoring.
- ``build_ivf_index`` / ``search_ivf_index``: the persistent variant.
  Build writes the corpus as parquet partitioned BY CELL ID, so a later
  search reads only the ``nprobe`` probed-cell partitions — at 100 TB the
  read itself is pruned to nprobe/nlist of the data, which is the entire
  point of IVF. Search streams only those partitions through the same
  partial-top-k shape.

Mirrors the contract of the reference's InMemoryIndex cosine top-k
(texoo-core/src/main/java/de/datexis/index/InMemoryIndex.java:497-558)
with the coarse-quantizer preselection playing the role its Lucene
candidate retrieval plays for the article index
(texoo-entity-linking/.../LuceneArticleIndex.java:180-214).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

from .knn import _batch_matrix, _normalize


def _kmeans_pp_init(x: np.ndarray, k: int, rng: np.random.RandomState) -> np.ndarray:
    """k-means++ seeding (Arthur & Vassilvitskii 2007)."""
    n = x.shape[0]
    centers = np.empty((k, x.shape[1]), dtype=np.float64)
    centers[0] = x[rng.randint(n)]
    d2 = np.sum((x - centers[0]) ** 2, axis=1)
    for i in range(1, k):
        probs = d2 / max(float(d2.sum()), 1e-30)
        centers[i] = x[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, np.sum((x - centers[i]) ** 2, axis=1))
    return centers


def kmeans(
    x: np.ndarray, k: int, n_iter: int = 15, seed: int = 42
) -> np.ndarray:
    """Plain Lloyd k-means on unit-normalized vectors (spherical-ish:
    cosine assignment == euclidean on the unit sphere). Deterministic for
    a fixed seed. Empty clusters are re-seeded from the farthest points."""
    x = _normalize(np.asarray(x, dtype=np.float64))
    k = min(k, x.shape[0])
    rng = np.random.RandomState(seed)
    c = _kmeans_pp_init(x, k, rng)
    for _ in range(n_iter):
        c = _normalize(c)
        assign = np.argmax(x @ c.T, axis=1)
        new_c = np.zeros_like(c)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        np.add.at(new_c, assign, x)
        empty = counts == 0
        if empty.any():
            # re-seed dead cells from the points worst-served by their cell
            sims = (x * c[assign]).sum(axis=1)
            worst = np.argsort(sims)[: int(empty.sum())]
            new_c[empty] = x[worst]
            counts[empty] = 1.0
        c = new_c / counts[:, None]
    return _normalize(c)


def train_centroids(
    ds,
    nlist: int = 64,
    vec_col: str = "embedding",
    sample_rows: Optional[int] = None,
    n_iter: int = 15,
    seed: int = 42,
) -> np.ndarray:
    """Train the coarse quantizer on a bounded sample streamed off the
    front of the dataset (IVF needs ~tens of vectors per cell, not the
    corpus; FAISS's own guidance is 30-256 points/centroid). Only the
    vector column crosses the wire."""
    want = sample_rows if sample_rows is not None else max(4096, 100 * nlist)
    mats: List[np.ndarray] = []
    got = 0
    for b in (
        ds.select_columns([vec_col]).limit(want).iter_batches(batch_format="pyarrow")
    ):
        m = _batch_matrix(b, vec_col)
        if m.size:
            mats.append(m)
            got += m.shape[0]
        if got >= want:
            break
    if not mats:
        raise ValueError("train_centroids: empty dataset")
    sample = np.concatenate(mats, axis=0)[:want]
    return kmeans(sample, nlist, n_iter=n_iter, seed=seed)


def _probe_cells(centroids: np.ndarray, query: np.ndarray, nprobe: int) -> np.ndarray:
    qn = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]
    sims = centroids @ qn
    nprobe = min(nprobe, len(sims))
    return np.argpartition(-sims, nprobe - 1)[:nprobe]


class _IvfScorer:
    """Actor-pool stage: centroid assign + probed-cell scoring per batch.

    Centroids arrive as a broadcast object-store ref, resolved ONCE per
    actor in ``__init__`` (never re-shipped per batch)."""

    def __init__(
        self,
        centroids_ref,
        query: np.ndarray,
        k: int,
        nprobe: int,
        vec_col: str,
        id_col: str,
    ):
        import ray

        self.c = ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray) else centroids_ref
        self.qn = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        self.probed = np.zeros(self.c.shape[0], dtype=bool)
        self.probed[_probe_cells(self.c, query, nprobe)] = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.vec_col).astype(np.float64)
        if m.shape[0] == 0:
            return pa.table(
                {self.id_col: pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        mn = _normalize(m)
        assign = np.argmax(mn @ self.c.T, axis=1)
        mask = self.probed[assign]
        if not mask.any():
            return pa.table(
                {self.id_col: pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        sims = mn[mask] @ self.qn
        ids = np.asarray(batch[self.id_col], dtype=np.int64)[mask]
        keep = min(self.k, len(sims))
        idx = np.argpartition(-sims, keep - 1)[:keep]
        return pa.table(
            {self.id_col: pa.array(ids[idx]), "score": pa.array(sims[idx])}
        )


def ivf_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    nlist: int = 64,
    nprobe: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: Optional[np.ndarray] = None,
    seed: int = 42,
):
    """One-pass IVF search: train (sampled) -> broadcast centroids ->
    assign+prune+score per batch -> k-row global top-k."""
    import ray

    if centroids is None:
        centroids = train_centroids(ds, nlist=nlist, vec_col=vec_col, seed=seed)
    c_ref = ray.put(centroids)
    partial = ds.map_batches(
        _IvfScorer,
        fn_constructor_kwargs=dict(
            centroids_ref=c_ref,
            query=np.asarray(query, dtype=np.float64),
            k=k,
            nprobe=nprobe,
            vec_col=vec_col,
            id_col=id_col,
        ),
        batch_format="pyarrow",
        concurrency=2,
    )
    return partial.sort(["score", id_col], descending=[True, False]).limit(k)


def build_ivf_index(
    ds,
    out_dir: str,
    nlist: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: Optional[np.ndarray] = None,
    seed: int = 42,
) -> np.ndarray:
    """Persist the corpus as parquet hash-partitioned by IVF cell:
    ``out_dir/cell=<i>/``. A later ``search_ivf_index`` reads ONLY the
    probed cells' files — the read itself is pruned, which is what makes
    IVF pay at 100 TB. Returns the centroid matrix (also written to
    ``out_dir/centroids.npy`` so searches can run in a fresh session).
    One directory per cell keeps the layout resumable: a partial rebuild
    can skip cells whose directory already exists."""
    import ray

    if centroids is None:
        centroids = train_centroids(ds, nlist=nlist, vec_col=vec_col, seed=seed)
    c_ref = ray.put(centroids)

    class Assign:
        def __init__(self):
            self.c = ray.get(c_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(batch, vec_col).astype(np.float64))
            cell = (
                np.argmax(m @ self.c.T, axis=1).astype(np.int32)
                if m.shape[0]
                else np.zeros(0, np.int32)
            )
            return batch.append_column("cell", pa.array(cell))

    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "centroids.npy"), centroids)
    ds.map_batches(Assign, batch_format="pyarrow", concurrency=2).write_parquet(
        out_dir, partition_cols=["cell"]
    )
    return centroids


def search_ivf_index(
    index_dir: str,
    query: np.ndarray,
    k: int = 10,
    nprobe: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Search a ``build_ivf_index`` layout: load the (tiny) centroid
    matrix, pick the ``nprobe`` closest cells, and read ONLY those
    partitions. The non-probed fraction of the corpus is never read."""
    import ray

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    cells = sorted(int(c) for c in _probe_cells(centroids, query, nprobe))
    paths = []
    for c in cells:
        d = os.path.join(index_dir, f"cell={c}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
    if not paths:
        import pandas as pd

        return ray.data.from_pandas(
            pd.DataFrame({id_col: pa.array([], pa.int64()), "score": []})
        )
    ds = ray.data.read_parquet(paths, columns=[id_col, vec_col])
    qn = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]

    def score(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, vec_col).astype(np.float64))
        if m.shape[0] == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        sims = m @ qn
        ids = np.asarray(batch[id_col], dtype=np.int64)
        keep = min(k, len(sims))
        idx = np.argpartition(-sims, keep - 1)[:keep]
        return pa.table({id_col: pa.array(ids[idx]), "score": pa.array(sims[idx])})

    partial = ds.map_batches(score, batch_format="pyarrow")
    return partial.sort(["score", id_col], descending=[True, False]).limit(k)
