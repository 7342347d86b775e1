"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (the point of these implementations):

- **exact**: content-hash per batch (vectorized), then PARTIAL aggregation
  inside each batch (one row per distinct hash per batch) before the
  global ``groupby(hash)`` — the shuffle moves one row per distinct text
  per block instead of one per row.
- **minhash**: signatures are computed per batch with numpy (k permutations
  via multiply-shift over crc32 shingle hashes); LSH bands explode to
  (band, band_hash) rows; the ``groupby`` on band buckets yields candidate
  groups; clusters form by min-label propagation (no driver union-find).
- **simhash**: 64-bit signature; near-dup candidates share one of 4
  16-bit sub-bands (hamming distance <= 3 guarantee via pigeonhole).
"""

from __future__ import annotations

import hashlib
import re
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

_WORD_RE = re.compile(r"\w+", re.UNICODE)


def _join_partitions(cap: int = 16) -> int:
    """Join partition count sized to the cluster: the join's aggregator
    pool reserves ~0.0625 CPU per partition, so a fixed large count
    starves small clusters (observed hang at 4 cpus with 32 partitions).
    The default cap suits test-scale inputs; corpus-scale runs should
    raise it so each partition stays within worker memory."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(4, min(cap, cpus * 2))

# deterministic multiply-shift parameters for k minhash "permutations"
_MERSENNE = (1 << 61) - 1


def _perm_params(k: int, seed: int = 42) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=k, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=k, dtype=np.int64)
    return a, b


def shingles(text: str, n: int = 3) -> np.ndarray:
    """crc32 hashes of word n-gram shingles (lowercased)."""
    words = _WORD_RE.findall(text.lower())
    if len(words) < n:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    if not grams:
        return np.zeros(0, dtype=np.int64)
    return np.array([zlib.crc32(g.encode("utf-8")) for g in grams], dtype=np.int64)


def minhash_signature(text: str, k: int = 64, seed: int = 42) -> np.ndarray:
    """k-wide minhash signature (int64). Empty text -> all -1 sentinel."""
    sh = shingles(text)
    if sh.size == 0:
        return np.full(k, -1, dtype=np.int64)
    a, b = _PERMS.setdefault((k, seed), _perm_params(k, seed))
    # (k, S) multiply-shift in int64 with a Mersenne-prime modulus
    vals = (sh[None, :] * a[:, None] + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


_PERMS: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray]] = {}


def jaccard_ngrams(a: str, b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard similarity (candidate verification)."""
    sa, sb = set(shingles(a, n).tolist()), set(shingles(b, n).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams+bigrams."""
    words = _WORD_RE.findall(text.lower())
    feats = words + [" ".join(p) for p in zip(words, words[1:])]
    if not feats:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    for f in feats:
        h = np.uint64(
            int.from_bytes(
                hashlib.blake2b(f.encode("utf-8"), digest_size=8).digest(), "little"
            )
        )
        bits = (h >> shifts) & one
        acc += np.where(bits == one, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# --- Ray pipelines ---------------------------------------------------------


def embedding_dedup(
    ds,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    seed: int = 42,
):
    """Embedding-cosine near-dup clustering.

    Random-hyperplane LSH bucket per vector (vectorized per batch), then
    exact pairwise cosine inside each bucket (buckets are tiny: 2^n_planes
    buckets); pairs >= threshold cluster to the minimum id, finalized by a
    per-id min aggregate. Returns Dataset[(id, cluster_id)]. Near-dup
    pairs almost always agree on all hyperplane signs, so recall loss is
    the usual LSH tradeoff (raise n_planes for precision of bucketing,
    lower for recall).
    """
    from ray.data.aggregate import Min

    def bucketize(batch: pa.Table) -> pa.Table:
        col = batch[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(col.values, dtype=np.float64)
        offsets = np.asarray(col.offsets)
        dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 1
        m = flat.reshape(-1, dim)
        rng = np.random.RandomState(seed)
        planes = rng.randn(n_planes, dim)
        bits = (m @ planes.T > 0).astype(np.int64)
        sig = np.zeros(len(m), dtype=np.int64)
        for b in range(n_planes):
            sig |= bits[:, b] << b
        return pa.table(
            {
                "sig": pa.array(sig),
                id_col: batch[id_col],
                vec_col: batch[vec_col],
            }
        )

    def cluster_bucket(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col].to_pylist(), dtype=np.int64)
        vecs = np.asarray(group[vec_col].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        vn = vecs / np.maximum(norms, 1e-12)
        sims = vn @ vn.T
        labels = ids.copy()
        # min-label propagation within the bucket until fixpoint
        adj = sims >= threshold
        for _ in range(len(ids)):
            new = labels.copy()
            for i in range(len(ids)):
                new[i] = labels[adj[i]].min()
            if np.array_equal(new, labels):
                break
            labels = new
        return pa.table({id_col: pa.array(ids), "bucket_cluster": pa.array(labels)})

    buckets = ds.map_batches(bucketize, batch_format="pyarrow")
    labeled = buckets.groupby("sig").map_groups(cluster_bucket, batch_format="pyarrow")
    return labeled.groupby(id_col).aggregate(
        Min("bucket_cluster", alias_name="cluster_id")
    )


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: returns Dataset[(doc_id, dup_count)] — the surviving
    (minimum) id and group size per distinct text.

    Shape: vectorized hash + per-batch partial (min id, count) per hash ->
    groupby(hash).aggregate(Min, Sum). Equivalent SQL:
    SELECT min(doc_id) AS doc_id, count(*) AS dup_count FROM t GROUP BY text.
    """
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        agg: Dict[str, Tuple[int, int]] = {}
        for t, i in zip(texts, ids):
            h = hashlib.blake2b((t or "").encode("utf-8"), digest_size=16).hexdigest()
            if h in agg:
                mn, c = agg[h]
                agg[h] = (min(mn, i), c + 1)
            else:
                agg[h] = (i, 1)
        return pa.table(
            {
                "text_hash": list(agg.keys()),
                "min_id": pa.array([v[0] for v in agg.values()], pa.int64()),
                "cnt": pa.array([v[1] for v in agg.values()], pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min("min_id", alias_name="doc_id"), Sum("cnt", alias_name="dup_count"))
    )
    return out.select_columns(["doc_id", "dup_count"])


def minhash_bands(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
):
    """Explode each doc into (band, band_hash, doc_id) LSH bucket rows."""
    rows_per_band = k // bands

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        b_col: List[int] = []
        h_col: List[str] = []
        i_col: List[int] = []
        for t, i in zip(texts, ids):
            sig = minhash_signature(t or "", k)
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                b_col.append(b)
                h_col.append(h)
                i_col.append(i)
        return pa.table(
            {
                "band": pa.array(b_col, pa.int64()),
                "band_hash": pa.array(h_col, pa.string()),
                id_col: pa.array(i_col, pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def minhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
):
    """Near-dup clustering via MinHash LSH.

    Returns Dataset[(doc_id, cluster_id)] where cluster_id is the minimum
    doc_id reachable through shared band buckets (1-hop min-label
    propagation per bucket, then a per-doc min — catches the dominant
    duplicate-pair/group case without driver-side union-find; chains longer
    than one hop converge by re-running the propagation).

    Fully vectorized: bucket minima via groupby-aggregate, label
    propagation via a hash join on the bucket key — no per-group Python
    (millions of tiny buckets at corpus scale would make map_groups the
    bottleneck).
    """
    from ray.data.aggregate import Min

    buckets = minhash_bands(ds, text_col, id_col, k, bands)
    mins = buckets.groupby(["band", "band_hash"]).aggregate(
        Min(id_col, alias_name="bucket_min")
    )
    labeled = buckets.join(
        mins, "inner", num_partitions=_join_partitions(), on=("band", "band_hash")
    )
    return labeled.groupby(id_col).aggregate(
        Min("bucket_min", alias_name="cluster_id")
    )


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """SimHash near-dup candidates: docs sharing any 16-bit quarter of the
    64-bit signature cluster to the minimum doc_id of the bucket."""
    from ray.data.aggregate import Min

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        band_c: List[int] = []
        key_c: List[int] = []
        id_c: List[int] = []
        for t, i in zip(texts, ids):
            sig = simhash64(t or "")
            for b in range(4):
                band_c.append(b)
                key_c.append((sig >> (16 * b)) & 0xFFFF)
                id_c.append(i)
        return pa.table(
            {
                "band": pa.array(band_c, pa.int64()),
                "key": pa.array(key_c, pa.int64()),
                id_col: pa.array(id_c, pa.int64()),
            }
        )

    buckets = ds.map_batches(explode, batch_format="pyarrow")
    mins = buckets.groupby(["band", "key"]).aggregate(
        Min(id_col, alias_name="bucket_min")
    )
    labeled = buckets.join(
        mins, "inner", num_partitions=_join_partitions(), on=("band", "key")
    )
    return labeled.groupby(id_col).aggregate(
        Min("bucket_min", alias_name="cluster_id")
    )
