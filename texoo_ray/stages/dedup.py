"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine.

Scale notes (the point of these implementations):

- **exact**: content-hash per batch (vectorized), then PARTIAL aggregation
  inside each batch (one row per distinct hash per batch) before the
  global ``groupby(hash)`` — the shuffle moves one row per distinct text
  per block instead of one per row.
- **minhash**: signatures are computed per batch with numpy (k permutations
  via multiply-shift over md5-prefix shingle hashes — DuckDB-recomputable,
  so the SQL oracle mirrors signatures bit-for-bit); LSH bands explode to
  per-band signature-slice rows; bucket candidates are VERIFIED (band collisions
  alone are not duplicates) and clusters form by iterated min-label
  propagation over the verified edge set — a distributed connected
  components restricted to edge endpoints, no driver union-find.
- **simhash**: 64-bit signature; docs sharing one of 4 16-bit quarters are
  only *candidates* (pigeonhole for hamming <= 3); every candidate pair is
  verified with the full 64-bit hamming distance before clustering.
- **embedding**: hyperplane-LSH bucketing with a row-count-derived plane
  count, exact cosine inside buckets (vectorized), salted sub-split for
  overfull buckets.

All cluster ids are the minimum doc id reachable through verified
near-duplicate pairs (transitive closure via ``cluster_from_edges``).
"""

from __future__ import annotations

import hashlib
import math
import re
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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


def _gram_hash(g: str) -> int:
    """60-bit md5-prefix hash of a shingle string — exactly DuckDB's
    ``('0x' || substring(md5(g), 1, 15))::BIGINT``, so the SQL oracle can
    recompute identical shingle hashes (and therefore identical minhash
    signatures)."""
    return int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)


def shingles(text: str, n: int = 3) -> np.ndarray:
    """md5-prefix hashes of word n-gram shingles (lowercased); a doc
    shorter than ``n`` words yields one all-words shingle."""
    words = _WORD_RE.findall(text.lower())
    if len(words) < n:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    if not grams:
        return np.zeros(0, dtype=np.int64)
    return np.array([_gram_hash(g) for g in grams], dtype=np.int64)


def minhash_signature(text: str, k: int = 64, seed: int = 42) -> np.ndarray:
    """k-wide minhash signature (int64). Empty text -> all -1 sentinel."""
    return minhash_signature_batch([text], k, seed)[0]


def minhash_signature_batch(
    texts: List[str], k: int = 64, seed: int = 42
) -> np.ndarray:
    """(n, k) minhash signatures for a whole batch in ONE numpy pass.

    All docs' shingle hashes concatenate into a single array; the k
    multiply-shift permutations apply to the whole array at once and
    per-doc minima come from ``np.minimum.reduceat`` at doc boundaries —
    ~10x faster than per-doc (k, S) matrix ops (the per-call numpy
    overhead dominated). Values are IDENTICAL to the per-doc path."""
    a, b = _PERMS.setdefault((k, seed), _perm_params(k, seed))
    shs = [shingles(t or "") for t in texts]
    lens = np.array([s.size for s in shs], dtype=np.int64)
    nonempty = [s for s in shs if s.size]
    out = np.full((len(texts), k), -1, dtype=np.int64)
    if not nonempty:
        return out
    cat = np.concatenate(nonempty)
    # (k, total) multiply-shift in int64 with a Mersenne-prime modulus
    vals = (cat[None, :] * a[:, None] + b[:, None]) % _MERSENNE
    ne_lens = lens[lens > 0]
    starts = np.concatenate([[0], np.cumsum(ne_lens)[:-1]])
    mins = np.minimum.reduceat(vals, starts, axis=1)  # (k, n_nonempty)
    out[lens > 0] = mins.T
    return out


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
    # md5-prefix feature hash — exactly DuckDB's
    # ('0x' || substring(md5(f), 1, 16))::UBIGINT, so the SQL oracle can
    # recompute identical signatures
    hs = np.array(
        [int(hashlib.md5(f.encode("utf-8")).hexdigest()[:16], 16) for f in feats],
        dtype=np.uint64,
    )
    shifts = np.arange(64, dtype=np.uint64)
    bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)  # (F, 64)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _popcount_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR)."""
    x = x.astype(np.uint64)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return ((x * h01) >> np.uint64(56)).astype(np.int64)


def _band_keys(mat: np.ndarray, bands: int) -> np.ndarray:
    """(n, bands) int64 bucket keys from an (n, k) signature matrix.

    Vectorized FNV-1a fold over each band's components with a murmur-style
    finalizer — replaces a per-row/per-band blake2b call (the band key
    only needs uniform bucketing, not cryptographic strength)."""
    n, k = mat.shape
    rpb = k // bands
    u = mat.astype(np.uint64).reshape(n, bands, rpb)
    h = np.full((n, bands), 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    for j in range(rpb):
        h = (h ^ u[:, :, j]) * prime
    h ^= h >> np.uint64(33)
    h = h * np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    return h.astype(np.int64)


def _list_matrix(col, dtype=np.int64) -> np.ndarray:
    """(n, k) matrix view of a fixed-width list<...> column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.values, dtype=dtype)
    offsets = np.asarray(col.offsets)
    k = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 1
    return flat.reshape(-1, k)


# --- Ray pipelines ---------------------------------------------------------


def _norm(schema: pa.Schema):
    """Decorator: make a per-batch fn robust to Ray's hash-join emitting
    SCHEMA-LESS empty blocks for empty partitions (observed on Ray 2.49:
    a 0-column block flows through groupby/select and makes the next
    join fail with "No match ... for key field"). ``schema`` must be the
    fn's output schema; empty/columnless inputs map to a typed empty."""

    def deco(fn):
        empty = schema.empty_table()

        def wrapped(b: pa.Table) -> pa.Table:
            if b.num_columns == 0 or b.num_rows == 0:
                return empty
            return fn(b)

        return wrapped

    return deco


_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

# edge sets at or below this size are solved in one worker task (32 MB of
# int64 pairs); larger near-dup graphs take the iterative distributed path
_SMALL_EDGE_LIMIT = 2_000_000


def _compact(ds):
    """Materialize a dataset and rebuild it from its non-empty blocks.

    Ray's hash join (2.49) emits SCHEMA-LESS empty blocks for empty hash
    partitions (the aggregator's ArrowBlockBuilder receives no typed
    shards); if such a block reaches ANOTHER join's aggregator, pyarrow
    fails with "No match or multiple matches for key field". map_batches
    can't repair them (empty blocks bypass the UDF), so join->join chains
    compact in between. Only component-subset-sized intermediates
    (candidate pairs, edges, labels) pass through here — never the
    corpus. Returns None when the dataset has no rows at all."""
    import ray
    import ray.data

    mat = ds.materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
    if not refs:
        return None
    return ray.data.from_arrow_refs(refs)


def cluster_from_edges(all_ids, edges, id_col: str = "doc_id", max_iters: int = 8):
    """Distributed transitive closure: min-label propagation over a
    verified near-duplicate edge set, iterated to a fixpoint.

    ``all_ids``: Dataset[(id_col,)], one row per document.
    ``edges``: Dataset[(src, dst)] of verified pairs (any orientation).
    Returns Dataset[(id_col, cluster_id)] where cluster_id is the minimum
    id of the doc's connected component.

    Shape: propagation runs ONLY over edge endpoints (the near-dup
    component subset — tiny vs the corpus); every other doc keeps its own
    id via one final left-outer join. Each round is two hash joins plus a
    groupby-min over that subset; convergence is detected with a single
    scalar aggregate (labels only ever decrease, so an unchanged
    sum(label) is a fixpoint) — no driver-side union-find, nothing
    corpus-sized materialized.
    """
    from ray.data.aggregate import Count, Min

    edges = _compact(edges)
    if edges is None:
        return all_ids.map_batches(
            lambda b: pa.table({id_col: b[id_col], "cluster_id": b[id_col]}),
            batch_format="pyarrow",
        )

    id_schema = pa.schema([("id", pa.int64())])
    lab_schema = pa.schema([("id", pa.int64()), ("label", pa.int64())])
    out_schema = pa.schema([(id_col, pa.int64()), ("cluster_id", pa.int64())])

    n_edges = edges.count()

    if n_edges <= _SMALL_EDGE_LIMIT:
        # The verified edge set fits one worker block (2M pairs = 32 MB):
        # solve components in ONE remote task with vectorized min-label
        # relaxation, then BROADCAST the endpoint->label arrays (ray.put
        # semantics via the task's object ref — stored once, read
        # zero-copy by every map task) and attach cluster ids with a
        # shuffle-free searchsorted lookup. This replaces a repartition
        # exchange plus a corpus-wide left-outer join with a single
        # embarrassingly-parallel pass over ``all_ids``. The corpus never
        # flows through the solve, only the near-dup subgraph; duplicate
        # edges (one per shared band) are harmless.
        import ray

        @ray.remote
        def _solve(*blocks):
            s0 = np.concatenate(
                [np.asarray(b["src"], dtype=np.int64) for b in blocks]
            )
            d0 = np.concatenate(
                [np.asarray(b["dst"], dtype=np.int64) for b in blocks]
            )
            src = np.concatenate([s0, d0])  # symmetrize in place
            dst = np.concatenate([d0, s0])
            ids, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
            s_idx, d_idx = inv[: len(src)], inv[len(src) :]
            labels = ids.copy()
            while True:
                new = labels.copy()
                np.minimum.at(new, s_idx, labels[d_idx])
                if np.array_equal(new, labels):
                    break
                labels = new
            return ids, labels  # ids sorted ascending (np.unique)

        label_ref = _solve.remote(*edges.to_arrow_refs())

        @_norm(out_schema)
        def attach(b: pa.Table) -> pa.Table:
            ids_arr, lab_arr = ray.get(label_ref)
            doc = np.asarray(b[id_col], dtype=np.int64)
            if len(ids_arr) == 0:
                out_lab = doc
            else:
                idx = np.clip(np.searchsorted(ids_arr, doc), 0, len(ids_arr) - 1)
                hit = ids_arr[idx] == doc
                out_lab = np.where(hit, lab_arr[idx], doc)
            return pa.table({id_col: pa.array(doc), "cluster_id": pa.array(out_lab)})

        return all_ids.map_batches(attach, batch_format="pyarrow")
    else:
        # distributed fallback: iterative min-label message passing over
        # symmetrized edges (a single join per round sends each endpoint
        # its neighbours' labels)
        @_norm(_EDGE_SCHEMA)
        def symmetrize(b: pa.Table) -> pa.Table:
            src = b["src"].combine_chunks().cast(pa.int64())
            dst = b["dst"].combine_chunks().cast(pa.int64())
            return pa.table(
                {
                    "src": pa.concat_arrays([src, dst]),
                    "dst": pa.concat_arrays([dst, src]),
                }
            )

        sym = _compact(edges.map_batches(symmetrize, batch_format="pyarrow"))
        P = max(2, min(_join_partitions(), 1 + n_edges // 10_000))
        endpoints = (
            sym.map_batches(
                _norm(id_schema)(lambda b: pa.table({"id": b["src"]})),
                batch_format="pyarrow",
            )
            .groupby("id")
            .aggregate(Count(alias_name="_n"))
        )
        labels = _compact(
            endpoints.map_batches(
                _norm(lab_schema)(lambda b: pa.table({"id": b["id"], "label": b["id"]})),
                batch_format="pyarrow",
            )
        )

        prev_sum = None
        for _ in range(max_iters):
            mv = sym.join(labels, "inner", P, on=("dst",), right_on=("id",))
            msgs = mv.map_batches(
                _norm(lab_schema)(
                    lambda b: pa.table({"id": b["src"], "label": b["label"]})
                ),
                batch_format="pyarrow",
            )
            labels = _compact(
                labels.union(msgs)
                .groupby("id")
                .aggregate(Min("label", alias_name="label"))
            )
            s = labels.sum("label")
            if prev_sum is not None and s == prev_sum:
                break
            prev_sum = s

    out = all_ids.join(
        labels, "left_outer", _join_partitions(), on=(id_col,), right_on=("id",)
    )

    @_norm(out_schema)
    def finish(b: pa.Table) -> pa.Table:
        lab = pc.coalesce(pc.cast(b["label"], pa.int64()), b[id_col])
        return pa.table({id_col: b[id_col], "cluster_id": lab})

    return out.map_batches(finish, batch_format="pyarrow")


def embedding_dedup(
    ds,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: Optional[int] = None,
    n_rows: Optional[int] = None,
    seed: int = 42,
    max_bucket: int = 4096,
):
    """Embedding-cosine near-dup clustering.

    Random-hyperplane LSH bucket per vector (vectorized per batch), then
    exact pairwise cosine inside each bucket; pairs >= threshold cluster
    to the minimum id, finalized by a per-id min aggregate. Returns
    Dataset[(id, cluster_id)].

    ``n_planes`` defaults to the SCALE.md rule n_planes ~ log2(rows/10^3)
    (expected bucket population ~1000), derived from ``n_rows`` or
    ``ds.count()`` (metadata-only on a parquet read). Buckets that still
    exceed ``max_bucket`` rows (hot direction / skew) are deterministically
    sub-split with extra hyperplanes before the O(b^2) pairwise step, so
    per-bucket cost is bounded by max_bucket^2. In-bucket clustering is a
    vectorized masked adjacency-min iteration (no per-row Python).
    """
    from ray.data.aggregate import Min

    if n_planes is None:
        n = n_rows if n_rows is not None else ds.count()
        n_planes = int(min(24, max(8, math.ceil(math.log2(max(n, 2) / 1000.0 + 1)) + 8)))

    def bucketize(batch: pa.Table) -> pa.Table:
        m = _list_matrix(batch[vec_col], dtype=np.float64)
        rng = np.random.RandomState(seed)
        planes = rng.randn(n_planes, m.shape[1])
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

    def _minlabel(ids: np.ndarray, adj: np.ndarray) -> np.ndarray:
        labels = ids.astype(np.int64).copy()
        big = np.iinfo(np.int64).max
        while True:
            m = np.where(adj, labels[None, :], big).min(axis=1)
            new = np.minimum(labels, m)
            if np.array_equal(new, labels):
                return labels
            labels = new

    def cluster_bucket(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col], dtype=np.int64)
        vecs = _list_matrix(group[vec_col], dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        vn = vecs / np.maximum(norms, 1e-12)
        labels = ids.astype(np.int64).copy()

        def run(idx: np.ndarray) -> None:
            sub = vn[idx]
            adj = (sub @ sub.T) >= threshold
            labels[idx] = _minlabel(ids[idx], adj)

        if len(ids) > max_bucket:
            # salted sub-split: extra deterministic hyperplanes bound the
            # pairwise step at max_bucket^2 (recall tradeoff identical to
            # raising n_planes, but applied only to the hot bucket)
            k_extra = int(math.ceil(math.log2(len(ids) / max_bucket))) + 1
            rng = np.random.RandomState(seed + 1)
            planes = rng.randn(k_extra, vecs.shape[1])
            bits = (vecs @ planes.T > 0).astype(np.int64)
            sub_sig = np.zeros(len(ids), dtype=np.int64)
            for b in range(k_extra):
                sub_sig |= bits[:, b] << b
            for s in np.unique(sub_sig):
                run(np.nonzero(sub_sig == s)[0])
        else:
            run(np.arange(len(ids)))
        return pa.table({id_col: pa.array(ids), "bucket_cluster": pa.array(labels)})

    buckets = ds.map_batches(bucketize, batch_format="pyarrow")
    labeled = buckets.groupby("sig").map_groups(cluster_bucket, batch_format="pyarrow")
    return labeled.groupby(id_col).aggregate(
        Min("bucket_cluster", alias_name="cluster_id")
    )


def semantic_dedup(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    threshold: float = 0.9,
    scale_bits: int = 20,
    max_cluster: int = 4096,
):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): k-means-cluster the
    embedding space, then deduplicate WITHIN each cluster by cosine
    similarity — the cluster pass turns the quadratic all-pairs problem
    into per-cluster work, exactly the paper's trick for web scale.

    Clusters come from one exact Lloyd step (:func:`~.knn.label_centroids`
    -> :func:`~.knn.kmeans_assign`, both int64-quantized so the
    assignment is bit-reproducible across block layouts and in SQL),
    seeded by the ``label_col`` classes — the deterministic stand-in for
    the paper's random-init k-means. Within a cluster, pairs with cosine
    >= ``threshold`` connect; each connected component keeps its minimum
    id as representative. Returns
    Dataset[(id, assigned_label, rep_id)] — ``rep_id == id`` marks the
    kept row, the per-component dedup decision downstream filters on.

    Scale shape: centroids are a KB-sized broadcast; the only
    corpus-sized exchange is the ``groupby(assigned_label)``; in-cluster
    work is one vectorized normalized matmul + masked adjacency-min
    iteration (same primitive as :func:`embedding_dedup`). Oversized
    clusters (> ``max_cluster``) are deterministically sub-split with
    seeded hyperplanes before the O(c^2) step, bounding per-group cost —
    at real scale pick k ~ sqrt(corpus) as the paper does so clusters
    stay small.
    """
    from .knn import kmeans_assign, label_centroids

    cent = pa.Table.from_pylist(
        label_centroids(
            ds, label_col=label_col, vec_col=vec_col, scale_bits=scale_bits
        ).take_all()
    )
    assigned = kmeans_assign(
        ds, cent, vec_col=vec_col, id_col=id_col, scale_bits=scale_bits,
        keep_vec=True,
    )

    def _minlabel(ids: np.ndarray, adj: np.ndarray) -> np.ndarray:
        labels = ids.astype(np.int64).copy()
        big = np.iinfo(np.int64).max
        while True:
            m = np.where(adj, labels[None, :], big).min(axis=1)
            new = np.minimum(labels, m)
            if np.array_equal(new, labels):
                return labels
            labels = new

    def dedup_cluster(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col], dtype=np.int64)
        vecs = _list_matrix(group[vec_col], dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        vn = vecs / np.maximum(norms, 1e-12)
        labels = ids.astype(np.int64).copy()

        def run(idx: np.ndarray) -> None:
            sub = vn[idx]
            adj = (sub @ sub.T) >= threshold
            labels[idx] = _minlabel(ids[idx], adj)

        if len(ids) > max_cluster:
            k_extra = int(math.ceil(math.log2(len(ids) / max_cluster))) + 1
            rng = np.random.RandomState(7)
            planes = rng.randn(k_extra, vecs.shape[1])
            bits = (vecs @ planes.T > 0).astype(np.int64)
            sub_sig = np.zeros(len(ids), dtype=np.int64)
            for b in range(k_extra):
                sub_sig |= bits[:, b] << b
            for s in np.unique(sub_sig):
                run(np.nonzero(sub_sig == s)[0])
        else:
            run(np.arange(len(ids)))
        lab = np.asarray(group["assigned_label"], dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids),
                "assigned_label": pa.array(lab),
                "rep_id": pa.array(labels),
            }
        )

    return assigned.groupby("assigned_label").map_groups(
        dedup_cluster, batch_format="pyarrow"
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


def minhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id", k: int = 64):
    """Dataset[(id, sig: binary of k*8 bytes)] — one signature per doc.

    Binary (not list<int64>) so signatures can ride through hash joins as
    payload columns (Arrow's acero join rejects nested types) and shuffle
    without offset overhead; decode with ``_sig_matrix``."""

    def stage(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        mat = np.ascontiguousarray(minhash_signature_batch(texts, k))
        buf = mat.tobytes()
        w = k * 8
        sigs = [buf[i * w : (i + 1) * w] for i in range(len(texts))]
        return pa.table(
            {id_col: batch[id_col], "sig": pa.array(sigs, pa.binary())}
        )

    return ds.map_batches(stage, batch_format="pyarrow")


def _sig_matrix(col, k: int) -> np.ndarray:
    """(n, k) int64 matrix from a binary signature column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    buf = b"".join(col.to_pylist())
    return np.frombuffer(buf, dtype=np.int64).reshape(-1, k)


def minhash_bands(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
):
    """Explode each doc into (band, band_hash, doc_id) LSH bucket rows."""
    sigs = minhash_signatures(ds, text_col, id_col, k)
    return _bands_from_signatures(sigs, id_col, k, bands)


def _bands_from_signatures(sigs, id_col: str, k: int, bands: int):
    assert k % bands == 0

    def explode(batch: pa.Table) -> pa.Table:
        mat = _sig_matrix(batch["sig"], k)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        n = mat.shape[0]
        keys = _band_keys(mat, bands)  # (n, bands)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int64), n)),
                "band_hash": pa.array(keys.reshape(-1)),
                id_col: pa.array(np.repeat(ids, bands)),
            }
        )

    return sigs.map_batches(explode, batch_format="pyarrow")


def minhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    verify: str = "signature",
    max_iters: int = 8,
):
    """Near-dup clustering via MinHash LSH with candidate verification.

    Returns Dataset[(doc_id, cluster_id)]; cluster_id is the minimum
    doc_id of the doc's verified near-duplicate component (full transitive
    closure via ``cluster_from_edges`` — multi-hop chains converge).

    Band-bucket collisions only *generate candidates*; every candidate
    pair (doc, bucket-min rep) is verified before clustering:

    - ``verify="signature"`` (default): estimated Jaccard = fraction of
      equal minhash components between the two signatures (64 components
      -> stderr ~0.06); pairs below ``threshold`` are dropped. The whole
      candidate step is ONE ``groupby(band, band_hash).map_groups`` —
      each bucket group holds its members' (id, binary sig) rows, so the
      min-id rep is picked and every member verified against it inside
      the group, emitting verified edges directly. No hash join, no
      rep-signature carry; the band shuffle moves ~0.5 KB/doc/band.
    - ``verify="exact"``: joins the raw texts back and filters by
      ``jaccard_ngrams`` >= threshold. Two full-text shuffles; meant for
      high-precision runs on smaller corpora.

    Duplicate (doc, rep) pairs across bands are NOT pre-deduped: min-label
    propagation is idempotent over repeated edges and an extra groupby
    costs more than the redundant (vectorized) verification.
    """
    from ray.data.aggregate import Count, Min

    P = _join_partitions()
    assert k % bands == 0
    sigs = minhash_signatures(ds, text_col, id_col, k)
    all_ids = ds.select_columns([id_col])

    if verify == "exact":
        pair_schema = pa.schema([(id_col, pa.int64()), ("bucket_min", pa.int64())])
        bands_ds = _bands_from_signatures(sigs, id_col, k, bands)
        mins = (
            bands_ds.groupby(["band", "band_hash"])
            .aggregate(
                Min(id_col, alias_name="bucket_min"), Count(alias_name="bucket_n")
            )
            .map_batches(
                lambda b: b.filter(pc.greater(b["bucket_n"], 1)),
                batch_format="pyarrow",
            )
        )
        cand = bands_ds.join(mins, "inner", P, on=("band", "band_hash"))
        cand = cand.map_batches(
            _norm(pair_schema)(
                lambda b: pa.table(
                    {id_col: b[id_col], "bucket_min": b["bucket_min"]}
                ).filter(pc.not_equal(b[id_col], b["bucket_min"]))
            ),
            batch_format="pyarrow",
        )
        cand = _compact(cand)
        if cand is None:
            import ray.data

            return cluster_from_edges(
                all_ids,
                ray.data.from_arrow(_EDGE_SCHEMA.empty_table()),
                id_col,
                max_iters,
            )
        texts = ds.select_columns([id_col, text_col])
        t1 = texts.map_batches(
            lambda b: pa.table({id_col: b[id_col], "_text_src": b[text_col]}),
            batch_format="pyarrow",
        )
        t2 = texts.map_batches(
            lambda b: pa.table({"_id2": b[id_col], "_text_dst": b[text_col]}),
            batch_format="pyarrow",
        )
        e = cand.join(t1, "inner", P, on=(id_col,))
        e = _compact(e)
        if e is None:
            import ray.data

            return cluster_from_edges(
                all_ids,
                ray.data.from_arrow(_EDGE_SCHEMA.empty_table()),
                id_col,
                max_iters,
            )
        e = e.join(t2, "inner", P, on=("bucket_min",), right_on=("_id2",))

        @_norm(_EDGE_SCHEMA)
        def check_exact(b: pa.Table) -> pa.Table:
            # shingle each DISTINCT text once per batch (texts repeat
            # across candidate pairs — the src side especially); the
            # per-pair work is then two C-level set ops
            cache: dict = {}

            def sset(s):
                s = s or ""
                v = cache.get(s)
                if v is None:
                    v = frozenset(shingles(s, 3).tolist())
                    cache[s] = v
                return v

            keep = []
            for s, d in zip(
                b["_text_src"].to_pylist(), b["_text_dst"].to_pylist()
            ):
                sa, sb = sset(s), sset(d)
                if not sa and not sb:
                    keep.append(True)
                elif not sa or not sb:
                    keep.append(False)
                else:
                    inter = len(sa & sb)
                    keep.append(
                        inter / (len(sa) + len(sb) - inter) >= threshold
                    )
            t = b.filter(pa.array(keep, pa.bool_()))
            return pa.table({"src": t[id_col], "dst": t["bucket_min"]})

        edges = e.map_batches(check_exact, batch_format="pyarrow")
        return cluster_from_edges(all_ids, edges, id_col, max_iters)

    # signature mode: one groupby(map_groups) emits verified edges directly.
    # Buckets key on the band's EXACT signature slice (r columns), not a
    # derived band hash — no spurious bucket merges from 64-bit band-hash
    # collisions, and the SQL oracle groups on the identical tuple.
    r = k // bands

    def explode(batch: pa.Table) -> pa.Table:
        mat = _sig_matrix(batch["sig"], k)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        n = mat.shape[0]
        cols = {
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int64), n)),
        }
        # slice component j of band b for doc d = mat[d, b*r + j]
        sl = mat.reshape(n, bands, r)
        for j in range(r):
            cols["v%d" % j] = pa.array(sl[:, :, j].reshape(-1))
        cols[id_col] = pa.array(np.repeat(ids, bands))
        cols["sig"] = batch["sig"].take(pa.array(np.repeat(np.arange(n), bands)))
        return pa.table(cols)

    buckets = sigs.map_batches(explode, batch_format="pyarrow")

    def bucket_edges(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col], dtype=np.int64)
        if len(ids) < 2:
            return _EDGE_SCHEMA.empty_table()
        sig = _sig_matrix(group["sig"], k)
        r = int(np.argmin(ids))
        est = (sig == sig[r]).mean(axis=1)
        keep = est >= threshold
        keep[r] = False
        src = ids[keep]
        return pa.table(
            {"src": pa.array(src), "dst": pa.array(np.full(len(src), ids[r]))}
        )

    edges = buckets.groupby(["band"] + ["v%d" % j for j in range(r)]).map_groups(
        bucket_edges, batch_format="pyarrow"
    )
    return cluster_from_edges(all_ids, edges, id_col, max_iters)


def ngram_jaccard_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    df_cap: int = 128,
    max_iters: int = 8,
):
    """EXACT word n-gram Jaccard near-dup clustering (no sketching).

    Unlike :func:`minhash_dedup` (estimated Jaccard) this computes the
    true set Jaccard ``|A∩B| / |A∪B|`` over distinct word n-gram shingles
    via an inverted index, so results are deterministic and
    SQL-checkable. Returns Dataset[(id, cluster_id)] with cluster_id the
    minimum id of the doc's connected component (full transitive closure
    via :func:`cluster_from_edges`).

    Shape (all stages corpus-streaming; only candidate-pair-sized
    intermediates materialize):

    1. per batch: DISTINCT shingle strings per doc -> (sh, id) rows.
       Shingling mirrors :func:`shingles` (lowercase ``\\w+`` words; docs
       with < n words contribute their single joined gram). Keys stay
       STRINGS for bit-exact oracle parity; at corpus scale hash them to
       int64 first to cut shuffle bytes (documented trade: a 64-bit hash
       collision could merge two shingles).
    2. ``groupby(sh).map_groups``: posting lists with df > ``df_cap``
       are dropped ENTIRELY (stop-shingles: near-zero discrimination,
       quadratic pair cost — the standard df-cut); each surviving list
       emits all member pairs (lo < hi) plus one (id, id) self row per
       member, so one downstream count yields both intersection sizes
       and per-doc surviving-shingle counts. Per-bucket pair emission is
       bounded by df_cap^2/2.
    3. ``groupby(lo, hi).count``: c for pairs, n_sh for self rows.
    4. two candidate-set-sized hash joins attach n_a/n_b; keep pairs
       with ``c / (n_a + n_b - c) >= threshold``. Jaccard is exact over
       the df<=cap shingle universe (identical filter on both sides of
       the oracle; exact, full stop, when no shingle exceeds the cap).
    5. :func:`cluster_from_edges` min-label fixpoint.

    Reference parity: TeXoo has no LSH family; this implements the
    "n-gram Jaccard" near-dup variant of the large-scale curation brief
    with the same shingle definition as ``jaccard_ngrams``
    (verification primitive above).
    """
    from ray.data.aggregate import Count

    P = _join_partitions()
    all_ids = ds.select_columns([id_col])

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        out_sh: List[str] = []
        out_id: List[int] = []
        for i, t in zip(ids, batch[text_col].to_pylist()):
            words = _WORD_RE.findall((t or "").lower())
            if len(words) < n:
                grams = {" ".join(words)} if words else set()
            else:
                grams = {
                    " ".join(words[j : j + n]) for j in range(len(words) - n + 1)
                }
            out_sh.extend(grams)
            out_id.extend([int(i)] * len(grams))
        return pa.table(
            {"sh": pa.array(out_sh, pa.string()), id_col: pa.array(out_id, pa.int64())}
        )

    # One map_groups call PER SHINGLE is a per-group-overhead disaster
    # (tens of thousands of tiny pandas/Arrow group tables); instead
    # shingles are bucketed by a stable hash so each map_groups call
    # processes a whole bucket of complete posting lists with vectorized
    # numpy group logic (measured 17.5s -> ~2s on the sf0.01 gate).
    n_buckets = 128

    def add_bucket(batch: pa.Table) -> pa.Table:
        import zlib

        sh = batch["sh"]
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        d = sh.dictionary_encode()
        codes = np.asarray(d.indices, dtype=np.int64)
        vb = np.array(
            [zlib.crc32(v.encode("utf-8")) % n_buckets for v in d.dictionary.to_pylist()],
            dtype=np.int64,
        )
        return batch.append_column("bucket", pa.array(vb[codes], pa.int64()))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        # complete posting lists for every shingle hashed to this bucket;
        # (sh, id) rows are distinct by construction (per-doc gram sets)
        ids = np.asarray(group[id_col], dtype=np.int64)
        sh = group["sh"]
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        codes = np.asarray(sh.dictionary_encode().indices, dtype=np.int64)
        order = np.argsort(codes, kind="stable")
        codes_s, ids_s = codes[order], ids[order]
        _, starts, counts = np.unique(codes_s, return_index=True, return_counts=True)
        keep = counts <= df_cap
        lo = [ids_s[np.repeat(keep, counts)]]  # self rows per kept member
        hi = [lo[0]]
        for s in np.unique(counts[keep & (counts >= 2)]):
            g = starts[keep & (counts == s)]
            m = ids_s[g[:, None] + np.arange(s)[None, :]]
            iu, ju = np.triu_indices(s, k=1)
            a, b = m[:, iu].ravel(), m[:, ju].ravel()
            lo.append(np.minimum(a, b))
            hi.append(np.maximum(a, b))
        return pa.table(
            {"lo": pa.array(np.concatenate(lo)), "hi": pa.array(np.concatenate(hi))}
        )

    counted = _compact(
        ds.map_batches(shingle_rows, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="c"))
    )
    if counted is None:
        import ray.data

        return cluster_from_edges(
            all_ids, ray.data.from_arrow(_EDGE_SCHEMA.empty_table()), id_col, max_iters
        )

    na_schema = pa.schema([("nid", pa.int64()), ("n_sh", pa.int64())])
    selfs = counted.map_batches(
        _norm(na_schema)(
            lambda b: pa.table(
                {"nid": b["lo"], "n_sh": pc.cast(b["c"], pa.int64())}
            ).filter(pc.equal(b["lo"], b["hi"]))
        ),
        batch_format="pyarrow",
    )
    cand_schema = pa.schema(
        [("lo", pa.int64()), ("hi", pa.int64()), ("c", pa.int64())]
    )
    cand = counted.map_batches(
        _norm(cand_schema)(
            lambda b: pa.table(
                {"lo": b["lo"], "hi": b["hi"], "c": pc.cast(b["c"], pa.int64())}
            ).filter(pc.less(b["lo"], b["hi"]))
        ),
        batch_format="pyarrow",
    )
    cand = _compact(cand)
    if cand is None:
        import ray.data

        return cluster_from_edges(
            all_ids, ray.data.from_arrow(_EDGE_SCHEMA.empty_table()), id_col, max_iters
        )
    selfs = _compact(selfs)
    j1 = _compact(cand.join(selfs, "inner", P, on=("lo",), right_on=("nid",)))
    if j1 is None:
        import ray.data

        return cluster_from_edges(
            all_ids, ray.data.from_arrow(_EDGE_SCHEMA.empty_table()), id_col, max_iters
        )
    j1 = j1.map_batches(
        _norm(
            pa.schema(
                [
                    ("lo", pa.int64()),
                    ("hi", pa.int64()),
                    ("c", pa.int64()),
                    ("n_a", pa.int64()),
                ]
            )
        )(
            lambda b: pa.table(
                {"lo": b["lo"], "hi": b["hi"], "c": b["c"], "n_a": b["n_sh"]}
            )
        ),
        batch_format="pyarrow",
    )
    j2 = _compact(j1.join(selfs, "inner", P, on=("hi",), right_on=("nid",)))
    if j2 is None:
        import ray.data

        return cluster_from_edges(
            all_ids, ray.data.from_arrow(_EDGE_SCHEMA.empty_table()), id_col, max_iters
        )

    @_norm(_EDGE_SCHEMA)
    def check(b: pa.Table) -> pa.Table:
        c = np.asarray(b["c"], dtype=np.float64)
        n_a = np.asarray(b["n_a"], dtype=np.int64)
        n_b = np.asarray(b["n_sh"], dtype=np.int64)
        jac = c / (n_a + n_b - c.astype(np.int64)).astype(np.float64)
        t = b.filter(pa.array(jac >= threshold))
        return pa.table({"src": t["lo"], "dst": t["hi"]})

    edges = j2.map_batches(check, batch_format="pyarrow")
    return cluster_from_edges(all_ids, edges, id_col, max_iters)


def _flat_gram_rows(
    batch: pa.Table,
    text_col: str,
    id_col: str,
    n: int,
    distinct_per_doc: bool,
    n_buckets: int,
) -> pa.Table:
    """(id, gh, gl, bucket) rows — one per word-``n``-gram occurrence
    (stride 1, windows masked at document boundaries), or one per
    distinct (doc, gram) when ``distinct_per_doc``. Fully vectorized:
    the 128-bit gram fingerprints come from text_stats._gram_hashes
    (column-at-a-time FNV over per-word hashes), per-doc distinctness is
    one lexsort + neighbor mask, and ``bucket = gh % n_buckets`` keys
    the downstream exchange so map_groups handles whole buckets of
    complete gram groups instead of one call per gram."""
    from .text_stats import _gram_hashes

    ids = np.asarray(batch[id_col], dtype=np.int64)
    doc_of, gh, gl = _gram_hashes(batch[text_col], n)
    if distinct_per_doc and len(gh):
        order = np.lexsort((gl, gh, doc_of))
        d, h, lw = doc_of[order], gh[order], gl[order]
        keep = np.ones(len(d), bool)
        keep[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1]) | (lw[1:] != lw[:-1])
        doc_of, gh, gl = d[keep], h[keep], lw[keep]
    return pa.table(
        {
            id_col: pa.array(ids[doc_of], pa.int64()),
            "gh": pa.array(gh, pa.uint64()),
            "gl": pa.array(gl, pa.uint64()),
            "bucket": pa.array(
                (gh % np.uint64(n_buckets)).astype(np.int64), pa.int64()
            ),
        }
    )


def substring_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    n_buckets: int = 128,
):
    """Duplicated-substring detection (the word-n-gram form of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): for every document, count how many of its stride-1 word
    ``n``-grams also occur in at least one OTHER document. Returns
    Dataset[(id, n_grams, n_dup_grams)] over docs with >= ``n`` words —
    the per-doc duplicated-span budget a curation pass thresholds on
    (Lee et al. remove spans; the count is the decision input and is
    exactly SQL-checkable, span surgery is a trivial row-local follow-up).

    Scale shape: stage 1 is a stateless vectorized flatten (one row per
    gram occurrence, 128-bit fingerprint instead of the gram string —
    shuffle bytes independent of ``n``; a fingerprint collision could
    miscount, odds ~ (total grams)^2 / 2^128); the single corpus-sized
    exchange is the ``groupby(bucket)`` over ``gh % n_buckets`` whose
    map_groups marks multi-doc grams with one lexsort + segmented
    first/last compare per bucket (no Python loop over grams); the final
    per-doc Count/Sum aggregates combine per block before their tiny
    exchange. No stage materializes the corpus.

    Reference parity: TeXoo has no corpus-level dedup (SURVEY §2.9);
    this extends the curation family (exact/minhash/simhash/jaccard
    above) to sub-document granularity.
    """
    from ray.data.aggregate import Count, Sum

    def gram_rows(batch: pa.Table) -> pa.Table:
        return _flat_gram_rows(batch, text_col, id_col, n, False, n_buckets)

    def bucket_flags(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col], dtype=np.int64)
        gh = np.asarray(group["gh"])
        gl = np.asarray(group["gl"])
        order = np.lexsort((ids, gl, gh))
        h, lw, i = gh[order], gl[order], ids[order]
        new = np.ones(len(h), bool)
        new[1:] = (h[1:] != h[:-1]) | (lw[1:] != lw[:-1])
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(i)]]) - 1
        multi = i[ends] != i[starts]  # ids sorted within segment
        return pa.table(
            {
                id_col: pa.array(i, pa.int64()),
                "is_dup": pa.array(multi[seg].astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(gram_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_flags, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(
            Count(alias_name="n_grams"), Sum("is_dup", alias_name="n_dup_grams")
        )
    )


def substring_clean(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    n_buckets: int = 128,
):
    """The span REMOVAL half of Lee et al. 2022: drop every word covered
    by a word ``n``-gram that also occurs in another document, and emit
    the surviving text. Returns Dataset[(id, n_words, n_dropped,
    clean_text)] over docs with >= ``n`` words; ``clean_text`` is the
    surviving normalized words joined by single spaces (the dedup
    family's lowercase ``\\w+`` canonical form — offset-exact surgery on
    the raw bytes is a row-local variant over the same positions).

    Shape: the same bucketed gram exchange as :func:`substring_dedup`,
    but dup occurrences keep their START POSITION; per-doc positions
    collect through a mergeable list AggregateFn (bounded by words per
    doc), and one left-outer hash join brings them back to the text for
    a row-local rebuild — two exchanges plus one join, none
    corpus-materializing.
    """
    from ray.data.aggregate import AggregateFn

    from .text_stats import _doc_word_codes, _gram_hashes

    def gram_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        doc_of, gh, gl, pos = _gram_hashes(batch[text_col], n, with_pos=True)
        return pa.table(
            {
                id_col: pa.array(ids[doc_of], pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "gh": pa.array(gh, pa.uint64()),
                "gl": pa.array(gl, pa.uint64()),
                "bucket": pa.array(
                    (gh % np.uint64(n_buckets)).astype(np.int64), pa.int64()
                ),
            }
        )

    def bucket_dup_pos(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col], dtype=np.int64)
        pos = np.asarray(group["pos"], dtype=np.int64)
        gh = np.asarray(group["gh"])
        gl = np.asarray(group["gl"])
        order = np.lexsort((ids, gl, gh))
        h, lw, i, p = gh[order], gl[order], ids[order], pos[order]
        new = np.ones(len(h), bool)
        new[1:] = (h[1:] != h[:-1]) | (lw[1:] != lw[:-1])
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(i)]]) - 1
        keep = (i[ends] != i[starts])[seg]
        return pa.table(
            {
                id_col: pa.array(i[keep], pa.int64()),
                "pos": pa.array(p[keep], pa.int64()),
            }
        )

    # finalize to a comma-joined string: Acero hash joins reject list
    # columns as non-key payload, and the per-doc list is bounded by
    # words-per-doc so the string stays row-sized.
    collect = AggregateFn(
        init=lambda _: [],
        merge=lambda a, b: a + b,
        accumulate_block=lambda a, blk: a
        + np.asarray(blk["pos"], np.int64).tolist(),
        finalize=lambda a: ",".join(map(str, sorted(a))),
        name="dup_pos",
    )
    # _compact: the groupby emits schema-less empty blocks for empty
    # hash partitions (Ray 2.49) that break the downstream join; dup_pos
    # is one (id, positions-string) row per dup-containing doc, far
    # smaller than the corpus.
    dup_pos = _compact(
        ds.map_batches(gram_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_dup_pos, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(collect)
    )
    if dup_pos is None:
        joined = ds.map_batches(
            lambda b: b.append_column(
                "dup_pos", pa.nulls(b.num_rows, pa.string())
            ),
            batch_format="pyarrow",
        )
    else:
        joined = ds.join(
            dup_pos, "left_outer", _join_partitions(), on=(id_col,)
        )

    def rebuild(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            return pa.schema(
                [
                    (id_col, pa.int64()),
                    ("n_words", pa.int64()),
                    ("n_dropped", pa.int64()),
                    ("clean_text", pa.string()),
                ]
            ).empty_table()
        doc_of, codes, dictionary = _doc_word_codes(batch[text_col])
        words = np.asarray(dictionary.to_pylist(), dtype=object)[codes]
        starts = np.searchsorted(doc_of, np.arange(batch.num_rows), "left")
        ends = np.searchsorted(doc_of, np.arange(batch.num_rows), "right")
        out = {id_col: [], "n_words": [], "n_dropped": [], "clean_text": []}
        dup_lists = batch["dup_pos"].to_pylist()
        ids = np.asarray(batch[id_col], dtype=np.int64)
        for r in range(batch.num_rows):
            w = words[starts[r] : ends[r]]
            if len(w) < n:
                continue
            covered = np.zeros(len(w), bool)
            if dup_lists[r]:
                for p in dup_lists[r].split(","):
                    p = int(p)
                    covered[p : p + n] = True
            out[id_col].append(int(ids[r]))
            out["n_words"].append(len(w))
            out["n_dropped"].append(int(covered.sum()))
            out["clean_text"].append(" ".join(w[~covered]))
        return pa.table(
            {
                id_col: pa.array(out[id_col], pa.int64()),
                "n_words": pa.array(out["n_words"], pa.int64()),
                "n_dropped": pa.array(out["n_dropped"], pa.int64()),
                "clean_text": pa.array(out["clean_text"], pa.string()),
            }
        )

    return joined.map_batches(rebuild, batch_format="pyarrow")


def ngram_novelty(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_buckets: int = 128,
):
    """Per-document n-gram novelty: the share of a document's DISTINCT
    word ``n``-grams whose corpus-wide first occurrence (minimum doc id
    — the deterministic stand-in for arrival order) is this document.
    Returns Dataset[(id, n_distinct_grams, n_novel_grams)] over docs
    with >= ``n`` words; novelty ratio = novel/distinct is a row-local
    division the caller applies (kept as exact integers so the oracle
    hash never sees a float).

    The curation use is incremental-crawl triage: low-novelty documents
    add little text not already owned by earlier documents. Same scale
    shape as :func:`substring_dedup` (one bucketed gram exchange, one
    tiny per-doc aggregate), with per-doc distinctness pushed into the
    stateless flatten so the exchange moves one row per distinct
    (doc, gram).
    """
    from ray.data.aggregate import Count, Sum

    def gram_rows(batch: pa.Table) -> pa.Table:
        return _flat_gram_rows(batch, text_col, id_col, n, True, n_buckets)

    def bucket_first(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col], dtype=np.int64)
        gh = np.asarray(group["gh"])
        gl = np.asarray(group["gl"])
        order = np.lexsort((ids, gl, gh))
        h, lw, i = gh[order], gl[order], ids[order]
        new = np.ones(len(h), bool)
        new[1:] = (h[1:] != h[:-1]) | (lw[1:] != lw[:-1])
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        is_first = i == i[starts][seg]  # min id per segment (sorted)
        return pa.table(
            {
                id_col: pa.array(i, pa.int64()),
                "is_first": pa.array(is_first.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(gram_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_first, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(
            Count(alias_name="n_distinct_grams"),
            Sum("is_first", alias_name="n_novel_grams"),
        )
    )


def simhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_iters: int = 8,
):
    """SimHash near-dup clustering with full-signature verification.

    Docs sharing a 16-bit quarter of the 64-bit signature are *candidates*
    (pigeonhole guarantees any pair with hamming <= 3 shares a quarter);
    each candidate pair is verified by the full 64-bit hamming distance
    (vectorized SWAR popcount) before entering the edge set, so unrelated
    bucket collisions — inevitable at >10^6 docs with 65,536 buckets per
    band — never merge clusters. Transitive closure via
    ``cluster_from_edges``.

    The whole candidate+verify step is one ``groupby(band, key).map_groups``:
    each quarter bucket verifies its members against the min-id rep with a
    vectorized popcount and emits verified edges directly — no hash join.
    """

    def sig_stage(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        sigs = np.array(
            [np.uint64(simhash64(t or "")) for t in texts], dtype=np.uint64
        ).astype(np.int64)
        return pa.table({id_col: batch[id_col], "sig": pa.array(sigs)})

    sigs = ds.map_batches(sig_stage, batch_format="pyarrow")
    all_ids = ds.select_columns([id_col])
    return hamming_cluster_64(sigs, all_ids, id_col, max_hamming, max_iters)


def hamming_cluster_64(
    sigs,
    all_ids,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_iters: int = 8,
):
    """Cluster rows whose 64-bit signatures are within ``max_hamming``
    (<= 3 for the pigeonhole guarantee): the banded candidate + full
    popcount verify + min-label closure shared by :func:`simhash_dedup`
    and the image dHash dedup (stages/multimodal.py). ``sigs`` is
    Dataset[(id_col, sig int64)]; ``all_ids`` the id universe. Returns
    Dataset[(id_col, cluster_id)]."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        sig = np.asarray(batch["sig"], dtype=np.int64)
        usig = sig.astype(np.uint64)
        n = len(ids)
        band_c = np.repeat(np.arange(4, dtype=np.int64), n)
        id_c = np.tile(ids, 4)
        sig_c = np.tile(sig, 4)
        key_c = np.concatenate(
            [((usig >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64) for b in range(4)]
        )
        return pa.table(
            {
                "band": pa.array(band_c),
                "key": pa.array(key_c),
                id_col: pa.array(id_c),
                "sig": pa.array(sig_c),
            }
        )

    buckets = sigs.map_batches(explode, batch_format="pyarrow")

    def bucket_edges(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col], dtype=np.int64)
        if len(ids) < 2:
            return _EDGE_SCHEMA.empty_table()
        sig = np.asarray(group["sig"], dtype=np.int64).astype(np.uint64)
        r = int(np.argmin(ids))
        ham = _popcount_u64(sig ^ sig[r])
        keep = ham <= max_hamming
        keep[r] = False
        src = ids[keep]
        return pa.table(
            {"src": pa.array(src), "dst": pa.array(np.full(len(src), ids[r]))}
        )

    # duplicate edges across bands are harmless for min-label propagation
    edges = buckets.groupby(["band", "key"]).map_groups(
        bucket_edges, batch_format="pyarrow"
    )
    return cluster_from_edges(all_ids, edges, id_col, max_iters)


def duplicated_lines(ds, text_col: str = "text", min_count: int = 31):
    """Corpus-wide heavy-hitter lines: Dataset[(line, cnt)] for every
    exact line (``\\n``-split, no normalization) occurring at least
    ``min_count`` times across the corpus.

    Shape: per-batch partial Counter (one row per distinct line per
    block) -> ``groupby(line).sum`` -> filter. The result is bounded by
    total_lines / min_count rows — a heavy-hitter set is SMALL by
    definition, which is what makes the broadcast in ``line_dedup``
    scale-safe."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: Dict[str, int] = {}
        for t in batch[text_col].to_pylist():
            for ln in (t or "").split("\n"):
                counts[ln] = counts.get(ln, 0) + 1
        return pa.table(
            {
                "line": pa.array(list(counts.keys()), pa.string()),
                "cnt": pa.array(list(counts.values()), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("line")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return agg.filter(expr="cnt >= %d" % int(min_count))


def intra_doc_line_dedup(ds, text_col: str = "text", keep_cols: Optional[List[str]] = None):
    """Order-preserving keep-first removal of lines repeated WITHIN each
    document (Gopher-style repetition cleanup, complementary to the
    corpus-wide ``line_dedup``): purely row-local, zero shuffle.

    Returns Dataset[keep_cols + (clean_text, n_kept, n_removed)]."""
    keep_cols = list(keep_cols or ["doc_id"])

    def strip(batch: pa.Table) -> pa.Table:
        cleans, kept, removed = [], [], []
        for t in batch[text_col].to_pylist():
            lines = (t or "").split("\n")
            seen = set()
            keep = []
            for ln in lines:
                if ln not in seen:
                    seen.add(ln)
                    keep.append(ln)
            cleans.append("\n".join(keep))
            kept.append(len(keep))
            removed.append(len(lines) - len(keep))
        cols = {c: batch[c] for c in keep_cols}
        cols["clean_text"] = pa.array(cleans, pa.string())
        cols["n_kept"] = pa.array(kept, pa.int64())
        cols["n_removed"] = pa.array(removed, pa.int64())
        return pa.table(cols)

    return ds.map_batches(strip, batch_format="pyarrow")


def line_dedup(
    ds,
    max_occurrences: int = 30,
    text_col: str = "text",
    keep_cols: Optional[List[str]] = None,
):
    """CCNet-style duplicated-line removal (Wenzek et al., LREC 2020
    §3.1: drop lines repeated across a shard — boilerplate navigation,
    cookie banners, "Key points follow:"-style templates).

    A line is removed when its EXACT text occurs more than
    ``max_occurrences`` times corpus-wide. Two passes, zero corpus
    shuffle:

    1. ``duplicated_lines`` builds the heavy-hitter set (bounded by
       total_lines / max_occurrences rows) which is collected once and
       broadcast via ``ray.put`` — the small-side-broadcast join shape;
    2. a stateless ``map_batches`` pass splits, filters against the
       broadcast set and rejoins each document in place. No explode, no
       join, no per-document reassembly shuffle.

    Returns Dataset[keep_cols + (clean_text, n_kept, n_removed)].
    """
    import ray

    keep_cols = list(keep_cols or ["doc_id"])
    hh = duplicated_lines(ds, text_col=text_col, min_count=max_occurrences + 1)
    blocked = set(hh.select_columns(["line"]).to_pandas()["line"])
    blocked_ref = ray.put(blocked)

    class StripLines:
        def __init__(self):
            self.blocked = ray.get(blocked_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cleans, kept, removed = [], [], []
            bl = self.blocked
            for t in batch[text_col].to_pylist():
                lines = (t or "").split("\n")
                keep = [ln for ln in lines if ln not in bl]
                cleans.append("\n".join(keep))
                kept.append(len(keep))
                removed.append(len(lines) - len(keep))
            cols = {c: batch[c] for c in keep_cols}
            cols["clean_text"] = pa.array(cleans, pa.string())
            cols["n_kept"] = pa.array(kept, pa.int64())
            cols["n_removed"] = pa.array(removed, pa.int64())
            return pa.table(cols)

    return ds.map_batches(StripLines, batch_format="pyarrow", concurrency=(1, 8))


def incremental_dedup(
    ds,
    ref_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple = ("source",),
):
    """Cross-SNAPSHOT exact dedup: keep rows of ``ds`` whose content
    hash does not occur in ``ref_ds`` — the "don't re-train on what the
    last crawl already contributed" gate that incremental corpus builds
    run before any within-corpus dedup.

    Composition, not new machinery: md5 content keys computed once per
    batch-DISTINCT text on both sides, then the big-big anti-join
    exchange (pipelines/joins.py::anti_join — right side pre-deduped per
    batch, ONE hash exchange, no broadcast). When the reference
    snapshot's distinct hashes fit in worker memory, prefer the
    broadcast path (text_stats.ContaminationStage) instead.

    Returns Dataset[(content_h, id_col, *keep_cols)].
    """
    from ..pipelines.joins import anti_join

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        enc = pc.fill_null(texts, "").dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        dic = enc.dictionary.to_pylist()
        hs = np.asarray(
            [hashlib.md5(w.encode("utf-8")).hexdigest() for w in dic],
            dtype=object,
        )
        cols = {"content_h": pa.array(hs[codes], pa.string())}
        for c in (id_col, *keep_cols):
            if c in batch.column_names:
                cols[c] = batch[c]
        return pa.table(cols)

    left = ds.map_batches(add_hash, batch_format="pyarrow")
    right = ref_ds.map_batches(add_hash, batch_format="pyarrow")
    return anti_join(
        left, right, "content_h", ["content_h", id_col, *keep_cols]
    )


def _md5_h1h2(texts):
    """Per-row (hex md5, h1, h2) for bloom double-hashing; md5 runs once
    per batch-DISTINCT text. h2 is forced odd so the probe sequence
    h1 + i*h2 walks distinct slots of any power-of-two table."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    enc = pc.fill_null(texts, "").dictionary_encode()
    codes = np.asarray(enc.indices, dtype=np.int64)
    dic = enc.dictionary.to_pylist()
    hexes = np.empty(len(dic), object)
    h1 = np.empty(len(dic), np.uint64)
    h2 = np.empty(len(dic), np.uint64)
    for i, w in enumerate(dic):
        d = hashlib.md5(w.encode("utf-8")).digest()
        hexes[i] = d.hex()
        h1[i] = int.from_bytes(d[:8], "big")
        h2[i] = int.from_bytes(d[8:16], "big") | 1
    return hexes[codes], h1[codes], h2[codes]


def _bloom_positions(h1, h2, m_bits: int, n_hashes: int):
    """(byte_index, bit_mask) arrays, shape (n_hashes, len(h1))."""
    idx = (
        h1[None, :]
        + np.arange(n_hashes, dtype=np.uint64)[:, None] * h2[None, :]
    ) & np.uint64(m_bits - 1)
    return (idx >> np.uint64(3)).astype(np.int64), (
        np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)
    )


def incremental_dedup_bloom(
    ds,
    ref_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple = ("source",),
    m_bits: int = 1 << 23,
    n_hashes: int = 4,
):
    """:func:`incremental_dedup` semantics (keep rows of ``ds`` whose
    content hash does not occur in ``ref_ds``) with a BLOOM-FILTER
    pre-pass, the shape that wins at 100 TB: the prior snapshot's keys
    compress into an ``m_bits``-bit filter built by a shuffle-free
    mergeable aggregate (Bloom 1970; the "join filter" every warehouse
    pushes below a big-big join), the filter broadcasts ONCE via
    ``ray.put``, and only the rows the filter cannot rule out —
    true matches plus the ~(1 - e^{-kn/m})^k false-positive sliver —
    enter the exact anti-join exchange. Blooms have NO false negatives,
    so the output is bit-identical to the exact operator (same oracle),
    while the shuffle volume drops from |new crawl| to |matches| + eps.

    Size ``m_bits`` at ~10 bits per prior-snapshot key (1 GB of filter
    covers ~8e8 keys at fpr ~1%); the filter is the only driver-sized
    state and merges associatively, so the build tree-reduces.
    """
    from concurrent.futures import ThreadPoolExecutor

    import ray as _ray

    from ..pipelines.joins import anti_join

    m_bytes = m_bits >> 3

    hash_schema_cols = ["content_h", id_col, *keep_cols]

    def add_hash(batch: pa.Table) -> pa.Table:
        """md5 ONCE per row; h1/h2 carried as uint64 columns so neither
        the bloom build nor the probe re-hashes (r3 verdict #7 — the old
        shape md5'd the new side twice and the prior snapshot twice)."""
        hexes, h1, h2 = _md5_h1h2(batch[text_col])
        cols = {
            "content_h": pa.array(hexes, pa.string()),
            "__h1": pa.array(h1),
            "__h2": pa.array(h2),
        }
        for c in (id_col, *keep_cols):
            if c in batch.column_names:
                cols[c] = batch[c]
        return pa.table(cols)

    from ray.data.aggregate import AggregateFn

    def acc(state: np.ndarray, block: pa.Table) -> np.ndarray:
        h1 = np.asarray(block["__h1"], dtype=np.uint64)
        h2 = np.asarray(block["__h2"], dtype=np.uint64)
        if len(h1):
            byte, mask = _bloom_positions(h1, h2, m_bits, n_hashes)
            np.bitwise_or.at(state, byte.ravel(), mask.ravel())
        return state

    def ref_side():
        """Hash projection of the prior snapshot, then its (h1, h2)
        fold into the filter (no md5 in the fold) — both on this
        thread, overlapped with the new-side hashing below."""
        hashed = (
            ref_ds.select_columns([text_col])
            .map_batches(add_hash, batch_format="pyarrow")
            .materialize()
        )
        bloom = hashed.aggregate(
            AggregateFn(
                init=lambda _: np.zeros(m_bytes, np.uint8),
                merge=np.bitwise_or,
                accumulate_block=acc,
                finalize=lambda s: s,
                name="bloom",
            )
        )["bloom"]
        return hashed, bloom

    # Hash both sides CONCURRENTLY (two driver threads, one streaming
    # Ray job each — the filter build overlaps the new-side read) into
    # materialized hash projections (~50 B/row, no text), each consumed
    # twice below without lineage re-execution. Sequential depth: two
    # jobs (new-side hash || ref-side hash + filter fold), then the one
    # probe/anti-join exchange.
    with ThreadPoolExecutor(2) as pool:
        fut_new = pool.submit(
            lambda: ds.map_batches(add_hash, batch_format="pyarrow")
            .materialize()
        )
        fut_ref = pool.submit(ref_side)
        hashed_new = fut_new.result()
        hashed_ref, bloom = fut_ref.result()

    bloom_ref = _ray.put(bloom)

    def make_probe(keep_maybe: bool):
        """keep_maybe=False emits rows the filter PROVES absent (the
        definite keeps); True emits the candidates needing exact check.
        Probes the precomputed (h1, h2) columns — no re-hash. Plain
        TASKS, not an actor pool: the filter lives in the object store
        and ``ray.get`` inside a task is a zero-copy shared-memory read
        on each node, so there is no per-actor warmup to amortize."""

        def probe(batch: pa.Table) -> pa.Table:
            bloom = _ray.get(bloom_ref)
            h1 = np.asarray(batch["__h1"], dtype=np.uint64)
            h2 = np.asarray(batch["__h2"], dtype=np.uint64)
            if len(h1):
                byte, mask = _bloom_positions(h1, h2, m_bits, n_hashes)
                maybe = np.logical_and.reduce(
                    (bloom[byte] & mask) != 0, axis=0
                )
            else:
                maybe = np.zeros(0, bool)
            sel = pa.array(maybe if keep_maybe else ~maybe, pa.bool_())
            out = batch.filter(sel)
            return out.select(
                [c for c in out.column_names if c not in ("__h1", "__h2")]
            )

        return probe

    definite = hashed_new.map_batches(
        make_probe(False), batch_format="pyarrow"
    )
    maybes = hashed_new.map_batches(make_probe(True), batch_format="pyarrow")
    verified = anti_join(
        maybes,
        hashed_ref.select_columns(["content_h"]),
        "content_h",
        hash_schema_cols,
    )
    return definite.union(verified)


def cross_minhash_contamination(
    ds,
    bench_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
):
    """Cross-corpus NEAR-duplicate contamination: flag every (corpus
    doc, benchmark doc) pair whose estimated Jaccard (fraction of equal
    minhash components) reaches ``threshold`` — the fuzzy counterpart of
    the exact n-gram ContaminationStage, catching benchmark items that
    were lightly paraphrased or suffixed before leaking into training
    data (the decontamination gap GPT-3's appendix C and successors
    patch with exactly this LSH shape).

    Returns Dataset[(id_col, bench_id_col, n_eq)] — distinct flagged
    pairs with the equal-component count (est = n_eq / k).

    Shape: both sides sign once (k minhashes), explode into band
    bucket rows carrying the binary signature, ONE union + groupby on
    the exact band slice; inside a bucket only CROSS-side pairs are
    compared (corpus-side m x bench-side b equality counts, row-slabbed
    so the m*b*k tensor stays bounded), and a final
    groupby(doc, bench).max dedups across bands. Nothing all-pairs:
    candidate volume is governed by the LSH collision rate exactly as
    in minhash_dedup.
    """
    from ray.data.aggregate import Max

    assert k % bands == 0
    r = k // bands
    vcols = ["v%d" % j for j in range(r)]
    pair_schema = pa.schema(
        [(id_col, pa.int64()), (bench_id_col, pa.int64()), ("n_eq", pa.int64())]
    )

    def make_explode(side: int):
        def explode(batch: pa.Table) -> pa.Table:
            mat = _sig_matrix(batch["sig"], k)
            ids = np.asarray(batch[id_col], dtype=np.int64)
            n = mat.shape[0]
            cols = {
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int64), n)),
            }
            sl = mat.reshape(n, bands, r)
            for j in range(r):
                cols["v%d" % j] = pa.array(sl[:, :, j].reshape(-1))
            cols["mid"] = pa.array(np.repeat(ids, bands))
            cols["side"] = pa.array(
                np.full(n * bands, side, dtype=np.int8), pa.int8()
            )
            cols["sig"] = batch["sig"].take(
                pa.array(np.repeat(np.arange(n), bands))
            )
            return pa.table(cols)

        return explode

    sigs_a = minhash_signatures(ds, text_col, id_col, k)
    sigs_b = minhash_signatures(bench_ds, text_col, id_col, k)
    buckets = sigs_a.map_batches(
        make_explode(0), batch_format="pyarrow"
    ).union(sigs_b.map_batches(make_explode(1), batch_format="pyarrow"))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        side = np.asarray(group["side"], dtype=np.int8)
        a_rows = side == 0
        b_rows = side == 1
        if not a_rows.any() or not b_rows.any():
            return pair_schema.empty_table()
        sig = _sig_matrix(group["sig"], k)
        ids = np.asarray(group["mid"], dtype=np.int64)
        A, B = sig[a_rows], sig[b_rows]
        ida, idb = ids[a_rows], ids[b_rows]
        out_a, out_b, out_n = [], [], []
        # slab the corpus side so the (slab x |B| x k) compare tensor
        # stays ~16M cells no matter how hot the bucket is
        slab = max(1, (1 << 24) // max(1, len(B) * k))
        for s0 in range(0, len(A), slab):
            neq = (A[s0 : s0 + slab, None, :] == B[None, :, :]).sum(
                axis=2, dtype=np.int64
            )
            est = neq / float(k)
            ai, bi = np.nonzero(est >= threshold)
            out_a.append(ida[s0 + ai])
            out_b.append(idb[bi])
            out_n.append(neq[ai, bi])
        if not out_a:
            return pair_schema.empty_table()
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_a), pa.int64()),
                bench_id_col: pa.array(np.concatenate(out_b), pa.int64()),
                "n_eq": pa.array(
                    np.concatenate(out_n).astype(np.int64), pa.int64()
                ),
            }
        )

    pairs = buckets.groupby(["band"] + vcols).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    return pairs.groupby([id_col, bench_id_col]).aggregate(
        Max("n_eq", alias_name="n_eq")
    )


# --- canonicalized dedup keeping the best representative -----------------

_PRI_BIG = 10**18  # > any text length; keeps the padded priority 19 digits


def canonical_dedup_best(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup over CANONICALIZED content, keeping the most complete
    raw representative: documents whose lowercased,
    whitespace-collapsed, trimmed text is identical form one group; the
    survivor is the group's longest RAW text (most complete variant),
    ties to the lowest id. This is the keep-best policy production
    pipelines use where :func:`exact_dedup`'s min-id policy would keep
    an arbitrary (possibly truncated/shouting-case) variant.

    Returns Dataset[(id_col, dup_count)] — one row per surviving doc.

    Shape: one corpus exchange, <= 1 row per canonical key per block.
    The per-batch partial canonicalizes vectorized (utf8_lower +
    RE2 \\s+ collapse + space trim), hashes only batch-DISTINCT
    canonical texts (blake2b-128), and pre-reduces to the batch's best
    row per key via one lexsort. The argmax-with-tiebreak survives the
    groupby as a ``Min`` over a fixed-width sortable priority string
    ``zfill(BIG - len) || zfill(id)`` — max length then min id, no
    map_groups needed. Equivalent SQL: ROW_NUMBER() OVER (PARTITION BY
    canon ORDER BY len(text) DESC, id) = 1.
    """
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key": pa.array([], pa.string()),
                "pri": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        # a block of only-null texts arrives as type null — cast first
        t = pc.fill_null(batch[text_col].cast(pa.string()), "")
        lengths = np.asarray(pc.utf8_length(t), dtype=np.int64)
        canon = pc.utf8_trim(
            pc.replace_substring_regex(pc.utf8_lower(t), r"\s+", " "), " "
        )
        if isinstance(canon, pa.ChunkedArray):
            canon = canon.combine_chunks()
        dk = canon.dictionary_encode()
        codes = np.asarray(dk.indices, dtype=np.int64)
        dic = dk.dictionary.to_pylist()
        keys = [
            hashlib.blake2b(s.encode("utf-8"), digest_size=16).hexdigest()
            for s in dic
        ]
        ids = np.asarray(batch[id_col], dtype=np.int64)
        # batch-local best per key: group by code, then len desc, id asc
        order = np.lexsort((ids, -lengths, codes))
        sc = codes[order]
        first = np.ones(len(sc), dtype=bool)
        first[1:] = sc[1:] != sc[:-1]
        sel = order[first]
        cnt = np.bincount(codes, minlength=len(dic)).astype(np.int64)
        return pa.table(
            {
                "key": pa.array([keys[c] for c in codes[sel]], pa.string()),
                "pri": pa.array(
                    [
                        "%019d%019d" % (_PRI_BIG - lengths[i], ids[i])
                        for i in sel
                    ],
                    pa.string(),
                ),
                "cnt": pa.array(cnt[codes[sel]], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Min("pri", alias_name="pri"), Sum("cnt", alias_name="dup_count"))
    )

    def decode(batch: pa.Table) -> pa.Table:
        ids = [int(p[19:]) for p in batch["pri"].to_pylist()]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "dup_count": batch["dup_count"],
            }
        )

    return agg.map_batches(decode, batch_format="pyarrow")


def url_dedup(ds, url_col: str = "url", id_col: str = "doc_id"):
    """Canonical-URL exact dedup — the web-curation front door: collapse
    every variant spelling of one resource (case, default ports,
    fragments, tracking params, query order — :mod:`..core.url`) and
    keep the minimum id per canonical URL with the duplicate count.

    Same scale shape as :func:`exact_dedup`: the per-batch partial
    canonicalizes once per DISTINCT url (dictionary-encoded) and emits
    ONE row per canonical URL per block, so the shuffle moves
    (canonical_url, min_id, count) rows — duplicate-heavy crawls
    compress before the exchange, not after.

    Returns Dataset[(canonical_url, id_col, dup_count)].
    """
    from ray.data.aggregate import Min, Sum

    from ..core.url import normalize_url_array

    def partial(batch: pa.Table) -> pa.Table:
        canon = normalize_url_array(batch[url_col])
        t = pa.table({"canonical_url": canon, id_col: batch[id_col]})
        g = t.group_by("canonical_url").aggregate(
            [(id_col, "min"), (id_col, "count")]
        )
        return pa.table(
            {
                "canonical_url": g["canonical_url"],
                id_col: g[f"{id_col}_min"],
                "dup_count": pc.cast(g[f"{id_col}_count"], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("canonical_url")
        .aggregate(
            Min(id_col, alias_name=id_col),
            Sum("dup_count", alias_name="dup_count"),
        )
    )
