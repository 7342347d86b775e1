"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine.

Scale notes (the point of these implementations):

- **exact**: content-hash per batch (vectorized), then PARTIAL aggregation
  inside each batch (one row per distinct hash per batch) before the
  global ``groupby(hash)`` — the shuffle moves one row per distinct text
  per block instead of one per row.
- **minhash**: signatures are computed per batch with numpy (k permutations
  via multiply-shift over crc32 shingle hashes); LSH bands explode to
  (band, band_hash) rows; bucket candidates are VERIFIED (band collisions
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
    hs = np.array(
        [
            int.from_bytes(
                hashlib.blake2b(f.encode("utf-8"), digest_size=8).digest(), "little"
            )
            for f in feats
        ],
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
        # solve components in a SINGLE task with vectorized min-label
        # relaxation — one coalesced block, zero join rounds. The corpus
        # itself never flows through here, only the near-dup subgraph.
        # Duplicate edges (one per shared band) are harmless here.
        @_norm(lab_schema)
        def solve(b: pa.Table) -> pa.Table:
            s0 = np.asarray(b["src"], dtype=np.int64)
            d0 = np.asarray(b["dst"], dtype=np.int64)
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
            return pa.table({"id": pa.array(ids), "label": pa.array(labels)})

        labels = _compact(
            edges.repartition(1).map_batches(
                solve, batch_format="pyarrow", batch_size=None
            )
        )
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
        sigs = [
            np.ascontiguousarray(minhash_signature(t or "", k)).tobytes()
            for t in texts
        ]
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
    rows_per_band = k // bands
    assert k % bands == 0

    def explode(batch: pa.Table) -> pa.Table:
        mat = _sig_matrix(batch["sig"], k)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        b_col: List[int] = []
        h_col: List[str] = []
        i_col: List[int] = []
        for r in range(mat.shape[0]):
            for b in range(bands):
                chunk = mat[r, b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.blake2b(
                    np.ascontiguousarray(chunk).tobytes(), digest_size=8
                ).hexdigest()
                b_col.append(b)
                h_col.append(h)
                i_col.append(int(ids[r]))
        return pa.table(
            {
                "band": pa.array(b_col, pa.int64()),
                "band_hash": pa.array(h_col, pa.string()),
                id_col: pa.array(i_col, pa.int64()),
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
      -> stderr ~0.06); pairs below ``threshold`` are dropped. The bucket
      rep's signature rides the groupby as a zero-padded "id|sig-hex"
      string min (min over the padded string == min over doc_id), so
      verification happens right after the single bucket join — ONE
      groupby + ONE join total. The band shuffle carries ~1 KB/doc/band;
      on bandwidth-constrained clusters trade that for two extra joins of
      the lean (id, sig) table instead.
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
    rows_per_band = k // bands
    sigs = minhash_signatures(ds, text_col, id_col, k).materialize()
    all_ids = sigs.select_columns([id_col])

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
            keep = [
                jaccard_ngrams(s or "", d or "") >= threshold
                for s, d in zip(b["_text_src"].to_pylist(), b["_text_dst"].to_pylist())
            ]
            t = b.filter(pa.array(keep, pa.bool_()))
            return pa.table({"src": t[id_col], "dst": t["bucket_min"]})

        edges = e.map_batches(check_exact, batch_format="pyarrow")
        return cluster_from_edges(all_ids, edges, id_col, max_iters)

    # signature mode: pack-carry, one groupby + one join
    def explode(batch: pa.Table) -> pa.Table:
        mat = _sig_matrix(batch["sig"], k)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        sig_bytes = batch["sig"].to_pylist()
        packs = ["%020d|" % i + s.hex() for i, s in zip(ids, sig_bytes)]
        b_col: List[int] = []
        h_col: List[str] = []
        p_col: List[str] = []
        for r in range(mat.shape[0]):
            for b in range(bands):
                chunk = mat[r, b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.blake2b(
                    np.ascontiguousarray(chunk).tobytes(), digest_size=8
                ).hexdigest()
                b_col.append(b)
                h_col.append(h)
                p_col.append(packs[r])
        return pa.table(
            {
                "band": pa.array(b_col, pa.int64()),
                "band_hash": pa.array(h_col, pa.string()),
                "pack": pa.array(p_col, pa.string()),
            }
        )

    buckets = sigs.map_batches(explode, batch_format="pyarrow")
    mins = (
        buckets.groupby(["band", "band_hash"])
        .aggregate(Min("pack", alias_name="rep_pack"), Count(alias_name="bucket_n"))
        .map_batches(
            lambda b: b.filter(pc.greater(b["bucket_n"], 1)), batch_format="pyarrow"
        )
    )
    joined = buckets.join(mins, "inner", P, on=("band", "band_hash"))

    def _unpack(packs: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        ids = np.array([int(p[:20]) for p in packs], dtype=np.int64)
        buf = b"".join(bytes.fromhex(p[21:]) for p in packs)
        return ids, np.frombuffer(buf, dtype=np.int64).reshape(-1, k)

    @_norm(_EDGE_SCHEMA)
    def check_sig(b: pa.Table) -> pa.Table:
        own_id, own_sig = _unpack(b["pack"].to_pylist())
        rep_id, rep_sig = _unpack(b["rep_pack"].to_pylist())
        est = (own_sig == rep_sig).mean(axis=1)
        keep = (est >= threshold) & (own_id != rep_id)
        return pa.table(
            {"src": pa.array(own_id[keep]), "dst": pa.array(rep_id[keep])}
        )

    edges = joined.map_batches(check_sig, batch_format="pyarrow")
    return cluster_from_edges(all_ids, edges, id_col, max_iters)


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

    The bucket representative's signature rides along the groupby as a
    zero-padded "id|sig" string min (min over the padded string == min
    over doc_id), which avoids a second join against the signature table.
    """
    from ray.data.aggregate import Count, Min

    P = _join_partitions()

    def sig_stage(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        sigs = np.array(
            [np.uint64(simhash64(t or "")) for t in texts], dtype=np.uint64
        ).astype(np.int64)
        return pa.table({id_col: batch[id_col], "sig": pa.array(sigs)})

    sigs = ds.map_batches(sig_stage, batch_format="pyarrow").materialize()

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
        # min over the id-prefixed pack string == min over doc_id (ids are
        # unique within a bucket), so the rep's signature rides along free
        pack = ["%020d|%d" % (i, s) for i, s in zip(id_c, sig_c)]
        return pa.table(
            {
                "band": pa.array(band_c),
                "key": pa.array(key_c),
                id_col: pa.array(id_c),
                "sig": pa.array(sig_c),
                "pack": pa.array(pack, pa.string()),
            }
        )

    buckets = sigs.map_batches(explode, batch_format="pyarrow")
    mins = (
        buckets.groupby(["band", "key"])
        .aggregate(Min("pack", alias_name="rep_pack"), Count(alias_name="bucket_n"))
        .map_batches(
            lambda b: b.filter(pc.greater(b["bucket_n"], 1)), batch_format="pyarrow"
        )
    )
    joined = buckets.join(mins, "inner", P, on=("band", "key"))

    @_norm(_EDGE_SCHEMA)
    def verify(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col], dtype=np.int64)
        sig = np.asarray(b["sig"], dtype=np.int64).astype(np.uint64)
        packs = b["rep_pack"].to_pylist()
        rep_id = np.array([int(p.split("|")[0]) for p in packs], dtype=np.int64)
        rep_sig = np.array(
            [int(p.split("|")[1]) for p in packs], dtype=np.int64
        ).astype(np.uint64)
        ham = _popcount_u64(sig ^ rep_sig)
        keep = (ham <= max_hamming) & (ids != rep_id)
        return pa.table(
            {"src": pa.array(ids[keep]), "dst": pa.array(rep_id[keep])}
        )

    # duplicate edges across bands are harmless for min-label propagation
    edges = joined.map_batches(verify, batch_format="pyarrow")
    all_ids = sigs.select_columns([id_col])
    return cluster_from_edges(all_ids, edges, id_col, max_iters)
