"""Clustered (hash-bucketed) Parquet layout + shuffle-free co-partitioned
joins.

The single biggest lever at 100 TB is not doing the exchange at all:
write each table ONCE partitioned by a hash of its join key, record the
layout in a manifest, and every later equi-join on that key becomes an
embarrassingly parallel per-bucket merge — no all-to-all, no aggregator
actors, restartable per bucket. This is the bucketed-table layout of
warehouse engines (Hive/Spark bucketing, public design), expressed over
Ray Data:

- ``write_clustered``: one stateless map attaches ``bucket =
  mix(key) % n`` and ``write_parquet(partition_cols=["bucket"])`` lays
  the table out as ``out_dir/bucket=i/``; ``_CLUSTER.json`` records
  (key, n_buckets, hash) so a reader can VERIFY co-partitioning instead
  of assuming it.
- ``join_clustered``: given two directories clustered on the same
  (n_buckets, hash), a Dataset of bucket ids fans out one task per
  bucket; each task pyarrow-reads its two bucket directories and joins
  them locally. The whole join moves zero rows between workers — the
  shuffle was prepaid once at write time and amortizes over every
  subsequent join, the "pick ONE partitioning key and reuse it" rule
  made executable.

The bucket hash is the same multiplicative mix used by the engine's
in-flight exchanges (graph/dedup bucketing), applied to int64 keys.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

_MIX = 0x9E3779B97F4A7C15
CLUSTER_MANIFEST = "_CLUSTER.json"


def _bucket_of(key: np.ndarray, n_buckets: int) -> np.ndarray:
    h = key.astype(np.uint64) * np.uint64(_MIX)
    return ((h >> np.uint64(33)) % np.uint64(n_buckets)).astype(np.int64)


def write_clustered(ds, out_dir: str, key: str, n_buckets: int = 64) -> str:
    """Write ``ds`` hash-clustered by int64 column ``key`` into
    ``out_dir/bucket=i/`` and record the layout manifest. Returns
    ``out_dir``."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key], dtype=np.int64)
        return batch.append_column(
            "bucket", pa.array(_bucket_of(k, n_buckets), pa.int64())
        )

    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    with open(os.path.join(out_dir, CLUSTER_MANIFEST), "w") as f:
        json.dump(
            {"key": key, "n_buckets": n_buckets, "hash": "mul_%x" % _MIX}, f
        )
    return out_dir


def read_cluster_manifest(path: str) -> dict:
    with open(os.path.join(path, CLUSTER_MANIFEST)) as f:
        return json.load(f)


def join_clustered(
    left_dir: str,
    right_dir: str,
    join_type: str = "inner",
    left_suffix: str = "",
    right_suffix: str = "_r",
):
    """Shuffle-free equi-join of two clustered directories written by
    :func:`write_clustered` with IDENTICAL (n_buckets, hash) layouts
    (verified from the manifests; mismatched layouts raise). Returns a
    Dataset of the joined rows — one task per bucket, each reading only
    its own two bucket directories; join keys are taken from the
    manifests, so the caller cannot accidentally join on a non-clustered
    column."""
    import ray.data

    if join_type != "inner":
        # a missing bucket directory means "no rows on that side"; only
        # inner semantics survive skipping such buckets (outer joins
        # would need typed null-padding per missing side)
        raise NotImplementedError("join_clustered supports inner joins")
    ml, mr = read_cluster_manifest(left_dir), read_cluster_manifest(right_dir)
    if (ml["n_buckets"], ml["hash"]) != (mr["n_buckets"], mr["hash"]):
        raise ValueError(
            f"layout mismatch: {ml} vs {mr} — re-cluster one side"
        )
    n = int(ml["n_buckets"])
    lkey, rkey = ml["key"], mr["key"]
    jt = join_type.replace("_", " ")

    # joined schema from a driver-side zero-row join, so empty buckets
    # emit TYPED empty blocks (schema-less blocks poison downstream ops)
    empty_joined = (
        _dir_schema(left_dir)
        .empty_table()
        .join(
            _dir_schema(right_dir).empty_table(),
            keys=[lkey],
            right_keys=[rkey],
            join_type=jt,
            left_suffix=left_suffix,
            right_suffix=right_suffix,
        )
    )

    def join_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out = [empty_joined]
        for b in batch["b"].to_pylist():
            ld = os.path.join(left_dir, f"bucket={b}")
            rd = os.path.join(right_dir, f"bucket={b}")
            if not (os.path.isdir(ld) and os.path.isdir(rd)):
                continue
            j = pq.read_table(ld).join(
                pq.read_table(rd),
                keys=[lkey],
                right_keys=[rkey],
                join_type=jt,
                left_suffix=left_suffix,
                right_suffix=right_suffix,
            )
            out.append(j)
        return pa.concat_tables(out, promote_options="default")

    ids = ray.data.from_items([{"b": i} for i in range(n)]).repartition(n)
    return ids.map_batches(join_bucket, batch_format="pyarrow")


def _dir_schema(root: str) -> pa.Schema:
    """Schema of the parquet files under a clustered root (partition
    column excluded — it lives in the directory names)."""
    import pyarrow.parquet as pq

    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return pq.read_schema(os.path.join(dirpath, f))
    raise FileNotFoundError(f"no parquet files under {root}")
