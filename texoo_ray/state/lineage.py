"""Per-partition lineage + resumable runs.

The reference has no checkpointing (batch jobs rerun from scratch,
SURVEY.md §4); at 10^12-turn scale that is unacceptable, so the engine
partitions work by input-file groups and records a manifest per completed
partition:

    out_dir/
      part=00000/ ... parquet files ...
      part=00000/_MANIFEST.json   {inputs, rows, wall_sec, engine_version}

A rerun skips partitions whose manifest exists and whose input list is
unchanged; a partition is complete only when its manifest exists (output
is written to ``part=NNNNN.tmp`` and atomically renamed, so a crashed run
never leaves a partition that looks complete). Metrics (rows, wall time)
live in the manifests; ``collect_metrics`` aggregates them.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable, Dict, List, Optional, Sequence

from .. import __version__

MANIFEST_NAME = "_MANIFEST.json"


def partition_inputs(files: Sequence[str], num_partitions: int) -> List[List[str]]:
    """Deterministic round-robin file grouping (sorted first, like the
    reference's sorted directory walk, DirectoryDatasetReader.java:86-89)."""
    ordered = sorted(files)
    num_partitions = max(1, min(num_partitions, len(ordered)))
    groups: List[List[str]] = [[] for _ in range(num_partitions)]
    for i, f in enumerate(ordered):
        groups[i % num_partitions].append(f)
    return groups


def manifest_path(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, "part=%05d" % pid, MANIFEST_NAME)


def is_complete(out_dir: str, pid: int, inputs: Sequence[str]) -> bool:
    path = manifest_path(out_dir, pid)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            m = json.load(f)
        return m.get("inputs") == sorted(inputs)
    except (json.JSONDecodeError, OSError):
        return False


def _settle_optional_imports() -> None:
    """Make Ray's lazy optional imports thread-safe before fanning out.

    Ray's path resolver re-attempts ``from fsspec.implementations.http
    import HTTPFileSystem`` on every Dataset construction; when the import
    FAILS (aiohttp absent), a failed import is never cached, so two
    partition threads can race on the partially-initialized module and see
    "cannot import name 'HTTPFileSystem'" (an ImportError Ray does not
    catch) instead of the expected ModuleNotFoundError. If the real import
    fails, install a sentinel module so later imports hit sys.modules —
    the sentinel class never matches any real filesystem instance."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except Exception:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel: isinstance(...) is always False
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules.setdefault("fsspec.implementations.http", mod)


def run_resumable(
    input_files: Sequence[str],
    out_dir: str,
    pipeline_fn: Callable,
    *,
    num_partitions: int = 16,
    max_concurrent: int = 4,
    counter_cols: Sequence[str] = (),
    input_groups: Optional[Sequence[Sequence[str]]] = None,
    write_partition_cols: Optional[Sequence[str]] = None,
) -> Dict:
    """Run ``pipeline_fn(ds) -> ds`` over each input partition, skipping
    completed ones. Each partition is itself a fully parallel Ray
    pipeline; the partition loop only controls checkpoint granularity.

    ``max_concurrent`` partitions execute simultaneously (each is a
    streaming Dataset driven from its own thread — Ray's streaming
    executor interleaves their tasks), so the tail partition no longer
    serializes the run: with K in flight the cluster stays busy until the
    last K partitions drain. Raise it roughly to
    cluster_cpus / per-partition concurrency.

    ``input_groups`` overrides the round-robin file grouping with an
    explicit [files-per-partition] list (partition pid = list index) —
    the hook :func:`run_resumable_by_key`'s bucket phase uses to make
    pid == bucket id. ``write_partition_cols`` forwards to
    ``write_parquet(partition_cols=...)`` so a phase can emit a
    hive-partitioned layout inside each part directory.

    Returns {"partitions": total, "skipped": n, "rows": total_rows}.
    """
    from concurrent.futures import ThreadPoolExecutor

    import ray.data

    _settle_optional_imports()

    os.makedirs(out_dir, exist_ok=True)
    groups = (
        [list(g) for g in input_groups]
        if input_groups is not None
        else partition_inputs(input_files, num_partitions)
    )
    skipped = 0
    total_rows = 0
    todo = []
    for pid, inputs in enumerate(groups):
        if is_complete(out_dir, pid, inputs):
            skipped += 1
            with open(manifest_path(out_dir, pid)) as f:
                total_rows += json.load(f)["rows"]
        else:
            todo.append((pid, inputs))

    def run_partition(pid: int, inputs: Sequence[str]) -> int:
        part_dir = os.path.join(out_dir, "part=%05d" % pid)
        tmp_dir = part_dir + ".tmp"
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)
        if not inputs:  # an explicit input_groups bucket can be empty
            os.makedirs(tmp_dir, exist_ok=True)
            with open(os.path.join(tmp_dir, MANIFEST_NAME), "w") as f:
                json.dump(
                    {
                        "inputs": [],
                        "rows": 0,
                        "wall_sec": 0.0,
                        "engine_version": __version__,
                    },
                    f,
                    indent=1,
                )
            os.rename(tmp_dir, part_dir)
            return 0
        started = time.time()
        ds = ray.data.read_parquet(list(inputs))
        ds = pipeline_fn(ds)
        if write_partition_cols:
            ds.write_parquet(
                tmp_dir, partition_cols=list(write_partition_cols)
            )
        else:
            ds.write_parquet(tmp_dir)
        import pyarrow.dataset as pads

        dset = pads.dataset(tmp_dir)
        rows = dset.count_rows()
        manifest = {
            "inputs": sorted(inputs),
            "rows": rows,
            "wall_sec": round(time.time() - started, 3),
            "engine_version": __version__,
        }
        if counter_cols:
            # per-partition stage counters (north rule: lineage + metrics
            # per partition): sums of integer output columns, read back
            # columnar from the partition just written — resumed runs
            # keep completed partitions' counters via their manifests
            import pyarrow.compute as _pc

            present = [c for c in counter_cols if c in dset.schema.names]
            t = dset.to_table(columns=present) if present else None
            manifest["counters"] = {
                c: int(_pc.sum(t[c]).as_py() or 0) for c in (present or [])
            }
        with open(os.path.join(tmp_dir, MANIFEST_NAME), "w") as f:
            json.dump(manifest, f, indent=1)
        os.rename(tmp_dir, part_dir)
        return rows

    if todo:
        with ThreadPoolExecutor(max_workers=max(1, max_concurrent)) as pool:
            futures = [pool.submit(run_partition, pid, inputs) for pid, inputs in todo]
            for f in futures:
                total_rows += f.result()
    return {"partitions": len(groups), "skipped": skipped, "rows": total_rows}


def run_resumable_by_key(
    input_files: Sequence[str],
    out_dir: str,
    pipeline_fn: Callable,
    *,
    key_col: str = "conv_id",
    num_buckets: int = 16,
    file_partitions: Optional[int] = None,
    max_concurrent: int = 4,
    counter_cols: Sequence[str] = (),
) -> Dict:
    """Two-phase resumable run for input layouts that do NOT co-locate
    ``key_col`` with file boundaries (SCALE.md "Ordering exchange": when
    conversations are scattered across files, grouping by file can never
    give a partition whole conversations).

    Phase A (resumable per input-file group): read the group, attach
    ``bucket = hash(key) % num_buckets`` (the vectorized FNV string hash,
    core/strhash.py), and write a hive-partitioned re-shard under
    ``out_dir/bucketed/part=NNNNN/bucket=B/``. Phase B (resumable per
    BUCKET, pid == bucket id): run ``pipeline_fn`` over every phase-A
    file of that bucket — the pipeline therefore sees EVERY turn of each
    of its conversations, whatever the input layout. Both phases use the
    same manifest/atomic-rename contract, so a kill at any point resumes
    precisely: completed A groups and completed buckets are skipped.

    This is the 100-TB shape: one extra full read+write (the re-shard)
    buys per-bucket whole-key locality without any per-partition
    full-input scan; the alternative (each of P partitions filtering the
    whole input for its hash range) reads the corpus P times.
    """
    import ray.data

    _settle_optional_imports()

    from ..core.strhash import utf8_hash64

    try:
        import numpy as np
        import pyarrow as pa
    except ImportError:  # pragma: no cover
        raise

    def add_bucket(ds):
        def tag(batch: pa.Table) -> pa.Table:
            key = batch[key_col]
            if not pa.types.is_string(key.type):
                import pyarrow.compute as pc

                key = pc.cast(key, pa.string())
            b = (utf8_hash64(key) % np.uint64(num_buckets)).astype(np.int64)
            return batch.append_column("bucket", pa.array(b, pa.int64()))

        return ds.map_batches(tag, batch_format="pyarrow")

    bucketed_dir = os.path.join(out_dir, "bucketed")
    a_stats = run_resumable(
        list(input_files),
        bucketed_dir,
        add_bucket,
        num_partitions=file_partitions or max(1, len(list(input_files))),
        max_concurrent=max_concurrent,
        write_partition_cols=["bucket"],
    )

    import glob as _glob

    groups = [
        sorted(
            _glob.glob(
                os.path.join(bucketed_dir, "part=*[0-9]", "bucket=%d" % b, "*.parquet")
            )
        )
        for b in range(num_buckets)
    ]

    def pipeline_no_hive(ds):
        # read_parquet infers hive partitioning from the part=NNNNN/
        # bucket=B path segments even for explicit file lists,
        # resurrecting them as columns — strip before the pipeline so
        # the by-key output schema matches the by-file path exactly
        import pyarrow as _pa

        def drop(batch: _pa.Table) -> _pa.Table:
            return batch.drop_columns(
                [c for c in ("part", "bucket") if c in batch.column_names]
            )

        return pipeline_fn(ds.map_batches(drop, batch_format="pyarrow"))

    b_stats = run_resumable(
        [f for g in groups for f in g],
        out_dir,
        pipeline_no_hive,
        input_groups=groups,
        max_concurrent=max_concurrent,
        counter_cols=counter_cols,
    )
    return {
        "partitions": b_stats["partitions"],
        "skipped": b_stats["skipped"],
        "rows": b_stats["rows"],
        "reshard_partitions": a_stats["partitions"],
        "reshard_skipped": a_stats["skipped"],
    }


def collect_metrics(out_dir: str) -> Dict:
    """Aggregate manifests into run-level metrics."""
    rows = 0
    wall = 0.0
    parts = 0
    counters: Dict[str, int] = {}
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name, MANIFEST_NAME)
        if os.path.exists(p):
            with open(p) as f:
                m = json.load(f)
            rows += m["rows"]
            wall += m.get("wall_sec", 0.0)
            parts += 1
            for k, v in m.get("counters", {}).items():
                counters[k] = counters.get(k, 0) + v
    out = {"partitions": parts, "rows": rows, "wall_sec_sum": round(wall, 3)}
    if counters:
        out["counters"] = counters
    return out
