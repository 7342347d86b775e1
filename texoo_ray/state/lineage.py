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

    Returns {"partitions": total, "skipped": n, "rows": total_rows}.
    """
    from concurrent.futures import ThreadPoolExecutor

    import ray.data

    _settle_optional_imports()

    os.makedirs(out_dir, exist_ok=True)
    groups = partition_inputs(input_files, num_partitions)
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
        started = time.time()
        ds = ray.data.read_parquet(list(inputs))
        ds = pipeline_fn(ds)
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
