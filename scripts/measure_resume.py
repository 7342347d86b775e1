"""Measure the resumable-run story at sf0.1 scale (r3 verdict #9).

Three subprocess phases over the cached bench corpus (2.8M turns, 128
parquet files; generated on demand):

1. CLEAN  — full run_extract_resumable (16 partitions, 4 in flight),
            timed end to end;
2. KILLED — fresh output dir, same run SIGKILLed at ~45% of the clean
            wall time (mid-partition, like a preempted node);
3. RESUME — fresh process over the killed dir: completed partitions are
            skipped via their manifests, the rest recompute.

Prints ONE JSON line: clean/resume wall seconds, partitions skipped,
recomputed fraction, resume saving vs a from-scratch rerun, and a
row-count + per-partition counter equality check between the resumed
and clean outputs. Run while no other Ray work is alive.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_PARTS = 16
CONC = 4

_WORKER = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus={cpus}, include_dashboard=False,
         logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
import glob, json
from texoo_ray.pipelines.extract import run_extract_resumable
files = sorted(glob.glob({turns!r} + "/*.parquet"))
r = run_extract_resumable(
    files, {out!r}, num_partitions={parts}, max_concurrent={conc},
    sort_output=True, lean=True, batch_size=512,
)
print(json.dumps(r))
ray.shutdown()
"""


def _corpus() -> str:
    os.environ.setdefault("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, REPO)
    import importlib

    bench = importlib.import_module("bench")
    return bench.ensure_bench_corpus()


def _spawn(turns: str, out: str) -> subprocess.Popen:
    code = _WORKER.format(
        repo=REPO, cpus=NUM_CPUS, turns=turns, out=out,
        parts=N_PARTS, conc=CONC,
    )
    return subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, cwd=REPO,
    )


def _manifests(out: str):
    return sorted(glob.glob(os.path.join(out, "part=*[0-9]", "_MANIFEST.json")))


def _counter_totals(out: str):
    tot = {}
    rows = 0
    for p in _manifests(out):
        with open(p) as f:
            m = json.load(f)
        rows += m["rows"]
        for k, v in m.get("counters", {}).items():
            tot[k] = tot.get(k, 0) + v
    return rows, tot


def main() -> None:
    turns = _corpus()
    base = "/tmp/texoo_resume_bench"
    clean_dir, kill_dir = base + "/clean", base + "/killed"
    for d in (clean_dir, kill_dir):
        if os.path.exists(d):
            shutil.rmtree(d)

    # 1. clean full run
    t0 = time.time()
    p = _spawn(turns, clean_dir)
    out, _ = p.communicate()
    clean_sec = time.time() - t0
    clean = json.loads(out.strip().splitlines()[-1])
    clean_rows, clean_counters = _counter_totals(clean_dir)

    # 2. killed run (SIGKILL at ~45% of the clean wall)
    p = _spawn(turns, kill_dir)
    time.sleep(max(5.0, 0.45 * clean_sec))
    p.send_signal(signal.SIGKILL)
    p.wait()
    done_after_kill = len(_manifests(kill_dir))

    # 3. resume in a fresh process
    t0 = time.time()
    p = _spawn(turns, kill_dir)
    out, _ = p.communicate()
    resume_sec = time.time() - t0
    resume = json.loads(out.strip().splitlines()[-1])
    resumed_rows, resumed_counters = _counter_totals(kill_dir)

    print(json.dumps({
        "corpus_files": len(glob.glob(turns + "/*.parquet")),
        "partitions": N_PARTS,
        "clean_sec": round(clean_sec, 1),
        "clean_rows": clean_rows,
        "partitions_complete_at_kill": done_after_kill,
        "resume_skipped": resume["skipped"],
        "resume_sec": round(resume_sec, 1),
        "recomputed_fraction": round((N_PARTS - resume["skipped"]) / N_PARTS, 3),
        "resume_saving_vs_rerun": round(1.0 - resume_sec / clean_sec, 3),
        "rows_match": resumed_rows == clean_rows,
        "counters_match": resumed_counters == clean_counters,
    }))


if __name__ == "__main__":
    main()
