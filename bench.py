"""Benchmark harness.

Default: runs the headline extraction pipeline (read parquet turns ->
fused extract -> sort(conv_id, turn_idx) -> write parquet) over a
deterministic synthetic transcript corpus sized from $GRAFT_SF_DIR
(default /root/testdata/sf0.1 -> ~700k turns), plus timed operator
queries over the sf tables. Prints ONE JSON line.

--scaling: reruns this script in fresh processes at num_cpus=8 and 32 on
the SAME corpus (generated+cached beforehand, cache warmed) and reports
both throughputs and the scaling efficiency (t8/t32)/(32/8).

Env: GRAFT_SF_DIR, RAY_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_CACHE = "/tmp/texoo_bench_turns"

# bench corpus size by sf tag (conversations; ~9.4 turns each). sf0.1 is
# sized so per-core compute dominates fixed costs (actor startup, shuffle
# drain) at 32 cpus — the scaling measurement needs compute-bound runs.
_BENCH_CONVS = {"sf0.001": 1000, "sf0.01": 10000, "sf0.1": 300000}


def bench_corpus_dir() -> str:
    tag = os.path.basename(os.path.normpath(SF_DIR))
    return os.path.join(BENCH_CACHE, "%s-v2" % tag)


def ensure_bench_corpus() -> str:
    """Generate (parallel, deterministic) and cache the bench turns corpus."""
    tag = os.path.basename(os.path.normpath(SF_DIR))
    n_convs = _BENCH_CONVS.get(tag, 10000)
    out_dir = bench_corpus_dir()
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    from texoo_ray.sources.turns import write_turns_corpus

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    rows = write_turns_corpus(out_dir, n_convs, seed=42, num_files=128)
    with open(marker, "w") as f:
        f.write(str(rows))
    return out_dir


def run_headline(turns_dir: str) -> dict:
    import ray.data

    from texoo_ray.pipelines.extract import (
        configure_shuffle,
        extract_turns,
        ordered_by_conversation,
        restore_shuffle,
    )
    from texoo_ray.sources.fixtures import GAZETTEER_TERMS

    out_dir = "/tmp/texoo_bench_out/headline"
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)

    # Hash-shuffle ordering exchange (groupby(conv_id) + in-group sort)
    # with a bounded aggregator CPU budget; block count a multiple of the
    # actor pool so the last wave isn't mostly idle. The strategy is
    # scoped to the headline — queries run under the default strategy.
    concurrency, prev_shuffle = configure_shuffle(NUM_CPUS, num_partitions=64)
    num_blocks = max(48, 4 * concurrency)

    # warm page cache (untimed read) so we measure compute + shuffle
    warm = ray.data.read_parquet(turns_dir).count()

    try:
        t0 = time.time()
        ds = ray.data.read_parquet(turns_dir, override_num_blocks=num_blocks)
        ds = extract_turns(
            ds,
            gazetteer_terms=GAZETTEER_TERMS,
            batch_size=1024,
            concurrency=concurrency,
            lean=True,
        )
        ds = ordered_by_conversation(ds, num_partitions=64)
        ds.write_parquet(out_dir)
        wall = time.time() - t0
    finally:
        restore_shuffle(prev_shuffle)
    return {"turns": warm, "sec": round(wall, 3), "turns_per_sec": round(warm / wall, 1)}


def run_queries() -> dict:
    """Timed operator queries over the sf tables (small side benchmarks)."""
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    picks = [
        "dedup_exact",
        "dedup_minhash",
        "vocab_top100",
        "events_hourly",
        "events_sessions",
        "knn_top10",
        "doc_quality",
        "retrieval_topk",
        "doc_tokenize",
        "curate_corpus",
        "html_main_content",
        "layout_main_content",
        "knn_ivf",
        "clicks_before_purchase",
        "rolling_value_sum",
        "cross_source_overlap",
        "chunk_documents",
    ]
    trials = int(os.environ.get("BENCH_TRIALS", "2"))
    out = {}
    for name in picks:
        best = None
        for _ in range(max(1, trials)):
            t0 = time.time()
            res = qs[name](SF_DIR)
            # consume
            if hasattr(res, "to_pandas"):
                res.to_pandas()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def main_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    turns_dir = ensure_bench_corpus()
    # Hypervisor steal on this VM adds up to ~25% wall-time noise (noise
    # only ever ADDS time); min-of-trials is the standard estimator.
    trials = int(os.environ.get("BENCH_TRIALS", "2"))
    headline = min(
        (run_headline(turns_dir) for _ in range(max(1, trials))),
        key=lambda r: r["sec"],
    )
    queries = run_queries()
    ray.shutdown()

    sf_tag = os.path.basename(os.path.normpath(SF_DIR))
    return {
        "metric": "extraction pipeline wall time (read->extract->sort->write)",
        "value": headline["sec"],
        "unit": "sec",
        "queries": queries,
        "sf": sf_tag,
        "num_cpus": NUM_CPUS,
        "turns": headline["turns"],
        "turns_per_sec": headline["turns_per_sec"],
    }


def main_scaling() -> dict:
    """Same job in fresh processes at 8 and 32 CPUs; corpus pre-generated.

    Each level runs multiple trials and reports the MINIMUM wall time —
    the standard noise-robust estimator on shared hardware (this sandbox
    is a VM with measurable hypervisor steal time; noise only ever adds
    time, so min approximates the uncontended run). All trials are listed
    for transparency.
    """

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_TRIALS="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    trials_lo = [run(lo) for _ in range(2)]
    trials_hi = [run(hi) for _ in range(3)]
    r_lo = min(trials_lo, key=lambda r: r["value"])
    r_hi = min(trials_hi, key=lambda r: r["value"])
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling efficiency (N=8 vs 4N=32 cpus, fresh ray sessions, min of trials)",
        "sf": r_lo["sf"],
        "turns": r_lo["turns"],
        "sec_%d" % lo: r_lo["value"],
        "sec_%d" % hi: r_hi["value"],
        "trials_sec_%d" % lo: [r["value"] for r in trials_lo],
        "trials_sec_%d" % hi: [r["value"] for r in trials_hi],
        "turns_per_sec_%d" % lo: r_lo["turns_per_sec"],
        "turns_per_sec_%d" % hi: r_hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(main_scaling()))
    else:
        print(json.dumps(main_bench()))
