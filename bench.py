"""Benchmark harness.

Default: runs the headline extraction pipeline (read parquet turns ->
fused extract -> sort(conv_id, turn_idx) -> write parquet) over a
deterministic synthetic transcript corpus sized from $GRAFT_SF_DIR
(default /root/testdata/sf0.1 -> ~700k turns), plus timed operator
queries over the sf tables. Prints ONE JSON line.

--scaling: reruns the headline in fresh processes at num_cpus=8 and 32 on
the SAME corpus (generated+cached by the first child, warm read untimed)
and reports both throughputs and the scaling efficiency (t8/t32)/(32/8).

Every timed unit (each headline trial, the query suite) runs in its own
process + Ray session: identical runs inside one session degrade
monotonically on this sandbox (accumulated session state), fresh sessions
repeat within noise — see _spawn.

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
    # Keep the map-side block count ~2-3x the actor pool: the hash
    # exchange cost grows sharply with input block count (measured on the
    # 2.8M-turn corpus, same epoch: 64 blocks 59-63s, 96 blocks 70-79s,
    # 128 blocks 139s, 192 blocks 122-158s). 32 also divides the 128
    # corpus files evenly at small cpu counts (no 1-vs-2-file skew).
    num_blocks = max(32, 2 * concurrency + 16)

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
        "label_centroids",
        "kmeans_iter2",
        "source_mixture",
        "dataset_split",
        # round-3 curation additions
        "gopher_quality",
        "substring_dedup",
        "ngram_novelty",
        "semantic_dedup",
        "conv_dedup",
        "kmv_distinct",
        "kmv_source_overlap",
        "heavy_hitters",
        "substring_clean",
        "quantile_trim",
        "dedup_incremental",
        "embedding_gram",
        "dsir_score",
        "c4_clean",
        "unicode_normalize",
        "late_events",
        "vocab_coverage",
        "data_contract",
        "value_moments",
        # round-3 graph / retrieval / sampling additions
        "graph_components",
        "triangle_count",
        "bm25_topk",
        "weighted_sample",
        "dedup_bloom",
        "char_entropy",
        "profile_table",
        "event_transitions",
        "cross_contamination",
        "bpe_merges",
        "bpe_token_count",
        "pq_codes",
        "pq_search",
        "dedup_canonical",
        "knn_ivf_pq",
        "postings_search",
        "phrase_search",
        "ntile_shards",
        "fuzzy_join",
        "context_windows",
        "hll_bigrams",
        "order_cube",
        "snapshot_diff",
        "entity_clusters",
        # round-4 additions
        "quantile_trim_float",
        "url_dedup",
        "host_cap",
        "domain_block",
        "pivot_orders",
        "price_tiers",
        "ccnet_buckets",
        "overlap_pairs",
        "image_dedup",
        "audio_dedup",
        "zorder_prune",
        "kn_score",
        "video_dedup",
        "scd2_join",
        "unpivot_orders",
        "order_ranks",
        "cms_counts",
        "bleu_eval",
        "edit_join",
        "chrf_eval",
        "skyline_parts",
        "window_dedup",
        "kcore6",
        "snm_join",
        "rrf_fusion",
        "cluster_top_terms",
        "ks_drift",
        # round-4 exact-statistics family
        "feature_auc",
        "filter_kappa",
        "price_trend",
        "readability",
        "pmi_top50",
        "link_prediction",
        "clustering_eval",
        "host_gini",
        "term_burstiness",
        "mixture_weights",
        "distinct_ngrams",
        "mad_outliers",
        "log_odds_terms",
        "source_kl",
        "preference_pairs",
        "event_paths3",
        "zipf_fit",
        "rolling_median",
        "textrank_keywords",
        "tool_chains",
        "basket_pairs",
        "js_drift",
        "grouped_mad",
        "entropy_rate",
        "association_rules",
        "collapse_retries",
        "code_detect",
        "corr_matrix",
        "cat_mi",
        "benford",
        "mst_chain",
        "trimmed_stats",
        "verbosity_trend",
        "repeated_answers",
        "fd_check",
        "cusum_shift",
        "spearman_corr",
        # round-5 additions
        "pagerank2",
        "bemd_planted",
        "linker_planted",
        "segmentation_planted",
        "ner_planted",
        "retrieval_metrics_planted",
        "cdv_planted",
        "passages_planted",
        "w2v_sections_planted",
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


def _ray_session():
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
    return ray


def main_headline_once() -> dict:
    """One headline run in THIS process's own fresh Ray session."""
    ray = _ray_session()
    out = run_headline(ensure_bench_corpus())
    ray.shutdown()
    return out


def main_queries_once() -> dict:
    """The operator-query suite in THIS process's own fresh Ray session."""
    ray = _ray_session()
    out = run_queries()
    ray.shutdown()
    return out


def _spawn(flag: str, ncpu: int = None) -> dict:
    """Run one measurement unit in a FRESH process + Ray session.

    Measured on this sandbox: identical back-to-back headline runs inside
    ONE Ray session degrade monotonically (76s -> 143s -> 204s; accumulated
    session state), while fresh sessions repeat within noise (85/69/81s).
    Every timed unit therefore gets its own process; min-of-trials then
    actually measures the pipeline, not session age.
    """
    env = dict(os.environ)
    if ncpu is not None:
        env["RAY_GRAFT_CPUS"] = str(ncpu)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), flag],
        env=env,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError("bench child %s failed (rc=%d)" % (flag, proc.returncode))
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main_bench() -> dict:
    # Hypervisor steal on this VM adds up to ~25% wall-time noise (noise
    # only ever ADDS time); min-of-trials in fresh sessions is the
    # estimator (see _spawn). Three trials: machine epochs drift by ~2x
    # (measured same-code spread 55-122s), so an extra trial materially
    # improves the odds of catching a quiet window.
    trials = int(os.environ.get("BENCH_TRIALS", "3"))
    headline = min(
        (_spawn("--headline-once") for _ in range(max(1, trials))),
        key=lambda r: r["sec"],
    )
    # query suite: two fresh-session passes, per-query min (same epoch
    # noise rationale as the headline; each pass is its own process)
    q1 = _spawn("--queries-once")
    q2 = _spawn("--queries-once")
    queries = {k: min(q1[k], q2.get(k, q1[k])) for k in q1}

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


def _mp_worker(files) -> int:
    """One control process: the fused extraction over its file share,
    no Ray anywhere — pyarrow read -> ExtractStage batches of 1024."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from texoo_ray.sources.fixtures import GAZETTEER_TERMS
    from texoo_ray.stages.extract import ExtractStage

    stage = ExtractStage(gazetteer_terms=GAZETTEER_TERMS, lean=True)
    rows = 0
    for f in files:
        t = pq.read_table(f)
        for rb in t.to_batches(max_chunksize=1024):
            out = stage(pa.Table.from_batches([rb]))
            rows += out.num_rows
    return rows


def _mp_control(turns_dir: str, lo_procs: int, hi_procs: int) -> dict:
    """Hardware-scaling CONTROL measured in the SAME epoch as the Ray
    trials (r3 verdict #4): plain ``multiprocessing`` (no Ray at all)
    running the identical fused extraction at the same worker counts the
    Ray runs use for their extract pools. Its ratio isolates the VM's
    all-core frequency / memory-bandwidth / steal ceiling from engine
    overhead; ``normalized_efficiency = eff / control_ratio`` is the
    engine-attributable scaling number."""
    import glob
    import multiprocessing as mp

    files = sorted(glob.glob(os.path.join(turns_dir, "*.parquet")))

    def run(procs: int) -> dict:
        groups = [files[i::procs] for i in range(procs)]
        t0 = time.time()
        with mp.get_context("fork").Pool(procs) as pool:
            rows = sum(pool.map(_mp_worker, groups))
        sec = time.time() - t0
        return {"procs": procs, "sec": round(sec, 1),
                "rows_per_sec": round(rows / sec, 1)}

    lo, hi = run(lo_procs), run(hi_procs)
    ratio = (hi["rows_per_sec"] / lo["rows_per_sec"]) / (
        hi_procs / lo_procs
    )
    return {"lo": lo, "hi": hi, "control_ratio": round(ratio, 3)}


def main_scaling() -> dict:
    """Headline job in fresh processes at 8 and 32 CPUs (no query suite);
    corpus generated+cached by the first child, outside its timed region.

    Each level runs multiple trials and reports the MINIMUM wall time —
    the standard noise-robust estimator on shared hardware (this sandbox
    is a VM with measurable hypervisor steal time; noise only ever adds
    time, so min approximates the uncontended run). All trials are listed
    for transparency.
    """

    lo, hi = 8, 32
    # symmetric trial counts: min-of-trials estimates each level's quiet
    # window; an asymmetric count would give one side a better draw
    trials_lo = [_spawn("--headline-once", ncpu=lo) for _ in range(3)]
    trials_hi = [_spawn("--headline-once", ncpu=hi) for _ in range(3)]
    r_lo = min(trials_lo, key=lambda r: r["sec"])
    r_hi = min(trials_hi, key=lambda r: r["sec"])
    eff = (r_lo["sec"] / r_hi["sec"]) / (hi / lo)
    # same-epoch hardware control at the Ray runs' extract-pool sizes
    from texoo_ray.pipelines.extract import configure_shuffle, restore_shuffle

    conc_lo, prev = configure_shuffle(lo)
    restore_shuffle(prev)
    conc_hi, prev = configure_shuffle(hi)
    restore_shuffle(prev)
    ctl = _mp_control(bench_corpus_dir(), conc_lo, conc_hi)
    return {
        "metric": "scaling efficiency (N=8 vs 4N=32 cpus, fresh ray sessions, min of trials)",
        "sf": os.path.basename(os.path.normpath(SF_DIR)),
        "turns": r_lo["turns"],
        "sec_%d" % lo: r_lo["sec"],
        "sec_%d" % hi: r_hi["sec"],
        "trials_sec_%d" % lo: [r["sec"] for r in trials_lo],
        "trials_sec_%d" % hi: [r["sec"] for r in trials_hi],
        "turns_per_sec_%d" % lo: r_lo["turns_per_sec"],
        "turns_per_sec_%d" % hi: r_hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "mp_control": ctl,
        "normalized_efficiency": round(eff / ctl["control_ratio"], 3)
        if ctl["control_ratio"] > 0
        else None,
    }


HYBRID_PAIRS = [
    # (driver-local-path query, forced-distributed variant) — the hybrid
    # operators take the local branch under their row thresholds at
    # bench scale; the _dist variants pin a measured number on the
    # branch that matters at 100 TB (r4 verdict #5). Oracles are shared
    # (results identical by the path-equivalence contract).
    ("kcore6", "kcore6_dist"),
    ("bpe_merges", "bpe_merges_dist"),
    ("mst_chain", "mst_chain_dist"),
    ("textrank_keywords", "textrank_dist"),
]


def run_hybrid() -> dict:
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in [n for pair in HYBRID_PAIRS for n in pair]:
        t0 = time.time()
        res = qs[name](SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        out[name] = round(time.time() - t0, 3)
    return out


def main_hybrid_once() -> dict:
    ray = _ray_session()
    out = run_hybrid()
    ray.shutdown()
    return out


def main_hybrid() -> dict:
    """Local vs forced-distributed branch times for the hybrid operators
    (min of 2 fresh-session trials per query, same estimator as the
    query suite). Record the table in BASELINE.md."""
    trials = [_spawn("--hybrid-once") for _ in range(2)]
    merged = {
        k: min(t[k] for t in trials) for k in trials[0]
    }
    return {
        "metric": "hybrid operator local vs distributed branch",
        "sf": os.path.basename(os.path.normpath(SF_DIR)),
        "num_cpus": NUM_CPUS,
        "pairs": [
            {"op": a, "local_sec": merged[a], "distributed_sec": merged[b]}
            for a, b in HYBRID_PAIRS
        ],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(main_scaling()))
    elif "--headline-once" in sys.argv:
        print(json.dumps(main_headline_once()))
    elif "--queries-once" in sys.argv:
        print(json.dumps(main_queries_once()))
    elif "--hybrid-once" in sys.argv:
        print(json.dumps(main_hybrid_once()))
    elif "--hybrid" in sys.argv:
        print(json.dumps(main_hybrid()))
    else:
        print(json.dumps(main_bench()))
