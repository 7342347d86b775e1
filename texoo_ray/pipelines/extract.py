"""Flagship extraction pipeline.

Ray shape (SURVEY.md §3.1):

    read_parquet(turns)
      -> map_batches(ExtractStage, batch_format="pyarrow", concurrency=N)
      -> sort(["conv_id", "turn_idx"])        # stable turn ordering
      -> write_parquet(out_dir)               # partitioned, resumable

The sort is the only wide operation; everything else is embarrassingly
per-row. ``(conv_id, turn_idx)`` is unique by construction, so ordering is
total and independent of block boundaries (SURVEY.md §7.4). Skewed
conversations cost nothing here because the pipeline is per-turn; only
conversation-level group operations (pipelines.conversations) need salting.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from ..stages.extract import ExtractStage

def default_concurrency() -> int:
    """Actor-pool size that leaves CPU slots for shuffle aggregators and
    plain tasks — an actor pool that fills every core deadlocks next to a
    hash-shuffle exchange (see configure_shuffle)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, cpus - max(2, cpus // 5) - max(1, cpus // 8))


def extract_turns(
    ds,
    *,
    newlines: str = "keep",
    strip: bool = True,
    gazetteer_terms: Optional[Sequence[str]] = None,
    section_method: str = "nl",
    batch_size: int = 256,
    concurrency: Optional[int] = None,
    lean: bool = False,
):
    """Attach extraction columns to a turns Dataset (lazy)."""
    if concurrency is None:
        concurrency = default_concurrency()
    return ds.map_batches(
        ExtractStage,
        fn_constructor_kwargs=dict(
            newlines=newlines,
            strip=strip,
            gazetteer_terms=list(gazetteer_terms) if gazetteer_terms else None,
            section_method=section_method,
            lean=lean,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def ordered(ds):
    """Restore stable turn ordering (north rule): total sort on the unique
    key (conv_id, turn_idx)."""
    return ds.sort(["conv_id", "turn_idx"])


def ordered_by_conversation(ds, num_partitions: int = 64):
    """The north rule's literal shape — ``groupby(conv_id)`` exchange +
    in-group ``turn_idx`` sort — as a hash repartition on ``conv_id``
    followed by one vectorized per-block sort.

    Cheaper than the global range sort at scale: no sample pass, no
    sorted-run merge in the reduce (Ray's SortReduce spent ~230 CPU-s
    merging nested Arrow runs on the 2.8M-turn bench vs ~30 CPU-s for
    per-block ``Table.sort_by``). Each conversation lands wholly in one
    output block, sorted by turn within; cross-block order is by
    conv-hash, deterministic. Requires the hash shuffle strategy
    (``configure_shuffle``); falls back to the global sort otherwise.
    """
    import pyarrow as pa
    import ray.data
    from ray.data.context import ShuffleStrategy

    ctx = ray.data.DataContext.get_current()
    if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        return ordered(ds)

    def sort_block(b: pa.Table) -> pa.Table:
        return b.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])

    return ds.repartition(num_partitions, keys=["conv_id"]).map_batches(
        sort_block, batch_size=None, batch_format="pyarrow"
    )


def configure_shuffle(num_cpus: int, num_partitions: int = 64):
    """Enable the hash shuffle strategy with a bounded CPU budget for its
    aggregator actors; returns the extract-stage concurrency to use.

    Two deadlock modes observed without this:
    - the aggregator pool's CPU demand defaults to 0.0625 x partitions
      (e.g. 12.5 CPUs for a 200-partition groupby) — infeasible on small
      clusters, the exchange never schedules;
    - an actor pool that fills every remaining CPU starves the plain
      read/write tasks.
    So: cap aggregator CPUs to ~cpus/5 via the per-partition override and
    leave >=1 slot for tasks. Call ``restore_shuffle`` after the ordering
    exchange — other pipelines (groupbys with default partition counts)
    should run under the default sort-based strategy.
    """
    import ray.data
    from ray.data.context import ShuffleStrategy

    ctx = ray.data.DataContext.get_current()
    prev = (ctx.shuffle_strategy, ctx.max_hash_shuffle_aggregators,
            ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override)
    if num_cpus < 4:
        # not enough slots for actors + aggregators + tasks; the caller's
        # ordered_by_conversation falls back to the global sort
        return max(1, num_cpus - 1), prev
    agg_budget = max(1, (num_cpus + 2) // 5)  # 4->1, 8->2, 32->6
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.max_hash_shuffle_aggregators = agg_budget
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = (
        agg_budget / float(num_partitions)
    )
    task_reserve = max(1, num_cpus // 16)
    concurrency = max(1, num_cpus - agg_budget - task_reserve)
    return concurrency, prev


def restore_shuffle(prev) -> None:
    import ray.data

    ctx = ray.data.DataContext.get_current()
    (ctx.shuffle_strategy, ctx.max_hash_shuffle_aggregators,
     ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override) = prev


def run_extract(
    input_path,
    out_dir: str,
    *,
    columns: Optional[Sequence[str]] = None,
    sort_output: bool = True,
    drop_heavy: bool = True,
    **kwargs,
) -> int:
    """read -> extract -> (sort) -> write; returns row count."""
    import ray.data

    ds = ray.data.read_parquet(input_path, columns=list(columns) if columns else None)
    ds = extract_turns(ds, lean=drop_heavy, **kwargs)
    if sort_output:
        # hash exchange + per-block sort when the hash shuffle strategy is
        # configured (measured ~8x cheaper reduce CPU than the global
        # range sort, BASELINE.md); falls back to ordered() otherwise
        ds = ordered_by_conversation(ds)
    os.makedirs(out_dir, exist_ok=True)
    ds = ds.write_parquet(out_dir)
    import pyarrow.dataset as pads

    return pads.dataset(out_dir).count_rows()


def run_extract_resumable(
    input_files,
    out_dir: str,
    *,
    num_partitions: int = 16,
    max_concurrent: int = 4,
    sort_output: bool = True,
    partition_by_key: bool = False,
    **kwargs,
):
    """Checkpointed flagship run: per-partition lineage manifests, atomic
    rename, completed partitions skipped on rerun (state/lineage.py).

    The per-partition extract pool is ELASTIC and sized to its share of
    the actor budget (default_concurrency() / max_concurrent): with K
    partitions in flight, K fixed full-size pools would demand K x the
    CPU budget and deadlock waiting for actors that can never schedule.

    ``partition_by_key=True`` switches to the two-phase
    ``run_resumable_by_key`` conv-hash re-shard (SCALE.md "Ordering
    exchange"): use it when the input file layout does NOT co-locate
    conversations — each output partition then still holds whole,
    ordered conversations (pinned by tests/test_kill_resume.py's
    scattered-layout e2e).
    """
    from ..state.lineage import run_resumable, run_resumable_by_key

    if "concurrency" not in kwargs:
        share = max(1, default_concurrency() // max(1, max_concurrent))
        kwargs["concurrency"] = (1, share)

    def pipeline(ds):
        out = extract_turns(ds, **kwargs)
        if sort_output:
            out = ordered_by_conversation(out)
        return out

    if partition_by_key:
        return run_resumable_by_key(
            list(input_files),
            out_dir,
            pipeline,
            key_col="conv_id",
            num_buckets=num_partitions,
            max_concurrent=max_concurrent,
            counter_cols=("n_sentences", "n_tokens", "n_mentions"),
        )
    return run_resumable(
        list(input_files),
        out_dir,
        pipeline,
        num_partitions=num_partitions,
        max_concurrent=max_concurrent,
        counter_cols=("n_sentences", "n_tokens", "n_mentions"),
    )
