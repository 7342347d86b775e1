"""Ordering-exchange correctness: hash repartition + in-block sort
restores per-conversation turn order with conversations unsplit."""

import pyarrow as pa


def test_ordered_by_conversation_hash_path(ray_session):
    import ray.data
    from ray.data.context import ShuffleStrategy

    from texoo_ray.pipelines.extract import ordered_by_conversation
    from texoo_ray.sources.turns import turns_table

    ctx = ray.data.DataContext.get_current()
    prev_strategy = ctx.shuffle_strategy
    prev_agg = getattr(ctx, "max_hash_shuffle_aggregators", None)
    try:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        ctx.max_hash_shuffle_aggregators = 2
        tbl = turns_table(0, 40, seed=42)
        ds = ray.data.from_arrow(tbl).random_shuffle(seed=3).repartition(5)
        out = ordered_by_conversation(ds, num_partitions=4)
        blocks = [ray.get(ref) for ref in out.to_arrow_refs()]
    finally:
        ctx.shuffle_strategy = prev_strategy
        if prev_agg is not None:
            ctx.max_hash_shuffle_aggregators = prev_agg

    seen_convs = {}
    total = 0
    for bi, block in enumerate(blocks):
        if block.num_rows == 0:
            continue
        total += block.num_rows
        keys = list(zip(block["conv_id"].to_pylist(), block["turn_idx"].to_pylist()))
        assert keys == sorted(keys)  # in-block (conv, turn) order
        for c in set(k[0] for k in keys):
            assert seen_convs.setdefault(c, bi) == bi  # conv never split
    assert total == tbl.num_rows
    # every conversation's turns are complete and contiguous
    import collections

    per_conv = collections.Counter(k for k in tbl["conv_id"].to_pylist())
    got = collections.Counter()
    for block in blocks:
        got.update(block["conv_id"].to_pylist())
    assert got == per_conv


def test_ordered_fallback_without_hash(ray_session):
    import ray.data

    from texoo_ray.pipelines.extract import ordered_by_conversation
    from texoo_ray.sources.turns import turns_table

    ds = ray.data.from_arrow(turns_table(0, 10)).random_shuffle(seed=1)
    df = ordered_by_conversation(ds).to_pandas()
    keys = list(zip(df["conv_id"], df["turn_idx"]))
    assert keys == sorted(keys)  # falls back to the global sort
