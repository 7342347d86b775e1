"""Skew handling: salted two-stage aggregation and per-group size caps."""

import pyarrow as pa


def test_salted_two_stage_aggregation(ray_session):
    """Hot-key aggregation: groupby((key, salt)) partials then merge —
    results equal the direct aggregate (SURVEY.md §7.3)."""
    import ray.data
    from ray.data.aggregate import Sum

    from texoo_ray.pipelines.conversations import salted_repartition

    rows = {"conv_id": [], "turn_idx": [], "x": []}
    for c, n in (("hot", 500), ("cold-a", 5), ("cold-b", 8)):
        for i in range(n):
            rows["conv_id"].append(c)
            rows["turn_idx"].append(i)
            rows["x"].append(i % 7)
    tbl = pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "x": pa.array(rows["x"], pa.int64()),
        }
    )
    ds = salted_repartition(ray.data.from_arrow(tbl), salt_buckets=4)
    stage1 = ds.groupby(["conv_id", "salt"]).aggregate(Sum("x", alias_name="x"))
    out = (
        stage1.groupby("conv_id")
        .aggregate(Sum("x", alias_name="sum_x"))
        .to_pandas()
        .set_index("conv_id")["sum_x"]
    )
    import pandas as pd

    direct = (
        tbl.to_pandas().groupby("conv_id")["x"].sum()
    )
    assert out.sort_index().tolist() == direct.sort_index().tolist()


def test_concat_conversations_cap(ray_session):
    """Pathological conversations are truncated at the cap, not OOMed."""
    import ray.data

    from texoo_ray.pipelines.conversations import concat_conversations

    rows = {
        "conv_id": ["big"] * 50 + ["small"] * 3,
        "turn_idx": list(range(50)) + list(range(3)),
        "role": ["user"] * 53,
        "text": ["t"] * 53,
    }
    tbl = pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "role": pa.array(rows["role"], pa.string()),
            "text": pa.array(rows["text"], pa.string()),
        }
    )
    out = (
        concat_conversations(ray.data.from_arrow(tbl), max_turns_per_group=10)
        .to_pandas()
        .set_index("conv_id")
    )
    assert out.loc["big", "n_turns"] == 10
    assert bool(out.loc["big", "truncated"]) is True
    assert out.loc["small", "n_turns"] == 3
    assert bool(out.loc["small", "truncated"]) is False


def test_heavy_tail_conversations_end_to_end(ray_session):
    """A conversation ~70x the median flows through extract + ordering
    with per-conversation integrity and order preserved (north-star skew
    requirement)."""
    import ray
    import ray.data

    from texoo_ray.pipelines.extract import extract_turns, ordered_by_conversation
    from texoo_ray.sources.turns import turns_table

    tbl = turns_table(0, 40, seed=42, mean_turns=48)  # heavy tail
    ds = ray.data.from_arrow(tbl).repartition(6)
    ds = extract_turns(ds, batch_size=256, concurrency=2, lean=True)
    out = ordered_by_conversation(ds, 8)  # falls back to sort w/o hash ctx
    blocks = [ray.get(r) for r in out.to_arrow_refs()]
    total = sum(b.num_rows for b in blocks)
    assert total == tbl.num_rows
    df = out.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    src = tbl.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert df["conv_id"].tolist() == src["conv_id"].tolist()
    assert df["turn_idx"].tolist() == src["turn_idx"].tolist()


def _hot_prefix_tables(n_names=240, dups=3):
    """Many distinct names sharing one 2-char prefix ("zq..."), each name
    carried by several ids — the planted hot-block case from the r3
    verdict (#3)."""
    import numpy as np

    names, ids = [], []
    i = 0
    for k in range(n_names):
        nm = "zq name%04d suffix" % k
        for _ in range(dups):
            names.append(nm)
            ids.append(i)
            i += 1
    # a couple of near-duplicate spellings that must fuzzy-match
    for k in range(0, n_names, 17):
        nm = "zq name%04d suffxi" % k  # swapped tail chars, JW >= 0.9
        names.append(nm)
        ids.append(i)
        i += 1
    return pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "name": pa.array(names, pa.string()),
        }
    )


def test_fuzzy_join_hot_block_salting(ray_session):
    """fuzzy_join with a low max_block_names (forcing the salted split)
    must produce exactly the same pair set as the unsalted path on a
    planted hot-prefix block."""
    import ray.data

    from texoo_ray.pipelines.joins import fuzzy_join

    tbl = _hot_prefix_tables(n_names=120, dups=2)
    left = ray.data.from_arrow(tbl)
    right = ray.data.from_arrow(
        tbl.set_column(0, "rid", tbl["id"]).rename_columns(["rid", "rname"])
    )

    def run(max_block_names):
        out = fuzzy_join(
            left,
            right,
            "id",
            "name",
            "rid",
            "rname",
            threshold=0.9,
            block_chars=2,
            max_block_names=max_block_names,
        ).to_pandas()
        return sorted(map(tuple, out[["l_id", "r_id", "sim_micro"]].values.tolist()))

    unsalted = run(0)  # 0 disables the hot-block pre-pass
    salted = run(30)  # every hot block forced through the salted split
    assert len(unsalted) > 0
    assert salted == unsalted


def test_entity_clusters_hot_block_salting(ray_session):
    """entity_clusters under forced cross-salt pairing must produce the
    same partition into clusters as the unsalted path."""
    import ray.data

    from texoo_ray.pipelines.joins import entity_clusters

    tbl = _hot_prefix_tables(n_names=90, dups=2)
    ds = ray.data.from_arrow(tbl)

    def run(max_block_names):
        df = entity_clusters(
            ds, "id", "name", threshold=0.9, block_chars=2,
            max_block_names=max_block_names,
        ).to_pandas()
        # canonical partition: frozenset of member-id frozensets
        return frozenset(
            frozenset(g["id"]) for _, g in df.groupby("cluster")
        )

    assert run(25) == run(0)
