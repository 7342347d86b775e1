"""conversation_stats value correctness vs a direct pandas aggregate."""

import pandas as pd
import pyarrow as pa


def test_conversation_stats_values(ray_session):
    import ray.data

    from texoo_ray.pipelines.conversations import conversation_stats
    from texoo_ray.sources.turns import turns_table

    tbl = turns_table(0, 25, seed=42)
    got = (
        conversation_stats(ray.data.from_arrow(tbl).repartition(4))
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    df = tbl.to_pandas()
    want = (
        df.groupby("conv_id")
        .agg(
            n_turns=("turn_idx", "size"),
            n_user=("role", lambda r: int((r == "user").sum())),
            n_assistant=("role", lambda r: int((r == "assistant").sum())),
            n_tool=("role", lambda r: int((r == "tool").sum())),
            first_ts=("ts", "min"),
            last_ts=("ts", "max"),
        )
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    for col in ("n_turns", "n_user", "n_assistant", "n_tool"):
        assert got[col].tolist() == want[col].tolist(), col
    assert got["first_ts"].astype("datetime64[us]").tolist() == want["first_ts"].astype("datetime64[us]").tolist()
    assert got["last_ts"].astype("datetime64[us]").tolist() == want["last_ts"].astype("datetime64[us]").tolist()
