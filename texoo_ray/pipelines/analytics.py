"""Stream-shaped analytics over the events table (ordered, partitioned log).

Ray Data has no event-time windows; tumbling windows are
``GROUP BY (key, time_bucket)`` and sessions are a per-key sorted scan in
``map_groups`` (ray_guide: streaming-shaped workloads). Both have exact
SQL oracles.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def hourly_windows(ds):
    """Tumbling 1h windows per event_type:
    Dataset[(event_type, window_start, n_events, sum_value)].

    Partial per batch (vectorized floor to hour + within-batch groupby),
    then a small global aggregate — the shuffle carries one row per
    (type, hour) per block.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        hours = pc.floor_temporal(batch["ts"], unit="hour")
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": hours,
                "n_events": pa.array([1] * len(batch), pa.int64()),
                "sum_value": batch["value"],
            }
        )
        df = t.to_pandas()
        g = (
            df.groupby(["event_type", "window_start"], sort=False)
            .agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
        )
    )

    # Fixed-point the float aggregate: partial-sum order differs from a
    # serial sum (and even float rounding differs between engines), so the
    # comparable output is integer cents. The event values are 2-decimal.
    def stable(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["sum_value"], 100.0), 0), pa.int64())
        i = batch.column_names.index("sum_value")
        return batch.set_column(i, "sum_value_cents", cents)

    return out.map_batches(stable, batch_format="pyarrow")


def sliding_windows(ds, size_minutes: int = 60, stride_minutes: int = 30):
    """Sliding windows per event_type:
    Dataset[(event_type, window_start, n_events)].

    Each event lands in ``size/stride`` windows; the per-batch transform
    emits one (type, window_start) partial count per window assignment,
    then a small global aggregate. Integer outputs (SQL-reproducible)."""
    assert size_minutes % stride_minutes == 0
    from ray.data.aggregate import Sum

    k = size_minutes // stride_minutes
    stride_us = stride_minutes * 60 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        ts = batch["ts"].to_pandas().astype("datetime64[us]").astype("int64")
        base = (ts // stride_us) * stride_us
        frames = []
        for j in range(k):
            frames.append(
                pd.DataFrame(
                    {
                        "event_type": batch["event_type"].to_pandas(),
                        "window_start": base - j * stride_us,
                    }
                )
            )
        df = pd.concat(frames, ignore_index=True)
        g = df.groupby(["event_type", "window_start"], sort=False).size().reset_index(name="n_events")
        g["window_start"] = g["window_start"].astype("datetime64[us]")
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n_events", alias_name="n_events"))
    )


def sessionize(ds, gap_minutes: int = 30):
    """Session windows per user: Dataset[(user_id, n_sessions, n_events)].

    groupby(user_id) -> in-group ts sort -> gap scan. Sessions split when
    the gap to the previous event exceeds ``gap_minutes``.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("ts")
        gaps = df["ts"].diff()
        n_sessions = int(1 + (gaps > gap).sum()) if len(df) else 0
        return pd.DataFrame(
            {
                "user_id": [df["user_id"].iloc[0]],
                "n_sessions": [n_sessions],
                "n_events": [len(df)],
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
