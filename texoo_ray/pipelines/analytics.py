"""Stream-shaped analytics over the events table (ordered, partitioned log).

Ray Data has no event-time windows; tumbling windows are
``GROUP BY (key, time_bucket)`` and sessions are a per-key sorted scan in
``map_groups`` (ray_guide: streaming-shaped workloads). Both have exact
SQL oracles.
"""

from __future__ import annotations

import numpy as np
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
        # Arrow-native per-batch combine (pandas groupby dropped null
        # keys; mirror that before group_by, which would keep them)
        import numpy as np

        if batch["event_type"].null_count:
            batch = batch.filter(pc.is_valid(batch["event_type"]))
        hours = pc.floor_temporal(batch["ts"], unit="hour")
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": hours,
                "n_events": pa.array(
                    np.ones(len(batch), np.int64), pa.int64()
                ),
                "sum_value": batch["value"],
            }
        )
        g = t.group_by(["event_type", "window_start"]).aggregate(
            [("n_events", "sum"), ("sum_value", "sum")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "window_start": g["window_start"],
                "n_events": g["n_events_sum"],
                "sum_value": g["sum_value_sum"],
            }
        )

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
        # dictionary-encode the type, replicate k window assignments,
        # one structured-unique count — no pandas frames per batch
        import numpy as np

        if batch["event_type"].null_count:
            batch = batch.filter(pc.is_valid(batch["event_type"]))
        et = batch["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            batch["ts"]
            .combine_chunks()
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        base = (ts // stride_us) * stride_us
        code_rep = np.tile(codes, k)
        win = np.concatenate([base - j * stride_us for j in range(k)])
        m = np.empty((len(code_rep), 2), np.int64)
        m[:, 0], m[:, 1] = code_rep, win
        mu, cnt = np.unique(
            m.view([("c", "<i8"), ("w", "<i8")]).ravel(), return_counts=True
        )
        return pa.table(
            {
                "event_type": et.dictionary.take(
                    pa.array(mu["c"], pa.int64())
                ),
                "window_start": pa.array(mu["w"], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_events": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n_events", alias_name="n_events"))
    )


def rolling_window_sum(
    ds,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    preceding: int = 4,
):
    """Per-key rolling ROWS window (SQL ``SUM(x) OVER (PARTITION BY key
    ORDER BY ts, id ROWS BETWEEN k PRECEDING AND CURRENT ROW)``):
    Dataset[(id, key, roll_cents)].

    ONE hash exchange on ``key``; inside each group a stable sort by
    (ts, id) then a prefix-sum difference computes every window at once
    — no per-row loop, no global sort.  Values are stabilized to integer
    cents BEFORE summing (per-row floor(x*100+0.5), then exact int64
    sums) so the result is bit-equal across engines regardless of float
    summation order.  Partitioning assumption: one key's rows fit in a
    group (salt hot keys by time range, replicating ``preceding`` rows
    across the boundary — SCALE.md).
    """
    import numpy as np

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch[value_col], 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table(
            {
                key: batch[key],
                id_col: batch[id_col],
                "__ts": batch[ts_col].cast(pa.int64()),
                "__cents": cents,
            }
        )

    def window(group: pa.Table) -> pa.Table:
        ts = np.asarray(group["__ts"].combine_chunks(), dtype=np.int64)
        ids = np.asarray(group[id_col].combine_chunks(), dtype=np.int64)
        cents = np.asarray(group["__cents"].combine_chunks(), dtype=np.int64)
        order = np.lexsort((ids, ts))
        c = cents[order]
        prefix = np.concatenate(([0], np.cumsum(c)))
        n = len(c)
        hi = np.arange(1, n + 1)
        lo = np.maximum(hi - (preceding + 1), 0)
        roll = prefix[hi] - prefix[lo]
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                key: group[key].take(pa.array(order)),
                "roll_cents": pa.array(roll),
            }
        )

    return (
        ds.map_batches(to_cents, batch_format="pyarrow")
        .groupby(key)
        .map_groups(window, batch_format="pyarrow")
    )


def grouped_quantiles(ds, group_col: str, value_col: str, qs=(0.25, 0.5, 0.75, 0.95)):
    """EXACT per-group quantiles over an integer domain
    (``percentile_disc(q) WITHIN GROUP ... GROUP BY group_col``):
    pandas DataFrame[(group_col, q, value_col)].

    Same histogram-inversion shape as the global quantile query: each
    batch emits (group, value) partial counts, one small groupby sums
    them, and the driver inverts the cumulative histogram per group —
    the data is never sorted or materialized; only the histogram
    (|groups| x |distinct values| rows, bounded for integer domains)
    leaves the cluster.  percentile_disc semantics: smallest value whose
    cumulative count reaches ceil(q*n).
    """
    import math

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                group_col: batch[group_col],
                value_col: pc.cast(batch[value_col], pa.int64()),
            }
        )
        grp = t.group_by([group_col, value_col]).aggregate([(value_col, "count")])
        return pa.table(
            {
                group_col: grp[group_col],
                value_col: grp[value_col],
                "n": pc.cast(grp[f"{value_col}_count"], pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, value_col])
        .aggregate(Sum("n", alias_name="n"))
        .sort([group_col, value_col])
        .to_pandas()
    )
    rows = []
    for g, sub in hist.groupby(group_col, sort=True):
        total = int(sub["n"].sum())
        cum = sub["n"].cumsum()
        for q in qs:
            target = math.ceil(q * total)
            val = int(sub[value_col][cum >= target].iloc[0])
            rows.append({group_col: g, "q": q, value_col: val})
    return pd.DataFrame(rows)


def sessionize(ds, gap_minutes: int = 30):
    """Session windows per user: Dataset[(user_id, n_sessions, n_events)].

    Two-level shape (no per-EVENT map_groups): each batch does a
    vectorized per-user sorted gap scan and emits one row per BATCH-LOCAL
    session interval [start, end] with its event count; the global
    groupby(user_id).map_groups then merges interval lists (two intervals
    belong to one session iff start2 - end1 <= gap — valid because the
    in-batch splits used the same gap). The shuffle moves per-user
    session-interval rows, not events, and the per-key group size is the
    user's interval count — bounded even for a user with millions of
    events spread over many blocks.
    """
    gap = pd.Timedelta(minutes=gap_minutes)
    gap_us = gap_minutes * 60 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow sort + numpy gap scan (no pandas round-trip on the
        # corpus-sized side): session boundaries are user changes or
        # ts gaps; sorted ts makes each session's start/end positional
        import numpy as np

        t = batch.select(["user_id", "ts"]).sort_by(
            [("user_id", "ascending"), ("ts", "ascending")]
        )
        n = t.num_rows
        ts_type = t.schema.field("ts").type
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], t.schema.field("user_id").type),
                    "sess_start": pa.array([], ts_type),
                    "sess_end": pa.array([], ts_type),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        uid = t["user_id"].combine_chunks()
        ts = (
            t["ts"]
            .combine_chunks()
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        new_user = pc.not_equal(uid.slice(1), uid.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        brk = new_user | (np.diff(ts) > gap_us)
        starts = np.concatenate([[0], np.flatnonzero(brk) + 1])
        ends = np.concatenate([starts[1:], [n]])
        take = pa.array(starts, pa.int64())
        return pa.table(
            {
                "user_id": uid.take(take),
                "sess_start": pa.array(ts[starts], pa.int64())
                .cast(pa.timestamp("us"))
                .cast(ts_type),
                "sess_end": pa.array(ts[ends - 1], pa.int64())
                .cast(pa.timestamp("us"))
                .cast(ts_type),
                "n_events": pa.array(
                    (ends - starts).astype(np.int64), pa.int64()
                ),
            }
        )

    def merge_bucket(group: pa.Table) -> pa.Table:
        # Block-local interval stitch for EVERY user in the bucket at once
        # (no per-user dispatch — r3 verdict #2). Sorted by (user, start),
        # merged-session ends are strictly increasing, so "continues the
        # running session" is exactly `start - prefix-cummax(end) <= gap`:
        # a break at interval i happens iff start_i exceeds the cummax of
        # all earlier ends for that user by more than `gap`.
        df = group.select(
            ["user_id", "sess_start", "sess_end", "n_events"]
        ).to_pandas()
        df = df.sort_values(["user_id", "sess_start"], kind="mergesort")
        same_user = df["user_id"].eq(df["user_id"].shift())
        prev_end = df.groupby("user_id", sort=False)["sess_end"].cummax().shift()
        new_sess = ~same_user | (df["sess_start"] - prev_end > gap)
        out = (
            df.assign(_ns=new_sess)
            .groupby("user_id", sort=False)
            .agg(n_sessions=("_ns", "sum"), n_events=("n_events", "sum"))
            .reset_index()
        )
        out["n_sessions"] = out["n_sessions"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        _user_buckets(ds.map_batches(partial, batch_format="pyarrow"), 64)
        .groupby("bucket")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


def props_stats(ds, key: str = "k"):
    """Semi-structured extraction + aggregate: pull the integer field
    ``key`` out of the JSON ``props`` column (vectorized RE2
    ``extract_regex``, no per-row json.loads) and aggregate per
    event_type — n_events, n_with_key, sum/min/max of the value.

    ASSUMES FLAT, INTEGER-VALUED JSON (the events.props shape): the
    regex matches ``"key": <int>`` anywhere in the string, so on nested
    JSON it would also hit keys at depth, inside string values it would
    hit quoted fragments, and non-integer values are skipped rather than
    truncated-then-matched. For general JSON swap the partial for a
    per-batch ``json.loads`` path (or Arrow's ``struct_field`` over a
    parsed column) — the aggregate shape stays identical.

    Scale shape: per-batch partial aggregation (one row per event_type
    per block) before a tiny global groupby — the JSON strings never
    leave the reading stage.  Returns Dataset sorted by event_type.
    """
    from ray.data.aggregate import Max, Min, Sum

    pat = r'"' + key + r'":\s*(?P<v>-?\d+)'

    def partial(batch: pa.Table) -> pa.Table:
        v = pc.struct_field(
            pc.extract_regex(pc.fill_null(batch["props"], ""), pat), "v"
        )
        vi = pc.cast(v, pa.int64())
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "v": vi,
                "has": pc.cast(pc.is_valid(vi), pa.int64()),
                "one": pa.array([1] * len(batch), pa.int64()),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [("one", "sum"), ("has", "sum"), ("v", "sum"), ("v", "min"), ("v", "max")]
        )
        return g.rename_columns(
            ["event_type", "n_events", "n_with_key", "sum_v", "min_v", "max_v"]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_with_key", alias_name="n_with_key"),
            Sum("sum_v", alias_name="sum_v"),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v"),
        )
        .sort("event_type")
    )


def _user_buckets(ds, n_buckets: int, user_col: str = "user_id"):
    """Attach a deterministic bucket from a multiplicative hash of the
    integer user id. One hash exchange on ``bucket`` then gives every
    per-user computation ALL of that user's rows in one block, with P
    map_groups calls total (not one per user) — the same
    per-group-overhead fix as the shingle bucketing in stages/dedup.py."""
    import numpy as np

    def add(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch[user_col], dtype=np.int64)
        b = (u * np.int64(2654435761)) % np.int64(n_buckets)
        return batch.append_column("bucket", pa.array(np.abs(b), pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def event_funnel(ds, steps=("view", "click", "purchase"), n_buckets: int = 64):
    """Ordered funnel: how many users performed step 1, then step 2
    STRICTLY AFTER their first step-1 event, then step 3 strictly after
    that (greedy first-occurrence chain — the standard funnel
    definition). Returns Dataset[(step, event_type, n_users)].

    Shape: ONE hash exchange co-locates each user's events; inside each
    bucket the whole chain is segmented-min numpy (np.minimum.at over
    user slots — no per-user Python); buckets emit |steps| count rows
    and a final tiny ``groupby(step).Sum`` folds them. Shuffle volume =
    the events table once, final aggregate is |steps| x buckets rows.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    steps = list(steps)
    INF = np.int64(1) << 62

    def scan(group: pa.Table) -> pa.Table:
        u = np.asarray(group["user_id"], dtype=np.int64)
        ts = np.asarray(group["ts"].cast(pa.int64()), dtype=np.int64)
        et = group["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        uu, inv = np.unique(u, return_inverse=True)
        prev = np.full(len(uu), -(INF), dtype=np.int64)  # step 0: no bound
        counts = []
        for s in steps:
            m = np.asarray(pc.equal(et, s)) & (ts > prev[inv])
            cur = np.full(len(uu), INF, dtype=np.int64)
            np.minimum.at(cur, inv[m], ts[m])
            counts.append(int((cur < INF).sum()))
            prev = cur
        return pa.table(
            {
                "step": pa.array(np.arange(1, len(steps) + 1), pa.int64()),
                "event_type": pa.array(steps, pa.string()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    return (
        _user_buckets(ds.select_columns(["user_id", "event_type", "ts"]), n_buckets)
        .groupby("bucket")
        .map_groups(scan, batch_format="pyarrow")
        .groupby(["step", "event_type"])
        .aggregate(Sum("n", alias_name="n_users"))
    )


def cohort_retention(ds, n_buckets: int = 64):
    """Cohort retention matrix: users grouped by first-activity day;
    ``n_users`` = distinct users of cohort ``cohort_day`` active
    ``day_offset`` days later. Returns
    Dataset[(cohort_day, day_offset, n_users)].

    Shape: the user-bucket exchange co-locates each user's events, so
    distinct-user counting is EXACT from per-bucket partial counts (a
    user never spans buckets) — the global aggregate only sums
    bucket-local (cohort, offset, n) rows, never sees user ids.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    def scan(group: pa.Table) -> pa.Table:
        u = np.asarray(group["user_id"], dtype=np.int64)
        ts = np.asarray(group["ts"].cast(pa.int64()), dtype=np.int64)
        day = ts // np.int64(86_400_000_000)
        uu, inv = np.unique(u, return_inverse=True)
        first = np.full(len(uu), np.int64(1) << 62, dtype=np.int64)
        np.minimum.at(first, inv, day)
        pairs = np.unique(np.stack([inv, day], axis=1), axis=0)
        cohort = first[pairs[:, 0]]
        off = pairs[:, 1] - cohort
        keys, n = np.unique(np.stack([cohort, off], axis=1), axis=0, return_counts=True)
        return pa.table(
            {
                "cohort_day": pa.array(keys[:, 0], pa.int64()),
                "day_offset": pa.array(keys[:, 1], pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    return (
        _user_buckets(ds.select_columns(["user_id", "ts"]), n_buckets)
        .groupby("bucket")
        .map_groups(scan, batch_format="pyarrow")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n", alias_name="n_users"))
    )


def watermark_late_events(
    ds,
    order_col: str = "event_id",
    ts_col: str = "ts_us",
    lateness_us: int = 300_000_000,
    keep_cols: tuple = ("user_id",),
    n_buckets: int = 4096,
):
    """Streaming watermark semantics over an arrival-ordered log: the
    watermark at arrival position i is ``max(ts)`` over all events with
    ``order_col`` <= i (inclusive running max — the
    ``max(ts) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING)`` window),
    and an event is LATE when its own timestamp trails the watermark by
    more than ``lateness_us``. Returns Dataset[(order_col, *keep_cols,
    late_us)] — the late events only, ``late_us = watermark - ts``.

    Scale shape — a distributed exact PREFIX SCAN, the same two-level
    trick as the rolling windows: events bucket by ``order_col`` range
    (``n_buckets`` fixed buckets); one grouped aggregate collects each
    bucket's max timestamp (driver receives n_buckets rows), the driver
    takes the EXCLUSIVE cumulative max as each bucket's carry-in, and a
    per-bucket pass combines the broadcast carry with the in-bucket
    inclusive running max. One exchange over the events; nothing
    corpus-sized on the driver. Size ``n_buckets`` so a bucket fits a
    worker (events/n_buckets rows); for truly unbounded logs apply the
    same scheme recursively over bucket ranges.
    """
    from ray.data.aggregate import Max, Min

    import numpy as np

    bounds = ds.aggregate(Min(order_col), Max(order_col))
    lo = bounds.get(f"min({order_col})")
    hi = bounds.get(f"max({order_col})")
    empty = pa.table(
        {
            order_col: pa.array([], pa.int64()),
            **{c: pa.array([], pa.int64()) for c in keep_cols},
            "late_us": pa.array([], pa.int64()),
        }
    )
    if lo is None or hi is None:
        import ray.data

        return ray.data.from_arrow(empty)
    width = max(1, (int(hi) - int(lo)) // n_buckets + 1)

    def bucketed(batch: pa.Table) -> pa.Table:
        order = np.asarray(batch[order_col], dtype=np.int64)
        b = (order - int(lo)) // width
        return batch.append_column("__bkt", pa.array(b, pa.int64()))

    keyed = ds.map_batches(bucketed, batch_format="pyarrow")
    bmax = (
        keyed.map_batches(
            lambda t: t.select(["__bkt", ts_col])
            .group_by(["__bkt"])
            .aggregate([(ts_col, "max")])
            .rename_columns(["__bkt", "m"]),
            batch_format="pyarrow",
        )
        .groupby("__bkt")
        .aggregate(Max("m", alias_name="m"))
        .to_pandas()
        .sort_values("__bkt")
    )
    carry = np.full(n_buckets + 1, np.iinfo(np.int64).min, np.int64)
    bk = bmax["__bkt"].to_numpy()
    mx = bmax["m"].to_numpy().astype(np.int64)
    run = np.iinfo(np.int64).min
    carry_map = {}
    for b, m in zip(bk, mx):
        carry_map[int(b)] = run  # EXCLUSIVE of this bucket
        run = max(run, int(m))

    def late_in_bucket(group: pa.Table) -> pa.Table:
        order = np.asarray(group[order_col], dtype=np.int64)
        ts = np.asarray(group[ts_col], dtype=np.int64)
        srt = np.argsort(order, kind="stable")
        ts_s = ts[srt]
        b = int((order[srt[0]] - int(lo)) // width)
        wm = np.maximum.accumulate(ts_s)
        cin = carry_map.get(b, np.iinfo(np.int64).min)
        if cin != np.iinfo(np.int64).min:
            wm = np.maximum(wm, cin)
        late_us = wm - ts_s
        mask = late_us > lateness_us
        if not mask.any():
            return empty
        idx = srt[mask]
        cols = {order_col: pa.array(order[idx], pa.int64())}
        for c in keep_cols:
            cols[c] = group[c].take(pa.array(idx))
        cols["late_us"] = pa.array(late_us[mask], pa.int64())
        return pa.table(cols)

    return keyed.groupby("__bkt").map_groups(
        late_in_bucket, batch_format="pyarrow"
    )


def grouped_moments(ds, group_col: str, value_col: str):
    """Exact second-moment sufficient statistics per group:
    Dataset[(group_col, n, sum_cents, sumsq_cents2)] where values are
    quantized to integer cents (floor(x*100+0.5)) BEFORE any summation —
    count/mean/variance then derive exactly on the caller's side with no
    float-accumulation order dependence (the scalar analogue of
    stages/knn.py::embedding_gram's quantize-then-sum trick; a float
    Welford pass would differ across block layouts).

    Scale shape: per-batch groupby partials (one row per group per
    block) into one small global groupby — shuffle volume is
    O(blocks x groups). int64 headroom: n * (100*max|x|)^2 < 2^63.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.asarray(
            pc.cast(
                pc.floor(pc.add(pc.multiply(batch[value_col], 100.0), 0.5)),
                pa.int64(),
            ),
            dtype=np.int64,
        )
        t = pa.table(
            {
                group_col: batch[group_col],
                "n": pa.array(np.ones(len(cents), np.int64), pa.int64()),
                "sum_cents": pa.array(cents, pa.int64()),
                "sumsq_cents2": pa.array(cents * cents, pa.int64()),
            }
        )
        grp = t.group_by([group_col]).aggregate(
            [("n", "sum"), ("sum_cents", "sum"), ("sumsq_cents2", "sum")]
        )
        return grp.rename_columns(
            [group_col, "n", "sum_cents", "sumsq_cents2"]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_cents", alias_name="sum_cents"),
            Sum("sumsq_cents2", alias_name="sumsq_cents2"),
        )
    )


def event_transitions(ds, n_buckets: int = 64):
    """First-order Markov transition counts over per-user event streams:
    for every user, order events by (ts, event_id) and count each
    consecutive (from_type, to_type) pair; return
    Dataset[(from_type, to_type, n)] — the session-flow / next-action
    model feeding funnel design and synthetic-session generation.

    Shape: the ONE user-bucket hash exchange (``_user_buckets``)
    co-locates each user's events; inside a bucket the whole scan is a
    lexsort + shifted-compare (transitions never cross the user
    boundary), and each bucket emits at most |event_types|^2 partial
    rows, so the global groupby is type-pair-sized regardless of
    corpus size. Ties on ts break by event_id, matching the SQL
    window ``ORDER BY ts, event_id`` exactly.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    def scan(group: pa.Table) -> pa.Table:
        u = np.asarray(group["user_id"], dtype=np.int64)
        ts = np.asarray(group["ts"].cast(pa.int64()), dtype=np.int64)
        eid = np.asarray(group["event_id"], dtype=np.int64)
        et = group["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        dic = enc.dictionary
        order = np.lexsort((eid, ts, u))
        u, codes = u[order], codes[order]
        same_user = u[1:] == u[:-1]
        frm = codes[:-1][same_user]
        to = codes[1:][same_user]
        if len(frm) == 0:
            return pa.table(
                {
                    "from_type": pa.array([], pa.string()),
                    "to_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        D = np.int64(len(dic))
        pair, cnt = np.unique(frm * D + to, return_counts=True)
        return pa.table(
            {
                "from_type": dic.take(pa.array(pair // D)),
                "to_type": dic.take(pa.array(pair % D)),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    return (
        _user_buckets(
            ds.select_columns(["user_id", "event_type", "ts", "event_id"]),
            n_buckets,
        )
        .groupby("bucket")
        .map_groups(scan, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def window_dedup(
    ds,
    window_us: int = 1_800_000_000,
    n_buckets: int = 64,
):
    """Time-window repeat suppression (log/telemetry dedup): drop an
    event when the SAME (user_id, event_type) occurred within the
    previous ``window_us`` microseconds — keep it only if it is the
    key's first event or the gap from the key's PREVIOUS event (kept or
    not) exceeds the window. Ordering ties break by event_id, matching
    the SQL window ``ORDER BY ts, event_id`` exactly, so exact
    duplicates (same key, same ts) collapse to one. Returns
    Dataset[(event_id, user_id, event_type)].

    Shape: the ONE user-bucket hash exchange (:func:`_user_buckets`)
    co-locates each user's events; inside a bucket the whole pass is a
    lexsort + shifted ts-compare over (user, type-code) runs — no
    per-key dispatch, the conversation-family idiom. The previous-
    occurrence (debounce) semantics — rather than previous-KEPT
    (throttle) — is what keeps the scan one shifted compare instead of
    a sequential chain, and is the window-function-expressible contract
    the oracle mirrors with lag()."""
    import numpy as np

    def scan(group: pa.Table) -> pa.Table:
        u = np.asarray(group["user_id"], dtype=np.int64)
        ts = np.asarray(group["ts"].cast(pa.int64()), dtype=np.int64)
        eid = np.asarray(group["event_id"], dtype=np.int64)
        et = group["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        order = np.lexsort((eid, ts, codes, u))
        su, sc, sts = u[order], codes[order], ts[order]
        same = np.zeros(len(order), dtype=bool)
        if len(order) > 1:
            same[1:] = (su[1:] == su[:-1]) & (sc[1:] == sc[:-1])
        gap_ok = np.ones(len(order), dtype=bool)
        if len(order) > 1:
            gap_ok[1:] = (sts[1:] - sts[:-1]) > window_us
        keep = ~same | gap_ok
        kept = order[keep]
        return pa.table(
            {
                "event_id": pa.array(eid[kept]),
                "user_id": pa.array(u[kept]),
                "event_type": et.take(pa.array(kept, pa.int64())),
            }
        )

    return (
        _user_buckets(ds.select_columns(
            ["event_id", "user_id", "event_type", "ts"]), n_buckets)
        .groupby("bucket")
        .map_groups(scan, batch_format="pyarrow")
    )


def mad_outliers(ds, value_col: str, id_col: str = "event_id", k: int = 5):
    """Median-absolute-deviation outlier detection (the Hampel filter —
    the robust data-contract outlier gate; unlike mean/stddev rules it
    doesn't let the outliers inflate their own threshold): flag rows
    where ``|x - median| > k * MAD`` with MAD = median of
    ``|x - median|``, both medians exact percentile_disc(0.5) over the
    int64 value domain. Returns Dataset[(id, value, dev)] of the
    outliers, sorted by id.

    Shape: ONE value-domain histogram aggregate (the grouped_quantiles
    budget — only (value, count) rows leave the cluster, never data
    rows); BOTH medians invert driver-side from that single histogram
    (the deviation histogram is a value transform of the value
    histogram, so no second corpus pass); then one row-local filter
    map. Two corpus scans total, one exchange.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[value_col], dtype=np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table(
            {
                "v": pa.array(u, pa.int64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"))
        .sort("v")
        .to_pandas()
    )
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            value_col: pa.array([], pa.int64()),
            "dev": pa.array([], pa.int64()),
        }
    )
    if len(hist) == 0:
        import ray.data

        return ray.data.from_arrow(empty)

    v = hist["v"].to_numpy()
    n = hist["n"].to_numpy()
    total = int(n.sum())

    def _disc_median(vals: np.ndarray, counts: np.ndarray) -> int:
        # percentile_disc(0.5): smallest value with cum >= ceil(n/2)
        order = np.argsort(vals, kind="stable")
        cum = np.cumsum(counts[order])
        tgt = (total + 1) // 2
        return int(vals[order][np.searchsorted(cum, tgt)])

    med = _disc_median(v, n)
    mad = _disc_median(np.abs(v - med), n)
    cut = k * mad

    def flag(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch[value_col], dtype=np.int64)
        dev = np.abs(x - med)
        keep = dev > cut
        return pa.table(
            {
                id_col: pa.array(
                    np.asarray(batch[id_col], dtype=np.int64)[keep], pa.int64()
                ),
                value_col: pa.array(x[keep], pa.int64()),
                "dev": pa.array(dev[keep], pa.int64()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow").sort(id_col)


def event_paths3(ds, top_k: int = 25, n_buckets: int = 64):
    """Top-``top_k`` most frequent consecutive 3-step event-type paths
    over per-user event streams (the sequence-mining extension of
    :func:`event_transitions` — second-order funnel discovery): for
    every user, order events by (ts, event_id) and count each
    consecutive (t1, t2, t3) triple; return Dataset[(t1, t2, t3, n)]
    ordered by (n desc, t1, t2, t3) — a total order, so the cut is
    deterministic and oracle-checkable.

    Shape: the ONE user-bucket hash exchange co-locates each user's
    events; inside a bucket the scan is a lexsort + two shifted
    compares (windows never cross the user boundary), and each bucket
    emits at most |event_types|^3 partial rows, so the global groupby
    is type-triple-sized regardless of corpus size.
    """
    from ray.data.aggregate import Sum

    def scan(group: pa.Table) -> pa.Table:
        u = np.asarray(group["user_id"], dtype=np.int64)
        ts = np.asarray(group["ts"].cast(pa.int64()), dtype=np.int64)
        eid = np.asarray(group["event_id"], dtype=np.int64)
        et = group["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        dic = enc.dictionary
        empty = pa.table(
            {
                "t1": pa.array([], pa.string()),
                "t2": pa.array([], pa.string()),
                "t3": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if len(u) < 3:
            return empty
        order = np.lexsort((eid, ts, u))
        u, codes = u[order], codes[order]
        m = (u[2:] == u[1:-1]) & (u[1:-1] == u[:-2])
        if not m.any():
            return empty
        a, b, c = codes[:-2][m], codes[1:-1][m], codes[2:][m]
        D = np.int64(len(dic))
        trip, cnt = np.unique((a * D + b) * D + c, return_counts=True)
        return pa.table(
            {
                "t1": dic.take(pa.array(trip // (D * D))),
                "t2": dic.take(pa.array((trip // D) % D)),
                "t3": dic.take(pa.array(trip % D)),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    return (
        _user_buckets(
            ds.select_columns(["user_id", "event_type", "ts", "event_id"]),
            n_buckets,
        )
        .groupby("bucket")
        .map_groups(scan, batch_format="pyarrow")
        .groupby(["t1", "t2", "t3"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "t1", "t2", "t3"], descending=[True, False, False, False])
        .limit(top_k)
    )


def rolling_median(
    ds,
    value_col: str,
    w: int = 2,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    n_buckets: int = 64,
):
    """Centered rolling median over per-user event streams (the
    median-filter despiker — robust time-series smoothing; the rolling
    sibling of :func:`mad_outliers`): for every row, the exact discrete
    median of the int64 ``value_col`` over the SQL frame ``ROWS BETWEEN
    w PRECEDING AND w FOLLOWING`` within the user partition ordered by
    (ts, id) — windows truncate at partition edges exactly as the SQL
    frame does, and the even-count median is the lower-middle element
    (index ceil(m/2)-1), verified element-identical to DuckDB's
    windowed quantile_disc(0.5). Returns Dataset[(id, value, med)]
    sorted by id.

    Shape: ONE user-bucket hash exchange co-locates each user's rows;
    inside a bucket the whole filter is a lexsort + a (n x 2w+1)
    shifted-gather matrix with one axis-1 sort — no per-row loop, no
    per-user dispatch. Memory is (2w+1) ints per row, so batches of
    any width stream fine.
    """

    def scan(group: pa.Table) -> pa.Table:
        u = np.asarray(group[user_col], dtype=np.int64)
        ts = np.asarray(group[ts_col].cast(pa.int64()), dtype=np.int64)
        eid = np.asarray(group[id_col], dtype=np.int64)
        x = np.asarray(group[value_col], dtype=np.int64)
        n = len(u)
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    value_col: pa.array([], pa.int64()),
                    "med": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((eid, ts, u))
        u, eid, x = u[order], eid[order], x[order]
        W = 2 * w + 1
        idx = np.arange(n, dtype=np.int64)
        mat = np.full((n, W), np.iinfo(np.int64).max, np.int64)
        m = np.zeros(n, np.int64)
        for col, j in enumerate(range(-w, w + 1)):
            src = idx + j
            ok = (src >= 0) & (src < n)
            s = np.clip(src, 0, n - 1)
            ok &= u[s] == u
            mat[ok, col] = x[s[ok]]
            m += ok
        srt = np.sort(mat, axis=1)
        med = srt[idx, (m + 1) // 2 - 1]
        return pa.table(
            {
                id_col: pa.array(eid, pa.int64()),
                value_col: pa.array(x, pa.int64()),
                "med": pa.array(med, pa.int64()),
            }
        )

    return (
        _user_buckets(
            ds.select_columns([user_col, ts_col, id_col, value_col]),
            n_buckets,
            user_col=user_col,
        )
        .groupby("bucket")
        .map_groups(scan, batch_format="pyarrow")
        .sort(id_col)
    )


def grouped_mad_outliers(
    ds,
    group_col: str,
    value_col: str,
    id_col: str = "event_id",
    k: int = 5,
):
    """Per-group Hampel / MAD outlier gate (the grouped form of
    :func:`mad_outliers` — each group gets its OWN robust threshold,
    so a high-variance group doesn't flag a low-variance group's
    normal rows): flag rows where ``|x - median_g| > k * MAD_g``,
    both per-group medians exact percentile_disc(0.5). Returns
    Dataset[(id, group, value, dev)] of the outliers, sorted by id.

    Shape: ONE (group × value-domain) histogram aggregate (the
    grouped_quantiles budget — bounded for integer domains); BOTH
    per-group medians invert driver-side from that single histogram;
    per-group thresholds broadcast in the filter closure
    (group-domain-sized) for one row-local filter map. Two corpus
    scans, one exchange — identical budget to the global gate.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        v = np.asarray(batch[value_col], dtype=np.int64)
        nd = len(enc.dictionary)
        key = codes * np.int64(2**32) + (v - np.int64(-(2**31)))
        # value domain must fit 32 bits for the packed key
        if len(v) and (v.min() < -(2**31) or v.max() >= 2**31):
            raise OverflowError(
                "grouped_mad_outliers: value outside 32-bit domain — "
                "bucket first"
            )
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                group_col: enc.dictionary.take(
                    pa.array(u // np.int64(2**32), pa.int64())
                ),
                "v": pa.array(
                    (u % np.int64(2**32)) + np.int64(-(2**31)), pa.int64()
                ),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "v"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            group_col: pa.array([], pa.string()),
            value_col: pa.array([], pa.int64()),
            "dev": pa.array([], pa.int64()),
        }
    )
    if len(hist) == 0:
        import ray.data

        return ray.data.from_arrow(empty)

    def _disc(vals: np.ndarray, counts: np.ndarray) -> int:
        order = np.argsort(vals, kind="stable")
        cum = np.cumsum(counts[order])
        tgt = (int(cum[-1]) + 1) // 2
        return int(vals[order][np.searchsorted(cum, tgt)])

    med_of, cut_of = {}, {}
    for grp, sub in hist.groupby(group_col, sort=False):
        v = sub["v"].to_numpy(np.int64)
        n = sub["n"].to_numpy(np.int64)
        m = _disc(v, n)
        med_of[grp] = m
        cut_of[grp] = k * _disc(np.abs(v - m), n)

    def flag(batch: pa.Table) -> pa.Table:
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        dic = enc.dictionary.to_pylist()
        med = np.array([med_of[s] for s in dic], np.int64)[codes]
        cut = np.array([cut_of[s] for s in dic], np.int64)[codes]
        x = np.asarray(batch[value_col], dtype=np.int64)
        dev = np.abs(x - med)
        keep = dev > cut
        return pa.table(
            {
                id_col: pa.array(
                    np.asarray(batch[id_col], dtype=np.int64)[keep],
                    pa.int64(),
                ),
                group_col: pc.cast(g, pa.string()).filter(pa.array(keep)),
                value_col: pa.array(x[keep], pa.int64()),
                "dev": pa.array(dev[keep], pa.int64()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow").sort(id_col)


def trimmed_stats(ds, group_col: str, value_col: str, trim_pct: int = 5):
    """Exact per-group trimmed statistics (drop the ``trim_pct``% 
    lowest and highest ROWS, k = n*pct//100 each side — the robust
    mean that survives fat tails without the Hampel gate's hard
    cutoff): Returns Dataset[(group, n, kept_n, trimmed_sum)] sorted
    by group, trimmed mean = trimmed_sum / kept_n left rational. Ties
    at the trim boundary drop an arbitrary k rows of the boundary
    value — the sum is identical whichever rows drop, so the result
    is still exact and SQL-mirrorable (row_number semantics).

    Shape: ONE (group × value-domain) histogram aggregate (the
    grouped_mad budget — integer domains only); the trim inverts
    driver-side per group from cumulative counts, including partial
    boundary cells. Only (group, value, count) rows cross the wire.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        v = np.asarray(batch[value_col], dtype=np.int64)
        if len(v) and (v.min() < -(2**31) or v.max() >= 2**31):
            raise OverflowError(
                "trimmed_stats: value outside 32-bit domain — bucket first"
            )
        key = codes * np.int64(2**32) + (v - np.int64(-(2**31)))
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                group_col: enc.dictionary.take(
                    pa.array(u // np.int64(2**32), pa.int64())
                ),
                "v": pa.array(
                    (u % np.int64(2**32)) + np.int64(-(2**31)), pa.int64()
                ),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "v"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    import ray.data

    if len(hist) == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "kept_n": pa.array([], pa.int64()),
                    "trimmed_sum": pa.array([], pa.int64()),
                }
            )
        )
    out = {group_col: [], "n": [], "kept_n": [], "trimmed_sum": []}
    for grp, sub in sorted(hist.groupby(group_col, sort=False), key=lambda t: t[0]):
        v = sub["v"].to_numpy(np.int64)
        c = sub["n"].to_numpy(np.int64)
        order = np.argsort(v, kind="stable")
        v, c = v[order], c[order]
        n = int(c.sum())
        k = n * trim_pct // 100
        cum = np.cumsum(c)
        lo_rank, hi_rank = k, n - k  # keep ranks (lo_rank, hi_rank]
        prev = np.concatenate([[0], cum[:-1]])
        take = np.minimum(cum, hi_rank) - np.maximum(prev, lo_rank)
        take = np.maximum(take, 0)
        out[group_col].append(grp)
        out["n"].append(n)
        out["kept_n"].append(int(take.sum()))
        out["trimmed_sum"].append(int((take * v).sum()))
    return ray.data.from_arrow(
        pa.table(
            {
                group_col: pa.array(out[group_col], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "kept_n": pa.array(out["kept_n"], pa.int64()),
                "trimmed_sum": pa.array(out["trimmed_sum"], pa.int64()),
            }
        )
    )


def cusum_changepoint(ds, group_col: str = "event_type", ts_col: str = "ts"):
    """Exact CUSUM change-point locator per group over hourly event
    counts (Page 1954 — the did-the-rate-shift monitoring primitive):
    for each group, with hourly counts x_1..x_T (sorted by hour),
    cum_t the prefix sum and ``total`` the grand sum, the deviation
    is the mean-free prefix statistic multiplied through by T to stay
    integer:

        dev_t = |T * cum_t - t * total|

    The change-point is the earliest hour attaining max dev_t.
    Returns Dataset[(group, n_buckets, total, max_dev, at_hour)]
    sorted by group — all int64, bit-equal to the SQL window mirror.

    Shape: per-batch (group, hour) count partials, ONE
    (groups × hours)-domain groupby, the scan runs driver-side on the
    domain-sized block (the ks_drift budget).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch[ts_col].cast(pa.int64()), dtype=np.int64)
        h = ts // np.int64(3_600_000_000)
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        key = codes * np.int64(2**40) + h
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                group_col: enc.dictionary.take(
                    pa.array(u // np.int64(2**40), pa.int64())
                ),
                "h": pa.array(u % np.int64(2**40), pa.int64()),
                "x": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "h"])
        .aggregate(Sum("x", alias_name="x"))
        .to_pandas()
    )
    import ray.data

    out = {group_col: [], "n_buckets": [], "total": [], "max_dev": [],
           "at_hour": []}
    for grp, sub in sorted(hist.groupby(group_col, sort=False),
                           key=lambda t: t[0]):
        h = sub["h"].to_numpy(np.int64)
        x = sub["x"].to_numpy(np.int64)
        order = np.argsort(h, kind="stable")
        h, x = h[order], x[order]
        n = len(x)
        total = int(x.sum())
        cum = np.cumsum(x)
        t = np.arange(1, n + 1, dtype=np.int64)
        dev = np.abs(n * cum - t * total)
        i = int(np.argmax(dev))  # argmax returns the FIRST maximum
        out[group_col].append(grp)
        out["n_buckets"].append(n)
        out["total"].append(total)
        out["max_dev"].append(int(dev[i]))
        out["at_hour"].append(int(h[i]))
    return ray.data.from_arrow(
        pa.table(
            {
                group_col: pa.array(out[group_col], pa.string()),
                "n_buckets": pa.array(out["n_buckets"], pa.int64()),
                "total": pa.array(out["total"], pa.int64()),
                "max_dev": pa.array(out["max_dev"], pa.int64()),
                "at_hour": pa.array(out["at_hour"], pa.int64()),
            }
        )
    )
