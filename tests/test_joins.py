"""asof_join: vectorized per-key temporal merge (pipelines/joins.py).

Oracle-grade cases: strict vs at-or-before, unmatched-left nulls,
right-only keys dropped, equal-ts ties, multi-block inputs.
"""

import pandas as pd
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")


def _mk(rows, names, types):
    return pa.table(
        {n: pa.array([r[i] for r in rows], t) for i, (n, t) in enumerate(zip(names, types))}
    )


@pytest.fixture()
def sides(ray_session):
    left = _mk(
        [
            (1, 10, 100, "a"),
            (2, 10, 200, "b"),
            (3, 10, 300, "c"),
            (4, 20, 50, "d"),   # key with no right rows at all
            (5, 30, 100, "e"),  # right rows exist but all later
        ],
        ["lid", "k", "t", "pay"],
        [pa.int64(), pa.int64(), pa.int64(), pa.string()],
    )
    right = _mk(
        [
            (11, 10, 100, 1.5),  # == left t=100 (strict excludes)
            (12, 10, 150, 2.5),
            (13, 30, 500, 9.0),
            (14, 40, 10, 7.0),   # right-only key
        ],
        ["rid", "k", "t", "val"],
        [pa.int64(), pa.int64(), pa.int64(), pa.float64()],
    )
    return (
        ray.data.from_arrow(left).repartition(3),
        ray.data.from_arrow(right).repartition(2),
    )


def _run(sides, strict):
    from texoo_ray.pipelines.joins import asof_join

    l, r = sides
    out = asof_join(
        l, r, key="k", ts_col="t",
        left_cols=["lid", "t", "pay"], right_cols=["rid", "t", "val"],
        strict=strict,
    ).sort("lid").to_pandas()
    return out.set_index("lid")


def test_strict_backward(sides):
    out = _run(sides, strict=True)
    # t=100 strictly-before excludes the rid=11 row at exactly 100
    assert out.loc[1].isna()["rid_r"]
    assert out.loc[2, "rid_r"] == 12 and out.loc[2, "t_r"] == 150
    assert out.loc[3, "rid_r"] == 12
    assert out.loc[4].isna()["rid_r"]  # key 20: no right rows
    assert out.loc[5].isna()["rid_r"]  # key 30: right row is later
    assert 14 not in set(out["rid_r"].dropna())  # right-only key dropped
    assert list(out.index) == [1, 2, 3, 4, 5]
    assert out.loc[2, "val_r"] == 2.5 and out.loc[2, "pay"] == "b"


def test_at_or_before(sides):
    out = _run(sides, strict=False)
    assert out.loc[1, "rid_r"] == 11  # equal ts now matches
    assert out.loc[2, "rid_r"] == 12


def test_equal_ts_tie_takes_stable_last(ray_session):
    from texoo_ray.pipelines.joins import asof_join

    left = _mk([(1, 7, 100)], ["lid", "k", "t"],
               [pa.int64(), pa.int64(), pa.int64()])
    right = _mk(
        [(21, 7, 50), (22, 7, 50)],
        ["rid", "k", "t"],
        [pa.int64(), pa.int64(), pa.int64()],
    )
    out = asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        key="k", ts_col="t", left_cols=["lid", "t"], right_cols=["rid", "t"],
    ).to_pandas()
    # stable sort keeps input order; the LAST row at the winning ts wins
    assert out.loc[0, "rid_r"] == 22


def test_purchase_attribution_matches_duckdb(ray_session, tmp_path):
    import duckdb
    import numpy as np

    from texoo_ray.pipelines.joins import purchase_attribution

    rng = np.random.RandomState(7)
    n = 400
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.randint(0, 25, n), pa.int64()),
            "ts": pa.array(
                rng.randint(0, 10**9, n).astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(
                rng.choice(["click", "purchase", "view"], n), pa.string()
            ),
        }
    )
    p = str(tmp_path / "ev.parquet")
    import pyarrow.parquet as pq

    pq.write_table(tbl, p)
    ours = (
        purchase_attribution(ray.data.read_parquet(p))
        .sort("event_id")
        .to_pandas()
        .reset_index(drop=True)
    )
    oracle = duckdb.sql(
        f"""
        WITH p AS (SELECT event_id, user_id, ts FROM '{p}'
                   WHERE event_type='purchase'),
        c AS (SELECT max(event_id) AS event_id, user_id, ts FROM '{p}'
              WHERE event_type='click' GROUP BY user_id, ts)
        SELECT p.event_id, c.event_id AS click_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts > c.ts
        ORDER BY p.event_id
        """
    ).df()
    assert len(ours) == len(oracle) > 0
    for col in ["click_id", "gap_us"]:
        a, b = ours[col], oracle[col]
        assert bool(((a.isna() & b.isna()) | (a == b)).all()), col


def test_range_agg_join_boundaries(ray_session):
    from texoo_ray.pipelines.joins import range_agg_join

    left = _mk(
        [(1, 7, 100), (2, 7, 200), (3, 8, 100)],
        ["lid", "k", "t"],
        [pa.int64(), pa.int64(), pa.int64()],
    )
    # window 50: [t-50, t)
    right = _mk(
        [
            (21, 7, 50, 1.0),   # == 100-50 -> included for lid=1
            (22, 7, 100, 2.0),  # == left ts -> EXCLUDED for lid=1
            (23, 7, 199, 4.0),  # in window for lid=2
            (24, 9, 10, 8.0),   # right-only key dropped
        ],
        ["rid", "k", "t", "val"],
        [pa.int64(), pa.int64(), pa.int64(), pa.float64()],
    )
    out = (
        range_agg_join(
            ray.data.from_arrow(left).repartition(2),
            ray.data.from_arrow(right).repartition(2),
            key="k", ts_col="t", left_cols=["lid"],
            window_us=50, right_value_col="val",
        )
        .sort("lid")
        .to_pandas()
        .set_index("lid")
    )
    assert list(out.index) == [1, 2, 3]
    assert out.loc[1, "n_in_window"] == 1          # only rid=21
    assert out.loc[1, "sum_cents_in_window"] == 100
    assert out.loc[2, "n_in_window"] == 1          # window [150,200): only rid=23
    assert out.loc[2, "sum_cents_in_window"] == 400
    assert out.loc[3, "n_in_window"] == 0          # key 8: no right rows
    assert out.loc[3, "sum_cents_in_window"] == 0


def test_range_agg_join_matches_duckdb(ray_session, tmp_path):
    import duckdb
    import numpy as np
    import pyarrow.parquet as pq

    from texoo_ray.pipelines.joins import range_agg_join

    rng = np.random.RandomState(11)
    n = 500
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.randint(0, 20, n), pa.int64()),
            "t": pa.array(rng.randint(0, 10_000, n), pa.int64()),
            "kind": pa.array(rng.choice(["l", "r"], n), pa.string()),
            "value": pa.array(np.round(rng.rand(n) * 100, 2), pa.float64()),
        }
    )
    p = str(tmp_path / "rj.parquet")
    pq.write_table(tbl, p)
    ds = ray.data.read_parquet(p)
    ours = (
        range_agg_join(
            ds.filter(expr="kind == 'l'").select_columns(["event_id", "user_id", "t"]),
            ds.filter(expr="kind == 'r'").select_columns(["event_id", "user_id", "t", "value"]),
            key="user_id", ts_col="t", left_cols=["event_id"],
            window_us=500, right_value_col="value",
        )
        .sort("event_id")
        .to_pandas()
        .reset_index(drop=True)
    )
    oracle = duckdb.sql(
        f"""
        SELECT l.event_id,
               count(r.event_id)::BIGINT AS n_in_window,
               COALESCE(SUM(CAST(floor(r.value*100+0.5) AS BIGINT)),0)::BIGINT AS s
        FROM (SELECT * FROM '{p}' WHERE kind='l') l
        LEFT JOIN (SELECT * FROM '{p}' WHERE kind='r') r
          ON r.user_id = l.user_id AND r.t >= l.t - 500 AND r.t < l.t
        GROUP BY l.event_id ORDER BY l.event_id
        """
    ).df()
    assert len(ours) == len(oracle) > 0
    assert (ours["n_in_window"].values == oracle["n_in_window"].values).all()
    assert (ours["sum_cents_in_window"].values == oracle["s"].values).all()


def test_anti_and_semi_join(ray_session):
    from texoo_ray.pipelines.joins import anti_join

    left = _mk(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")],
        ["k", "pay"],
        [pa.int64(), pa.string()],
    )
    right = _mk(
        [(2, 0), (2, 1), (4, 2), (9, 3)],  # dup right keys + right-only key
        ["k", "junk"],
        [pa.int64(), pa.int64()],
    )
    l = ray.data.from_arrow(left).repartition(2)
    r = ray.data.from_arrow(right).repartition(3)
    anti = anti_join(l, r, key="k", left_cols=["pay"]).sort("k").to_pandas()
    assert list(anti["k"]) == [1, 3] and list(anti["pay"]) == ["a", "c"]
    semi = anti_join(l, r, key="k", left_cols=["pay"], semi=True).sort("k").to_pandas()
    assert list(semi["k"]) == [2, 4]
    # left duplicates survive an anti/semi join untouched
    l2 = ray.data.from_arrow(
        _mk([(1, "x"), (1, "y")], ["k", "pay"], [pa.int64(), pa.string()])
    )
    out = anti_join(l2, r, key="k", left_cols=["pay"]).sort("pay").to_pandas()
    assert list(out["pay"]) == ["x", "y"]


def test_range_agg_join_salted_equals_unsalted_on_hot_key(ray_session):
    """Time-range salting with boundary replication: ONE hot key holding
    every row must produce row-identical results to the unsalted path,
    across salt widths smaller than, equal to, and larger than the
    window (replication factor 1..many)."""
    import numpy as np

    from texoo_ray.pipelines.joins import range_agg_join

    rng = np.random.RandomState(5)
    nl, nr = 300, 400
    left = pa.table(
        {
            "lid": pa.array(np.arange(nl), pa.int64()),
            "k": pa.array(np.zeros(nl), pa.int64()),  # single hot key
            "t": pa.array(rng.randint(0, 5_000, nl), pa.int64()),
        }
    )
    right = pa.table(
        {
            "rid": pa.array(np.arange(nr), pa.int64()),
            "k": pa.array(np.zeros(nr), pa.int64()),
            "t": pa.array(rng.randint(0, 5_000, nr), pa.int64()),
            "val": pa.array(np.round(rng.rand(nr) * 9, 2), pa.float64()),
        }
    )

    def run(salt_us):
        return (
            range_agg_join(
                ray.data.from_arrow(left).repartition(3),
                ray.data.from_arrow(right).repartition(3),
                key="k", ts_col="t", left_cols=["lid"],
                window_us=250, right_value_col="val",
                salt_us=salt_us,
            )
            .sort("lid")
            .to_pandas()
            .reset_index(drop=True)
        )

    want = run(None)
    assert len(want) == nl
    for salt in (100, 250, 1_000):  # < window, == window, > window
        got = run(salt)
        pd.testing.assert_frame_equal(got, want)


def test_asof_join_salted_equals_unsalted_on_hot_key(ray_session):
    """Salted as-of join (bucketed exchange + prefix-best carry rows):
    row-identical to the unsalted path on a single-hot-key corpus, for
    both strictness modes, including buckets with no right rows (carry
    must skip over empty buckets) and unmatched-left nulls."""
    import numpy as np

    from texoo_ray.pipelines.joins import asof_join

    rng = np.random.RandomState(9)
    nl, nr = 250, 120
    # right rows clustered so many buckets are EMPTY on the right side
    rts = np.concatenate(
        [rng.randint(500, 900, nr // 2), rng.randint(6_000, 6_400, nr - nr // 2)]
    )
    left = pa.table(
        {
            "lid": pa.array(np.arange(nl), pa.int64()),
            "k": pa.array(np.zeros(nl), pa.int64()),
            "t": pa.array(rng.randint(0, 10_000, nl), pa.int64()),
        }
    )
    right = pa.table(
        {
            "rid": pa.array(np.arange(nr), pa.int64()),
            "k": pa.array(np.zeros(nr), pa.int64()),
            "t": pa.array(rts, pa.int64()),
            "v": pa.array(np.round(rng.rand(nr) * 5, 2), pa.float64()),
        }
    )

    def run(salt_us, strict):
        return (
            asof_join(
                ray.data.from_arrow(left).repartition(3),
                ray.data.from_arrow(right).repartition(3),
                key="k", ts_col="t",
                left_cols=["lid", "t"], right_cols=["rid", "t"],
                strict=strict, salt_us=salt_us,
            )
            .sort("lid")
            .to_pandas()
            .reset_index(drop=True)
        )

    for strict in (True, False):
        want = run(None, strict)
        assert len(want) == nl
        assert want["rid_r"].isna().any()  # unmatched lefts exist
        for salt in (300, 1_000, 5_000):
            got = run(salt, strict)
            pd.testing.assert_frame_equal(got, want)


def test_range_lookup_boundaries_and_misses(ray_session):
    import ray.data

    from texoo_ray.pipelines.joins import range_lookup

    tbl = pa.table(
        {
            "k": pa.array(list(range(8)), pa.int64()),
            "v": pa.array([-5, 0, 10, 11, 15, 20, 21, 100], pa.int64()),
        }
    )
    out = (
        range_lookup(
            ray.data.from_arrow(tbl).repartition(2),
            "v",
            [(0, 10, "a"), (15, 20, "b")],
        )
        .to_pandas()
        .sort_values("k")
    )
    # closed intervals: 0 and 10 in 'a'; 11 in the gap; 21/100 above; -5 below
    assert out["label"].tolist() == [None, "a", "a", None, "b", "b", None, None]


def test_range_lookup_rejects_overlap():
    import pytest

    from texoo_ray.pipelines.joins import range_lookup

    with pytest.raises(ValueError):
        range_lookup(None, "v", [(0, 10, "a"), (10, 20, "b")])
    with pytest.raises(ValueError):
        range_lookup(None, "v", [])


class TestIntervalOverlapJoin:
    @staticmethod
    def _brute(lrows, rrows, keyed=True):
        out = set()
        for lid, lk, llo, lhi in lrows:
            for rid, rk, rlo, rhi in rrows:
                if keyed and lk != rk:
                    continue
                if llo <= rhi and rlo <= lhi:
                    out.add((lid, rid))
        return out

    @staticmethod
    def _ds(rows):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "user_id": pa.array([r[1] for r in rows], pa.int64()),
                    "lo": pa.array([r[2] for r in rows], pa.int64()),
                    "hi": pa.array([r[3] for r in rows], pa.int64()),
                }
            )
        ).repartition(3)

    def _run(self, lrows, rrows, slab, keyed=True):
        from texoo_ray.pipelines.joins import interval_overlap_join

        out = interval_overlap_join(
            self._ds(lrows),
            self._ds(rrows),
            id_col="event_id",
            key_col="user_id" if keyed else None,
            slab_us=slab,
            n_buckets=8,
        ).take_all()
        return {(r["left_id"], r["right_id"]) for r in out}

    def test_dense_random_matches_brute_force_all_slabs(self, ray_session):
        import random

        rng = random.Random(7)

        def mk(base):
            rows = []
            for i in range(40):
                lo = rng.randrange(0, 500)
                rows.append(
                    (base + i, rng.randrange(3), lo, lo + rng.randrange(0, 120))
                )
            return rows

        lrows, rrows = mk(0), mk(100)
        want = self._brute(lrows, rrows)
        # slabs smaller than, comparable to, and larger than intervals:
        # replication + the owner-slab dedup must agree across all
        for slab in (7, 64, 1000):
            assert self._run(lrows, rrows, slab) == want, slab

    def test_touching_closed_boundaries_and_keyless(self, ray_session):
        lrows = [(1, 0, 100, 200)]
        rrows = [(2, 1, 200, 300), (3, 1, 201, 300), (4, 1, 0, 99)]
        # keyed: users differ -> no pairs
        assert self._run(lrows, rrows, 50) == set()
        # keyless: touching at 200 overlaps (closed), 201 and 99 don't
        assert self._run(lrows, rrows, 50, keyed=False) == {(1, 2)}

    def test_hi_below_lo_raises(self, ray_session):
        import pytest
        import ray.exceptions

        with pytest.raises(Exception):
            self._run([(1, 0, 10, 5)], [(2, 0, 0, 1)], 10)
