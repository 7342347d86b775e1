"""Relational pipelines: partial-agg Q1 shape, join+broadcast Q5 shape."""

import numpy as np
import pytest
import pyarrow as pa


def _lineitem():
    return pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
            "l_returnflag": ["A", "A", "N", "N"],
            "l_linestatus": ["F", "F", "O", "O"],
            "l_quantity": pa.array([2.0, 3.0, 1.0, 4.0]),
            "l_extendedprice": pa.array([10.005, 20.0, 5.5, 7.25]),
            "l_discount": pa.array([0.1, 0.0, 0.5, 0.0]),
        }
    )


class TestPricingSummary:
    def test_partial_agg_and_cents(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.relational import pricing_summary

        out = pricing_summary(ray.data.from_arrow(_lineitem()).repartition(2)).to_pandas()
        af = out[(out["l_returnflag"] == "A")].iloc[0]
        # cents are floor(x*100+0.5): 10.005 -> 1001 (not banker's 1000)
        assert af["sum_base_cents"] == 1001 + 2000
        # disc: 10.005*0.9=9.0045 -> 900 cents; 20.0 -> 2000
        assert af["sum_disc_cents"] == 900 + 2000
        assert af["sum_qty"] == 5 and af["n_rows"] == 2


class TestRevenueByNation:
    def test_join_broadcast_shape(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.relational import revenue_by_nation

        orders = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([10, 20, 10], pa.int64()),
            }
        )
        customer = pa.table(
            {
                "c_custkey": pa.array([10, 20], pa.int64()),
                "c_nationkey": pa.array([0, 1], pa.int64()),
            }
        )
        nation = pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int64()),
                "n_name": ["ALPHA", "BETA"],
            }
        )
        out = revenue_by_nation(
            ray.data.from_arrow(_lineitem()).repartition(2),
            ray.data.from_arrow(orders),
            customer,
            nation,
            num_partitions=4,
        ).to_pandas()
        by = out.set_index("n_name")["revenue_cents"]
        # ALPHA: orders 1 (900+2000) + 3 (725); BETA: order 2 (5.5*0.5=2.75 -> 275)
        assert by["ALPHA"] == 900 + 2000 + 725
        assert by["BETA"] == 275

    def test_join_with_empty_hash_partitions(self, ray_session):
        """num_partitions above key cardinality: Ray 2.49's hash join
        emits schema-less empty blocks for empty partitions (see
        stages/dedup.py::_compact) and oversized partition counts starve
        the 4-cpu test session — revenue_by_nation must clamp via
        _join_partitions AND survive the empty blocks."""
        import ray.data

        from texoo_ray.pipelines.relational import revenue_by_nation

        orders = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([10, 20, 10], pa.int64()),
            }
        )
        customer = pa.table(
            {
                "c_custkey": pa.array([10, 20], pa.int64()),
                "c_nationkey": pa.array([0, 1], pa.int64()),
            }
        )
        nation = pa.table(
            {"n_nationkey": pa.array([0, 1], pa.int64()), "n_name": ["ALPHA", "BETA"]}
        )
        out = revenue_by_nation(
            ray.data.from_arrow(_lineitem()),
            ray.data.from_arrow(orders),
            customer,
            nation,
            num_partitions=12,
        ).to_pandas()
        assert out.set_index("n_name")["revenue_cents"]["ALPHA"] == 900 + 2000 + 725


class TestRegionPartRevenue:
    def test_star_join_composed_dims(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.relational import region_part_revenue

        part = pa.table(
            {"p_partkey": pa.array([100, 200], pa.int64()), "p_type": ["BRASS", "TIN"]}
        )
        supplier = pa.table(
            {
                "s_suppkey": pa.array([7, 8], pa.int64()),
                "s_nationkey": pa.array([0, 1], pa.int64()),
            }
        )
        nation = pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int64()),
                "n_regionkey": pa.array([5, 6], pa.int64()),
            }
        )
        region = pa.table(
            {"r_regionkey": pa.array([5, 6], pa.int64()), "r_name": ["EAST", "WEST"]}
        )
        lineitem = pa.table(
            {
                "l_partkey": pa.array([100, 100, 200], pa.int64()),
                "l_suppkey": pa.array([7, 8, 8], pa.int64()),
                "l_extendedprice": pa.array([10.0, 20.0, 30.0]),
                "l_discount": pa.array([0.0, 0.5, 0.0]),
            }
        )
        out = region_part_revenue(
            ray.data.from_arrow(lineitem).repartition(2), part, supplier, nation, region
        ).to_pandas()
        idx = out.set_index(["r_name", "p_type"])["revenue_cents"]
        assert idx[("EAST", "BRASS")] == 1000
        assert idx[("WEST", "BRASS")] == 1000  # 20 * 0.5
        assert idx[("WEST", "TIN")] == 3000


class TestCentsCrossEngine:
    def test_cents_bit_equal_to_duckdb(self):
        """floor(x*(1-d)*100+0.5) must produce the identical BIGINT in
        numpy and DuckDB for arbitrary doubles — the property the
        revenue oracles rest on (IEEE ops only, no round())."""
        import duckdb
        import numpy as np
        from hypothesis import given, settings, strategies as st

        con = duckdb.connect()

        @settings(max_examples=200, deadline=None)
        @given(
            st.floats(0, 1e7, allow_nan=False, allow_infinity=False),
            st.floats(0, 1, allow_nan=False, allow_infinity=False),
        )
        def check(price, disc):
            ours = int(np.floor(np.float64(price) * (1.0 - np.float64(disc)) * 100.0 + 0.5))
            sql = con.execute(
                "SELECT CAST(floor(?::DOUBLE * (1 - ?::DOUBLE) * 100 + 0.5) AS BIGINT)",
                [price, disc],
            ).fetchone()[0]
            assert ours == sql, (price, disc)

        check()


def test_snapshot_diff(ray_session):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from texoo_ray.pipelines.relational import snapshot_diff

    old = ray.data.from_items(
        [{"k": i, "v": f"val{i}"} for i in range(10)]
    ).repartition(3)
    new = ray.data.from_items(
        # 0..7 kept (5 changed), 8-9 removed, 100 added
        [{"k": i, "v": ("CHANGED" if i == 5 else f"val{i}")} for i in range(8)]
        + [{"k": 100, "v": "brand new"}]
    ).repartition(2)

    def val(batch: pa.Table):
        return pc.cast(batch["v"], pa.string())

    got = {
        r["k"]: r["change"]
        for r in snapshot_diff(old, new, "k", val).take_all()
    }
    assert got == {5: "changed", 8: "removed", 9: "removed", 100: "added"}


def test_snapshot_diff_identical_snapshots_empty(ray_session):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from texoo_ray.pipelines.relational import snapshot_diff

    rows = [{"k": i, "v": str(i * 3)} for i in range(20)]
    a = ray.data.from_items(rows).repartition(4)
    b = ray.data.from_items(rows).repartition(1)

    def val(batch: pa.Table):
        return pc.cast(batch["v"], pa.string())

    assert snapshot_diff(a, b, "k", val).take_all() == []


def test_pivot_wide_matches_hand_computed(ray_session):
    import ray.data

    from texoo_ray.pipelines.relational import pivot_wide

    tbl = pa.table(
        {
            "y": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
            "p": pa.array(["A", "B", "A", "B", "B", "C"], pa.string()),
            "v": pa.array([10, 20, 5, 7, 3, 1], pa.int64()),
        }
    )
    out = pivot_wide(
        ray.data.from_arrow(tbl).repartition(3), "y", "p", "v"
    ).to_pandas()
    assert list(out.columns) == ["y", "v_a", "v_b", "v_c", "n_rows"]
    assert out["y"].tolist() == [1, 2]
    assert out["v_a"].tolist() == [15, 0]
    assert out["v_b"].tolist() == [20, 10]
    assert out["v_c"].tolist() == [0, 1]
    assert out["n_rows"].tolist() == [3, 3]


def test_pivot_wide_explicit_values_ignores_others(ray_session):
    import ray.data

    from texoo_ray.pipelines.relational import pivot_wide

    tbl = pa.table(
        {
            "y": pa.array([1, 1], pa.int64()),
            "p": pa.array(["A", "Z"], pa.string()),
            "v": pa.array([10, 99], pa.int64()),
        }
    )
    out = pivot_wide(
        ray.data.from_arrow(tbl), "y", "p", "v", col_values=["A", "B"]
    ).to_pandas()
    assert out["v_a"].tolist() == [10]
    assert out["v_b"].tolist() == [0]
    assert out["n_rows"].tolist() == [1]  # the Z row is outside the domain


def test_pivot_wide_name_collision_raises(ray_session):
    import pytest
    import ray.data

    from texoo_ray.pipelines.relational import pivot_wide

    tbl = pa.table(
        {
            "y": pa.array([1], pa.int64()),
            "p": pa.array(["a b"], pa.string()),
            "v": pa.array([1], pa.int64()),
        }
    )
    with pytest.raises(ValueError):
        pivot_wide(ray.data.from_arrow(tbl), "y", "p", "v",
                   col_values=["a b", "a-b"])


def test_unpivot_long_melts_with_zero_fill(ray_session):
    import ray.data

    from texoo_ray.pipelines.relational import unpivot_long

    tbl = pa.table(
        {
            "y": pa.array([1, 2], pa.int64()),
            "v_a": pa.array([10, 0], pa.int64()),
            "v_b": pa.array([0, 7], pa.int64()),
        }
    )
    out = (
        unpivot_long(ray.data.from_arrow(tbl).repartition(2), ["y"],
                     ["v_a", "v_b"])
        .to_pandas()
        .sort_values(["y", "name"])
        .reset_index(drop=True)
    )
    assert list(zip(out["y"], out["name"], out["value"])) == [
        (1, "v_a", 10), (1, "v_b", 0), (2, "v_a", 0), (2, "v_b", 7),
    ]


def test_global_rank_matches_sql_rank_semantics(ray_session):
    import ray.data

    from texoo_ray.pipelines.relational import global_rank

    vals = [5, -3, 5, 0, 7, -3, -3]
    tbl = pa.table(
        {
            "k": pa.array(list(range(len(vals))), pa.int64()),
            "v": pa.array(vals, pa.int64()),
        }
    )
    out = (
        global_rank(ray.data.from_arrow(tbl).repartition(3), "v", "k")
        .to_pandas()
        .sort_values("k")
    )
    # rank() = 1 + count strictly smaller; ties share
    want = [1 + sum(1 for x in vals if x < v) for v in vals]
    assert out["rnk"].tolist() == want


class TestBasketPairs:
    def test_vs_brute_force(self, ray_session):
        import math
        from collections import Counter

        import ray.data

        from texoo_ray.pipelines.relational import basket_pairs

        baskets = {
            1: [10, 20, 30],
            2: [20, 30],
            3: [10, 20, 30, 40],
            4: [40],
            5: [20, 30, 20],  # duplicate item collapses
        }
        o, p = [], []
        for k, items in baskets.items():
            for it in items:
                o.append(k)
                p.append(it)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "l_orderkey": pa.array(o, pa.int64()),
                    "l_partkey": pa.array(p, pa.int64()),
                }
            )
        ).repartition(3)
        out = basket_pairs(ds, top_k=10, n_buckets=4).to_pandas()

        co = Counter()
        nb = Counter()
        for items in baskets.values():
            s = sorted(set(items))
            nb.update(s)
            for i in range(len(s)):
                for j in range(i + 1, len(s)):
                    co[(s[i], s[j])] += 1
        ref = []
        for (a, b), c in co.items():
            cos = math.floor(
                c / math.sqrt(float(nb[a] * nb[b])) * 1e6 + 0.5
            )
            ref.append((a, b, c, nb[a], nb[b], cos))
        ref.sort(key=lambda r: (-r[2], r[0], r[1]))
        got = [tuple(r) for r in out.itertuples(index=False)]
        assert got == ref[:10]
        # (20, 30) share baskets 1, 2, 3 and 5 and top the list
        assert got[0][:3] == (20, 30, 4)


class TestAssociationRules:
    def test_vs_brute_force(self, ray_session):
        import math
        from collections import Counter

        import ray.data

        from texoo_ray.pipelines.relational import association_rules

        baskets = {
            1: [10, 20],
            2: [10, 20, 30],
            3: [10, 20],
            4: [10, 40],
            5: [20, 30],
            6: [30, 40],
        }
        o, p = [], []
        for k, items in baskets.items():
            for it in items:
                o.append(k)
                p.append(it)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "l_orderkey": pa.array(o, pa.int64()),
                    "l_partkey": pa.array(p, pa.int64()),
                }
            )
        ).repartition(3)
        out = association_rules(
            ds, min_support=2, top_k=20, n_buckets=4
        ).to_pandas()

        co = Counter()
        nb = Counter()
        for items in baskets.values():
            s = sorted(set(items))
            nb.update(s)
            for i in range(len(s)):
                for j in range(i + 1, len(s)):
                    co[(s[i], s[j])] += 1
        N = len(baskets)
        ref = []
        for (x, y), c in co.items():
            if c < 2:
                continue
            for a, b in ((x, y), (y, x)):
                conf = math.floor(c / nb[a] * 1e6 + 0.5)
                lift = math.floor(c * N / (nb[a] * nb[b]) * 1e6 + 0.5)
                ref.append((a, b, c, nb[a], nb[b], conf, lift))
        ref.sort(key=lambda r: (-r[5], r[0], r[1]))
        got = [tuple(r) for r in out.itertuples(index=False)]
        assert got == ref[:20]
        # 10 -> 20 has confidence 3/4; 20 -> 10 has 3/4 as well
        top = {(r[0], r[1]): (r[5], r[6]) for r in got}
        assert top[(10, 20)][0] == 750000
        # lift of the 10<->20 rule: 3 * 6 / (4 * 4) = 1.125
        assert top[(10, 20)][1] == 1125000

    def test_mega_basket_truncation_matches_duckdb(self, ray_session):
        """Planted degenerate basket: max_basket_size truncation keeps
        each basket's smallest item ids, mirrored in DuckDB via a
        row_number window — and bounds the pair blowup (a 400-item
        basket would emit 79800 pairs; truncated at 12 it emits 66)."""
        import duckdb
        import ray.data

        from texoo_ray.pipelines.relational import basket_pairs

        rng = np.random.RandomState(3)
        o = [1] * 400 + list(rng.randint(2, 40, 300))
        p = list(rng.randint(5000, 9000, 400)) + list(
            rng.randint(100, 140, 300)
        )
        tbl = pa.table(
            {
                "l_orderkey": pa.array(np.asarray(o, np.int64), pa.int64()),
                "l_partkey": pa.array(np.asarray(p, np.int64), pa.int64()),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(4)
        cap = 12
        out = basket_pairs(
            ds, top_k=500, n_buckets=4, max_basket_size=cap
        ).to_pandas()
        con = duckdb.connect()
        con.register("li", tbl)
        ref = con.execute(
            """
            WITH trunc AS (
              SELECT o, p FROM (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM li
              ) QUALIFY row_number() OVER (PARTITION BY o ORDER BY p) <= %d
            ), cnt AS (
              SELECT p, count(*) AS n FROM trunc GROUP BY p
            ), pairs AS (
              SELECT t1.p AS a, t2.p AS b, count(*) AS co
              FROM trunc t1 JOIN trunc t2 ON t1.o = t2.o AND t1.p < t2.p
              GROUP BY t1.p, t2.p
            )
            SELECT a, b, co, ca.n AS n_a, cb.n AS n_b,
                   CAST(floor(co / sqrt(CAST(ca.n * cb.n AS DOUBLE)) * 1e6
                        + 0.5) AS BIGINT) AS cosine_micro
            FROM pairs JOIN cnt ca ON pairs.a = ca.p
                       JOIN cnt cb ON pairs.b = cb.p
            ORDER BY co DESC, a, b LIMIT 500
            """
            % cap
        ).df()
        got = [tuple(r) for r in out.itertuples(index=False)]
        exp = [tuple(r) for r in ref.itertuples(index=False)]
        assert got == exp
        # the planted basket contributed at most C(cap,2) pairs
        mega_items = set(np.asarray(p[:400], np.int64))
        mega_pairs = [
            g for g in got if g[0] in mega_items and g[1] in mega_items
        ]
        assert len(mega_pairs) <= cap * (cap - 1) // 2

    def test_apriori_pruning_path_equivalence(self, ray_session):
        """prune_items=True returns bit-identical rules on a Zipfian
        item domain where most items are singletons (the pruning
        target), and on the uniform small case."""
        import ray.data

        from texoo_ray.pipelines.relational import association_rules

        rng = np.random.RandomState(11)
        # zipfian: a few hot items + a long singleton tail
        o = np.repeat(np.arange(1, 201), 5)
        hot = rng.randint(10, 20, 600)
        tail = np.arange(10_000, 10_400)
        p = np.concatenate([hot, tail])
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "l_orderkey": pa.array(o, pa.int64()),
                    "l_partkey": pa.array(p, pa.int64()),
                }
            )
        ).repartition(4)
        base = association_rules(
            ds, min_support=2, top_k=100, n_buckets=4
        ).to_pandas()
        pruned = association_rules(
            ds, min_support=2, top_k=100, n_buckets=4, prune_items=True
        ).to_pandas()
        assert [tuple(r) for r in base.itertuples(index=False)] == [
            tuple(r) for r in pruned.itertuples(index=False)
        ]
        assert len(base) > 0

    def test_model_max_guard_raises(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.relational import (
            association_rules,
            basket_pairs,
        )

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "l_orderkey": pa.array(np.arange(50), pa.int64()),
                    "l_partkey": pa.array(np.arange(50) % 20, pa.int64()),
                }
            )
        )
        with pytest.raises(ValueError, match="model_max"):
            basket_pairs(ds, n_buckets=2, model_max=5).to_pandas()
        with pytest.raises(ValueError, match="model_max"):
            association_rules(ds, n_buckets=2, model_max=5).to_pandas()



class TestCorrPairs:
    def test_vs_numpy(self, ray_session):
        import math

        import ray.data

        from texoo_ray.pipelines.relational import corr_pairs

        rng = np.random.RandomState(5)
        x = rng.randint(0, 100, 200)
        y = 3 * x + rng.randint(-20, 21, 200)  # strong positive corr
        z = rng.randint(0, 100, 200)  # independent
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "x": pa.array(x, pa.int64()),
                    "y": pa.array(y, pa.int64()),
                    "z": pa.array(z, pa.int64()),
                }
            )
        ).repartition(4)
        out = (
            corr_pairs(ds, ["x", "y", "z"])
            .to_pandas()
            .set_index(["x_col", "y_col"])
        )
        assert len(out) == 3
        for (a, b), arr in {
            ("x", "y"): (x, y),
            ("x", "z"): (x, z),
            ("y", "z"): (y, z),
        }.items():
            u, v = arr
            r = out.loc[(a, b)]
            n = len(u)
            num = n * int((u * v).sum()) - int(u.sum()) * int(v.sum())
            denx = n * int((u * u).sum()) - int(u.sum()) ** 2
            deny = n * int((v * v).sum()) - int(v.sum()) ** 2
            exp = math.floor(
                float(num) / math.sqrt(float(denx) * float(deny)) * 1e6 + 0.5
            )
            assert r["r_micro"] == exp
            ref = np.corrcoef(u, v)[0, 1]
            assert abs(r["r_micro"] / 1e6 - ref) < 1e-5
        assert out.loc[("x", "y")]["r_micro"] > 900_000
        assert abs(out.loc[("x", "z")]["r_micro"]) < 200_000


class TestCategoricalMI:
    def test_vs_brute_force(self, ray_session):
        import math
        from collections import Counter

        import ray.data

        from texoo_ray.pipelines.relational import categorical_mi

        # y is a deterministic function of x in half the rows
        rng = np.random.RandomState(9)
        xs = rng.choice(["a", "b", "c"], 300).tolist()
        ys = [
            x.upper() if i % 2 == 0 else rng.choice(["P", "Q"])
            for i, x in enumerate(xs)
        ]
        ds = ray.data.from_arrow(
            pa.table({"x": xs, "y": ys})
        ).repartition(4)
        r = categorical_mi(ds, "x", "y").to_pandas().iloc[0]

        cxy, cx, cy = Counter(zip(xs, ys)), Counter(xs), Counter(ys)
        n = len(xs)
        mi = sum(
            c
            * math.floor(
                math.log((c / cx[a]) / (cy[b] / n)) * 1e6 + 0.5
            )
            for (a, b), c in cxy.items()
        )
        assert r["n_rows"] == n and r["n_cells"] == len(cxy)
        assert (r["n_x"], r["n_y"]) == (len(cx), len(cy))
        assert r["mi_micro"] == mi
        assert mi > 0

    def test_independent_columns(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.relational import categorical_mi

        # perfectly independent 2x2 with equal counts -> MI exactly 0
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "x": ["a", "a", "b", "b"],
                    "y": ["p", "q", "p", "q"],
                }
            )
        )
        r = categorical_mi(ds, "x", "y").to_pandas().iloc[0]
        assert r["mi_micro"] == 0


class TestBenfordProfile:
    def test_vs_brute_force(self, ray_session):
        import math
        from collections import Counter

        import ray.data

        from texoo_ray.pipelines.relational import benford_profile

        vals = [1.5, 19.0, 123.4, 2.0, 0.4, 999.9, 100.0, 85.2, 3.7, 21.0]
        ds = ray.data.from_arrow(
            pa.table({"v": pa.array(vals, pa.float64())})
        ).repartition(3)
        out = benford_profile(ds, "v").to_pandas()

        ref = Counter(
            int(str(int(math.floor(v)))[0]) for v in vals if math.floor(v) >= 1
        )
        got = dict(zip(out["digit"], out["n_obs"]))
        for d in range(1, 10):
            assert got.get(d, 0) == ref.get(d, 0)
        # expected shares: digit 1 ~ 30.1%, digit 9 ~ 4.6%
        exp = dict(zip(out["digit"], out["benford_micro"]))
        assert exp[1] == math.floor(math.log(2) / math.log(10) * 1e6 + 0.5)
        assert 45000 < exp[9] < 47000


class TestFdCheck:
    def test_holds_and_violates(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.relational import fd_check

        tbl = pa.table(
            {
                "k": ["a", "a", "b", "b", "c", None],
                "v": ["1", "1", "2", "3", "4", "5"],
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(3)
        r = fd_check(ds, "k", "v").to_pandas().iloc[0]
        # keys: a (1 dep), b (2 deps), c (1), '' (1) -> 1 violating
        assert (r["n_keys"], r["n_violating"], r["max_dep"]) == (4, 1, 2)
        # the v -> k direction: every v maps to exactly one k
        r2 = fd_check(ds, "v", "k").to_pandas().iloc[0]
        assert r2["n_violating"] == 0 and r2["n_keys"] == 5
