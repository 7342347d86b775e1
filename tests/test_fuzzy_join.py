"""Blocked fuzzy join (pipelines/joins.py): DuckDB-exact Jaro-Winkler,
blocking semantics, distinct-name fan-out."""

from __future__ import annotations

import random

import pytest

from texoo_ray.pipelines.joins import fuzzy_join, jaro_winkler_std


def test_jw_matches_duckdb_exactly():
    import duckdb

    con = duckdb.connect()
    rng = random.Random(7)
    cases = [
        ("martha", "marhta"),
        ("dixon", "dicksonx"),
        ("abc", "abc"),
        ("", "abc"),
        ("a", ""),
        ("", ""),
        ("crate", "trace"),
        ("abcd", "abdc"),
    ]
    for _ in range(1500):
        a = "".join(rng.choice("abcdef") for _ in range(rng.randint(0, 10)))
        b = "".join(rng.choice("abcdef") for _ in range(rng.randint(0, 10)))
        cases.append((a, b))
    for a, b in cases:
        d = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler_std(a, b) == d, (a, b)


def run(left, right, threshold=0.9, block_chars=2):
    import ray.data

    lds = ray.data.from_items(
        [{"id": i, "name": n} for i, n in left]
    ).repartition(2)
    rds = ray.data.from_items(
        [{"id": i, "name": n} for i, n in right]
    ).repartition(2)
    out = fuzzy_join(
        lds, rds, "id", "name", "id", "name",
        threshold=threshold, block_chars=block_chars,
    ).take_all()
    return sorted((r["l_id"], r["r_id"]) for r in out)


def test_blocked_matching(ray_session):
    left = [(1, "jonathan smith"), (2, "maria garcia"), (3, "wei chen")]
    right = [
        (10, "jonathan smyth"),   # same 'jo' block, close
        (11, "maria garcai"),     # same 'ma' block, close
        (12, "XXwei chen"),       # prefix corrupted -> different block
        (13, "zz unrelated"),
    ]
    got = run(left, right)
    assert (1, 10) in got and (2, 11) in got
    # blocking trade-off: the prefix-corrupted duplicate is unmatchable
    assert all(l != 3 for l, _ in got)
    assert all(r != 13 for _, r in got)


def test_distinct_name_fanout(ray_session):
    """Repeated identical names on both sides produce the full id
    cross-product per matching name pair."""
    left = [(1, "acme corp"), (2, "acme corp"), (3, "other")]
    right = [(10, "acme corp"), (11, "acme corp")]
    got = run(left, right, threshold=0.99)
    assert got == [(1, 10), (1, 11), (2, 10), (2, 11)]


def test_empty_sides(ray_session):
    assert run([(1, "abc")], [(2, "zzz")]) == []


def test_entity_clusters_transitive(ray_session):
    """a~b and b~c but NOT a~c directly: transitivity must still place
    all three in one cluster; unrelated rows stay singletons."""
    import ray.data

    from texoo_ray.pipelines.joins import entity_clusters

    rows = [
        (1, "jonathan smith"),
        (2, "jonathan smyth"),   # ~1
        (3, "jonathan smythe"),  # ~2 (and transitively 1)
        (4, "totally different"),
        (5, "jonathan smith"),   # exact dup of 1
    ]
    ds = ray.data.from_items(
        [{"id": i, "name": n} for i, n in rows]
    ).repartition(2)
    got = {
        r["id"]: r["cluster"]
        for r in entity_clusters(ds, "id", "name", threshold=0.95).take_all()
    }
    assert got[1] == got[2] == got[3] == got[5] == 1
    assert got[4] == 4


# --- edit_join --------------------------------------------------------------


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


def test_levenshtein_pairs_vs_bruteforce():
    import numpy as np

    from texoo_ray.pipelines.joins import _levenshtein_pairs

    l_names = ["kitten", "flaw", "", "abc", "identical"]
    r_names = ["sitting", "lawn", "x", "abc", "identical", ""]
    pi, pj = np.meshgrid(
        np.arange(len(l_names)), np.arange(len(r_names)), indexing="ij"
    )
    pi, pj = pi.ravel(), pj.ravel()
    d = _levenshtein_pairs(l_names, r_names, pi, pj)
    for t in range(len(pi)):
        assert d[t] == _lev_ref(l_names[pi[t]], r_names[pj[t]]), (
            l_names[pi[t]],
            r_names[pj[t]],
        )


def _edit_join_ref(lrows, rrows, max_dist, block_chars=2):
    out = set()
    for li, ln in lrows:
        for ri, rn in rrows:
            if ln[:block_chars] == rn[:block_chars]:
                d = _lev_ref(ln, rn)
                if d <= max_dist:
                    out.add((li, ri, d))
    return out


def test_edit_join_matches_bruteforce_and_salting(ray_session):
    import ray.data

    from texoo_ray.pipelines.joins import edit_join

    lrows = [
        (1, "charlotte"),
        (2, "charlote"),
        (3, "charlottes"),
        (4, "chxrlotte"),
        (5, "daniel"),
        (6, "danial"),
        (7, "dan"),
        (8, "charles"),
    ]
    rrows = [
        (11, "charlotte"),
        (12, "chalotte"),
        (13, "daniell"),
        (14, "danielle"),
        (15, "charlie"),
        (16, "dxn"),
    ]
    expect = _edit_join_ref(lrows, rrows, 2)
    left = ray.data.from_items(
        [{"lid": i, "name": n} for i, n in lrows], override_num_blocks=3
    )
    right = ray.data.from_items(
        [{"rid": i, "name": n} for i, n in rrows], override_num_blocks=2
    )
    # max_block_names=2 forces the hot-block salted path for both blocks
    for mbn in (20000, 2):
        got = edit_join(
            left, right, "lid", "name", "rid", "name",
            max_dist=2, max_block_names=mbn,
        ).to_pandas()
        assert (
            set(zip(got["l_id"], got["r_id"], got["dist"])) == expect
        ), mbn
        assert len(got) == len(expect), mbn  # exactly-once under salting


# --- snm_join ----------------------------------------------------------------


def _snm_ref(lrows, rrows, window, threshold, reverse=True):
    from texoo_ray.pipelines.joins import jaro_winkler_std

    allrows = [(n[::-1] if reverse else n, "l", i, n) for i, n in lrows] + [
        (n[::-1] if reverse else n, "r", i, n) for i, n in rrows
    ]
    allrows.sort(key=lambda t: (t[0].encode(), t[1], t[2]))
    out = set()
    for a, (ka, sa, ia, na) in enumerate(allrows, 1):
        for b, (kb, sb, ib, nb) in enumerate(allrows, 1):
            if sa == "l" and sb == "r" and abs(a - b) <= window:
                sim = jaro_winkler_std(na, nb)
                if sim >= threshold:
                    import numpy as np

                    out.add((ia, ib, int(np.floor(sim * 1e6 + 0.5))))
    return out


def test_snm_join_matches_bruteforce(ray_session):
    import ray.data

    from texoo_ray.pipelines.joins import snm_join

    # head-corrupted copies: prefix blocking would miss every pair
    lrows = [
        (1, "charlotte anderson"),
        (2, "margaret blackwood"),
        (3, "jonathan priestley"),
        (4, "benjamin underhill"),
        (5, "alexandra morrison"),
        (6, "zzz totally unrelated"),
    ]
    rrows = [(100 + i, "q" + n[1:]) for i, n in lrows[:5]] + [
        (200, "completely different"),
    ]
    want = _snm_ref(lrows, rrows, window=5, threshold=0.9)
    # 4 of 5 planted head-corrupted pairs clear 0.9 (the 'alexandra'
    # copy lands at 0.884: the stray internal 'a' match costs a
    # transposition) — prefix blocking would find ZERO of them
    assert len(want) == 4
    left = ray.data.from_items(
        [{"lid": i, "name": n} for i, n in lrows], override_num_blocks=3
    )
    right = ray.data.from_items(
        [{"rid": i, "name": n} for i, n in rrows], override_num_blocks=2
    )
    # n_buckets=3 forces multi-segment hash buckets; window B-passes on
    got = snm_join(
        left, right, "lid", "name", "rid", "name",
        window=5, threshold=0.9, n_buckets=3,
    ).to_pandas()
    assert set(zip(got["l_id"], got["r_id"], got["sim_micro"])) == want
    assert len(got) == len(want)  # exactly-once across the two passes


def test_jw_pairs_vectorized_matches_scalar():
    """The pair-axis-vectorized JW kernel is bit-identical to the scalar
    (which test_jw_matches_duckdb_exactly pins to DuckDB): random pools
    including transposition-heavy, unicode, empty and long strings."""
    import numpy as np

    from texoo_ray.pipelines.joins import _jaro_winkler_pairs

    rng = random.Random(13)
    pool = ["", "a", "martha", "marhta", "dixon", "dicksonx", "crate",
            "trace", "abcd", "abdc", "über", "ubér", "x" * 40]
    for _ in range(400):
        pool.append(
            "".join(rng.choice("abcdeü ") for _ in range(rng.randint(0, 15)))
        )
    l_names = np.array([rng.choice(pool) for _ in range(300)], dtype=object)
    r_names = np.array([rng.choice(pool) for _ in range(200)], dtype=object)
    pi = np.array([rng.randrange(300) for _ in range(3000)], dtype=np.int64)
    pj = np.array([rng.randrange(200) for _ in range(3000)], dtype=np.int64)
    got = _jaro_winkler_pairs(l_names, r_names, pi, pj)
    for t in range(len(pi)):
        exp = jaro_winkler_std(l_names[pi[t]], r_names[pj[t]])
        assert got[t] == exp, (l_names[pi[t]], r_names[pj[t]], got[t], exp)


def test_jw_pairs_empty_and_degenerate():
    import numpy as np

    from texoo_ray.pipelines.joins import _jaro_winkler_pairs

    out = _jaro_winkler_pairs(
        np.array([], dtype=object), np.array([], dtype=object),
        np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    assert len(out) == 0
    out = _jaro_winkler_pairs(
        np.array(["", "ab"], dtype=object), np.array(["", "ab"], dtype=object),
        np.array([0, 0, 1, 1], dtype=np.int64),
        np.array([0, 1, 0, 1], dtype=np.int64))
    assert list(out) == [0.0, 0.0, 0.0, 1.0]
