"""ntile_shards (pipelines/curation.py): exact distributed NTILE by
(len(text), id) rank without a global sort."""

from __future__ import annotations

import pytest

from texoo_ray.pipelines.curation import ntile_shards


def ref_ntile(items, s):
    """SQL NTILE semantics: first N % S shards get the extra row."""
    order = sorted(items, key=lambda it: (len(it["text"]), it["doc_id"]))
    n = len(order)
    base, extra = divmod(n, s)
    out = {}
    r = 0
    for j in range(1, s + 1):
        size = base + (1 if j <= extra else 0)
        for it in order[r : r + size]:
            out[it["doc_id"]] = j
        r += size
    return out


def run(items, s, parts=4):
    import ray.data

    ds = ray.data.from_items(items).repartition(parts)
    return {
        r["doc_id"]: r["shard"] for r in ntile_shards(ds, n_shards=s).take_all()
    }


def test_matches_sql_ntile(ray_session):
    items = [
        {"doc_id": i, "text": "x" * ((i * 7) % 13)} for i in range(37)
    ]
    for s in (2, 4, 5):
        assert run(items, s) == ref_ntile(items, s), s


def test_all_ties_split_by_id(ray_session):
    """Skew case: every document has the SAME score, so every shard
    boundary falls inside one score group and must be resolved purely
    by the id radix cutoff."""
    items = [{"doc_id": i * 3, "text": "same"} for i in range(20)]
    assert run(items, 4) == ref_ntile(items, 4)


def test_fewer_rows_than_shards(ray_session):
    items = [{"doc_id": i, "text": "x" * i} for i in range(3)]
    assert run(items, 5) == ref_ntile(items, 5)


def test_block_layout_invariance(ray_session):
    items = [
        {"doc_id": i, "text": "y" * ((i * 11) % 7)} for i in range(50)
    ]
    assert run(items, 4, parts=1) == run(items, 4, parts=10)
