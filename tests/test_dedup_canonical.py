"""canonical_dedup_best (stages/dedup.py): keep-most-complete dedup
over lowercased / whitespace-collapsed content."""

from __future__ import annotations

import pytest

from texoo_ray.stages.dedup import canonical_dedup_best


def run(items, ray_session=None, parts=3):
    import ray.data

    ds = ray.data.from_items(items).repartition(parts)
    out = canonical_dedup_best(ds).take_all()
    return {r["doc_id"]: r["dup_count"] for r in out}


def test_longest_raw_variant_wins(ray_session):
    items = [
        {"doc_id": 1, "text": "Hello   world"},
        {"doc_id": 2, "text": "hello world"},
        {"doc_id": 3, "text": "HELLO\tWORLD   "},  # longest raw (14 chars)
        {"doc_id": 4, "text": "other text"},
    ]
    got = run(items)
    assert got == {3: 3, 4: 1}


def test_tie_breaks_to_lowest_id(ray_session):
    items = [
        {"doc_id": 9, "text": "same LEN"},
        {"doc_id": 2, "text": "SAME len"},  # equal raw length
        {"doc_id": 5, "text": "same len"},
    ]
    got = run(items)
    assert got == {2: 3}


def test_block_layout_invariance(ray_session):
    items = [
        {"doc_id": i, "text": f"doc {i % 4} body" + " " * (i % 3)}
        for i in range(24)
    ]
    a = run(items, parts=1)
    b = run(items, parts=8)
    assert a == b
    # 4 canonical groups of 6 docs each; longest raw = the i%3==2 rows,
    # survivor is the lowest id among them
    assert all(v == 6 for v in a.values())
    for gid in range(4):
        members = [i for i in range(24) if i % 4 == gid]
        longest = [i for i in members if i % 3 == 2]
        assert min(longest) in a


def test_null_and_empty_text(ray_session):
    items = [
        {"doc_id": 1, "text": None},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "   "},  # canonicalizes to "" too
    ]
    got = run(items)
    # "   " is the longest raw variant of the empty canonical group
    assert got == {3: 3}
