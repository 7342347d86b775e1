"""HyperLogLog sketch (stages/sketches.py): reference parity, branch
behavior, merge associativity."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from texoo_ray.stages.sketches import (
    _HLL_M,
    _hll_update,
    hll_bigram_distinct,
    hll_estimate_micro,
)


def ref_regs(items):
    regs = np.zeros(_HLL_M, dtype=np.int64)
    for it in items:
        h = int(hashlib.md5(it.encode()).hexdigest()[:16], 16)
        j, w = h >> 58, h & ((1 << 58) - 1)
        regs[j] = max(regs[j], 59 - w.bit_length())
    return regs


def test_linear_counting_branch_small_cardinality():
    regs = ref_regs([f"w{i}" for i in range(20)])
    est, v = hll_estimate_micro(regs)
    assert v > 0
    assert est == math.floor(64 * math.log(64 / v) * 1e6 + 0.5)
    # estimate within 30% of truth at this size
    assert 0.7 * 20e6 < est < 1.3 * 20e6


def test_raw_branch_large_cardinality():
    items = [f"item-{i}" for i in range(5000)]
    regs = ref_regs(items)
    est, v = hll_estimate_micro(regs)
    assert v == 0  # all registers hit
    snum = sum(1 << (59 - int(m)) for m in regs)
    assert est == (709 * 64 * 64 * (1 << 59) * 1000) // snum
    # HLL error at m=64 is ~13%; allow 3 sigma
    assert abs(est / 1e6 - 5000) / 5000 < 0.4


def test_update_merge_associativity():
    a = [f"a{i}" for i in range(300)]
    b = [f"b{i}" for i in range(300)]
    whole = ref_regs(a + b)
    ra, rb = ref_regs(a), ref_regs(b)
    assert (np.maximum(ra, rb) == whole).all()
    # _hll_update folds incrementally to the same state
    regs = np.zeros(_HLL_M, dtype=np.int64)
    _hll_update(regs, a)
    _hll_update(regs, b)
    assert (regs == whole).all()


def test_hll_bigram_distinct_end_to_end(ray_session):
    import ray.data

    texts = [
        "alpha beta gamma",
        "beta gamma delta",
        "alpha beta",  # repeated bigram across docs
        "",
        "solo",  # no bigram
    ]
    ds = ray.data.from_items([{"text": t} for t in texts]).repartition(3)
    out = hll_bigram_distinct(ds)
    row = out.to_pylist()[0]
    # distinct bigrams = {alpha beta, beta gamma, gamma delta}
    assert row["exact_distinct"] == 3
    regs = ref_regs(["alpha beta", "beta gamma", "gamma delta"])
    est, v = hll_estimate_micro(regs)
    assert (row["est_micro"], row["v_empty"]) == (est, v)


def test_hll_layout_invariance(ray_session):
    import ray.data

    texts = [f"w{i} w{i+1} w{i+2}" for i in range(40)]
    a = hll_bigram_distinct(
        ray.data.from_items([{"text": t} for t in texts]).repartition(1)
    ).to_pylist()[0]
    b = hll_bigram_distinct(
        ray.data.from_items([{"text": t} for t in texts]).repartition(9)
    ).to_pylist()[0]
    assert a == b


# --- Count-Min Sketch ------------------------------------------------------


def test_cms_buckets_match_md5_reference():
    from texoo_ray.stages.sketches import _CMS_W, _cms_buckets

    words = ["alpha", "beta", "gamma"]
    b = _cms_buckets(words)
    for i in range(4):
        for j, w in enumerate(words):
            h = int(hashlib.md5(f"{i}:{w}".encode()).hexdigest()[:16], 16)
            assert b[i, j] == h % _CMS_W


def test_cms_overestimates_and_merges_exactly(ray_session):
    """cms_count >= exact_count for every probe, equality when the
    corpus is collision-free; block partials merge counter-wise so the
    sketch is independent of how rows split into blocks."""
    import ray.data

    from texoo_ray.stages.sketches import cms_word_counts

    rows = [{"text": "cat dog"} for _ in range(7)] + [
        {"text": "dog bird"} for _ in range(3)
    ]
    one = cms_word_counts(
        ray.data.from_items(rows, override_num_blocks=1), top_n=3
    ).to_pydict()
    many = cms_word_counts(
        ray.data.from_items(rows, override_num_blocks=5), top_n=3
    ).to_pydict()
    assert one == many
    assert one["word"] == ["dog", "cat", "bird"]
    assert one["exact_count"] == [10, 7, 3]
    for e, c in zip(one["exact_count"], one["cms_count"]):
        assert c >= e
