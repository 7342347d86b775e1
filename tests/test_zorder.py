"""Z-order layout: write, manifest, pruning plan, pruned read."""

import numpy as np
import pyarrow as pa
import pytest

from texoo_ray.state.zorder import (
    read_zorder,
    write_zorder,
    zorder_plan,
    zvalue,
)


def test_zvalue_interleaves_bits():
    a = np.array([0b1011], dtype=np.uint64)
    b = np.array([0b0110], dtype=np.uint64)
    # a -> even bits, b -> odd bits
    want = 0
    for i in range(4):
        want |= ((0b1011 >> i) & 1) << (2 * i)
        want |= ((0b0110 >> i) & 1) << (2 * i + 1)
    assert int(zvalue(a, b)[0]) == want
    # monotone in each arg for fixed other
    za = zvalue(np.arange(100, dtype=np.uint64), np.zeros(100, np.uint64))
    assert (np.diff(za.astype(np.int64)) > 0).all()


@pytest.fixture()
def layout(ray_session, tmp_path):
    import ray.data

    n = 4096
    ids = np.arange(n, dtype=np.int64)
    a = ids % 64
    b = (ids * 7919) % 61
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
        }
    )
    out = str(tmp_path / "z")
    write_zorder(
        ray.data.from_arrow(tbl).repartition(4), out, "a", "b", n_files=16
    )
    return out, tbl


def test_pruned_read_equals_full_filter(layout):
    out, tbl = layout
    a = np.asarray(tbl["a"], dtype=np.int64)
    b = np.asarray(tbl["b"], dtype=np.int64)
    for a_range, b_range in [
        ((10, 20), None),
        (None, (5, 12)),
        ((0, 6), (50, 60)),
        ((63, 63), (0, 60)),
        ((100, 200), None),  # empty result
    ]:
        got = read_zorder(out, a_range, b_range).to_pandas()
        mask = np.ones(len(a), dtype=bool)
        if a_range:
            mask &= (a >= a_range[0]) & (a <= a_range[1])
        if b_range:
            mask &= (b >= b_range[0]) & (b <= b_range[1])
        want = sorted(np.asarray(tbl["doc_id"])[mask].tolist())
        if not want:
            # Ray to_pandas drops columns on an all-empty dataset
            assert len(got) == 0, (a_range, b_range)
            continue
        assert sorted(got["doc_id"].tolist()) == want, (a_range, b_range)
        assert "zfile" not in got.columns


def test_plan_actually_prunes_on_both_axes(layout):
    out, _ = layout
    full = zorder_plan(out)[1]
    assert full >= 8  # the layout really split
    for rng in [((0, 7), None), (None, (0, 7)), ((0, 7), (0, 7))]:
        kept, total = zorder_plan(out, *rng)
        assert total == full
        assert 0 < len(kept) < total, (rng, len(kept), total)
    # both-axis predicate prunes at least as hard as either alone
    ka = len(zorder_plan(out, (0, 7), None)[0])
    kb = len(zorder_plan(out, None, (0, 7))[0])
    kab = len(zorder_plan(out, (0, 7), (0, 7))[0])
    assert kab <= min(ka, kb)
