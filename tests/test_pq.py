"""Product quantization (stages/pq.py) vs a straight-line numpy
reference of the same exact-int64 train/encode/search algebra."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from texoo_ray.stages.pq import (
    _round_div,
    pq_encode,
    pq_search,
    pq_train,
)

DIM, M, SUB = 16, 4, 4


def make_items(n=60, seed=7):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, DIM).astype(np.float32)
    labels = rng.randint(0, 5, size=n)
    return [
        {
            "vec_id": i,
            "label": int(labels[i]),
            "embedding": vecs[i].tolist(),
        }
        for i in range(n)
    ]


def ref_pq(items, scale_bits=20):
    """Reference: quantize, label-seeded centroids, one per-subspace
    Lloyd round, final assignment. Returns codes (n, M) and the refined
    per-subspace codebooks."""
    scale = 1 << scale_bits
    vq = np.floor(
        np.array([it["embedding"] for it in items], dtype=np.float64) * scale
        + 0.5
    ).astype(np.int64)
    labels = np.array([it["label"] for it in items], dtype=np.int64)
    uniq = np.unique(labels)
    books = []
    for s in range(M):
        sl = vq[:, s * SUB : (s + 1) * SUB]
        # init: per-label rounded mean
        c0 = np.stack(
            [
                _round_div(sl[labels == u].sum(0), np.int64((labels == u).sum()))
                for u in uniq
            ]
        )
        d2 = ((sl[:, None, :] - c0[None, :, :]) ** 2).sum(-1)
        a0 = np.argmin(d2, axis=1)
        present = [ci for ci in range(len(uniq)) if (a0 == ci).any()]
        c1 = np.stack(
            [
                _round_div(sl[a0 == ci].sum(0), np.int64((a0 == ci).sum()))
                for ci in present
            ]
        )
        codes1 = uniq[present]
        d2 = ((sl[:, None, :] - c1[None, :, :]) ** 2).sum(-1)
        books.append((codes1, c1))
    codes = np.stack(
        [
            books[s][0][
                np.argmin(
                    (
                        (
                            vq[:, s * SUB : (s + 1) * SUB][:, None, :]
                            - books[s][1][None, :, :]
                        )
                        ** 2
                    ).sum(-1),
                    axis=1,
                )
            ]
            for s in range(M)
        ],
        axis=1,
    )
    return vq, codes, books


def test_pq_codes_match_reference(ray_session):
    import ray.data

    items = make_items()
    ds = ray.data.from_items(items).repartition(5)
    book = pq_train(ds, m=M)
    got = (
        pq_encode(ds, book, m=M)
        .sort(["vec_id", "sub"])
        .to_pandas()
    )
    _, exp_codes, _ = ref_pq(items)
    got_codes = got["code"].to_numpy().reshape(len(items), M)
    assert (got_codes == exp_codes).all()


def test_pq_search_matches_reference(ray_session):
    import ray.data

    items = make_items()
    ds = ray.data.from_items(items).repartition(3)
    book = pq_train(ds, m=M)
    q = np.asarray(items[0]["embedding"], dtype=np.float64)
    got = pq_search(ds, book, q, k=5, m=M).take_all()

    vq, codes, books = ref_pq(items)
    scale = 1 << 20
    qq = np.floor(q * scale + 0.5).astype(np.int64)
    ad2 = np.zeros(len(items), dtype=np.int64)
    for s in range(M):
        dq = ((qq[s * SUB : (s + 1) * SUB][None, :] - books[s][1]) ** 2).sum(-1)
        pos = {c: i for i, c in enumerate(books[s][0])}
        ad2 += np.array([dq[pos[c]] for c in codes[:, s]])
    order = np.lexsort((np.arange(len(items)), ad2))[:5]
    assert [(r["vec_id"], r["ad2"]) for r in got] == [
        (int(i), int(ad2[i])) for i in order
    ]


def test_pq_duplicate_vectors_share_codes(ray_session):
    import ray.data

    items = make_items(n=30)
    # plant an exact duplicate of vec 3 with a different label
    dup = dict(items[3])
    dup["vec_id"], dup["label"] = 999, (items[3]["label"] + 1) % 5
    ds = ray.data.from_items(items + [dup])
    book = pq_train(ds, m=M)
    got = pq_encode(ds, book, m=M).sort(["vec_id", "sub"]).to_pandas()
    by_id = got.groupby("vec_id")["code"].apply(list)
    assert by_id[3] == by_id[999]


def test_pq_train_rejects_bad_m(ray_session):
    import ray.data

    ds = ray.data.from_items(make_items(n=10))
    with pytest.raises(ValueError):
        pq_train(ds, m=5)  # 16 % 5 != 0


def test_ivf_pq_search_prunes_and_ranks(ray_session):
    import ray.data

    from texoo_ray.stages.pq import ivf_pq_search

    items = make_items(n=80, seed=11)
    ds = ray.data.from_items(items).repartition(4)
    q = np.asarray(items[5]["embedding"], dtype=np.float64)
    got = ivf_pq_search(ds, q, k=8, nprobe=2, m=M).take_all()
    assert len(got) == 8
    # results only come from the 2 probed cells
    assert len({r["cell"] for r in got}) <= 2
    # ad2 ascending, id-tie-break ascending
    keys = [(r["ad2"], r["vec_id"]) for r in got]
    assert keys == sorted(keys)

    # full probe (nprobe = #labels) must dominate the pruned result:
    # every pruned hit appears in the full ranking with the same ad2
    full = ivf_pq_search(ds, q, k=80, nprobe=5, m=M).take_all()
    full_ad2 = {r["vec_id"]: r["ad2"] for r in full}
    for r in got:
        assert full_ad2[r["vec_id"]] == r["ad2"]
    # and pruning genuinely excluded some cells' rows from consideration
    assert len({r["cell"] for r in full}) > 2
