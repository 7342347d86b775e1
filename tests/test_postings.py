"""Inverted postings index (stages/postings.py): build layout, pruned
conjunctive search, ranking semantics."""

from __future__ import annotations

import collections
import os
import re
import shutil

import pytest

from texoo_ray.stages.postings import (
    _term_buckets,
    build_postings,
    search_postings,
)

DOCS = [
    (0, "alpha beta gamma alpha"),
    (1, "alpha beta beta"),
    (2, "beta gamma"),
    (3, "alpha gamma gamma alpha beta"),
    (4, "delta epsilon"),
    (5, ""),
    (6, "ALPHA Beta gamma"),  # lowercased terms
]


def ref_search(terms, k=10):
    need = set(terms)
    out = []
    for did, text in DOCS:
        tf = collections.Counter(re.findall(r"\w+", text.lower(), re.ASCII))
        if all(t in tf for t in need):
            out.append((did, sum(tf[t] for t in need)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.fixture()
def index_dir(ray_session, tmp_path):
    import ray.data

    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in DOCS]
    ).repartition(3)
    return build_postings(ds, str(tmp_path / "idx"), n_buckets=8)


def got(index_dir, terms, k=10):
    return [
        (r["doc_id"], r["total_tf"])
        for r in search_postings(index_dir, terms, k=k).take_all()
    ]


def test_conjunctive_and_ranking(index_dir):
    assert got(index_dir, ["alpha", "beta"]) == ref_search(["alpha", "beta"])
    assert got(index_dir, ["alpha", "beta", "gamma"]) == ref_search(
        ["alpha", "beta", "gamma"]
    )
    assert got(index_dir, ["delta"]) == [(4, 1)]
    assert got(index_dir, ["alpha", "delta"]) == []
    assert got(index_dir, ["nosuchterm"]) == []


def test_duplicate_query_terms_collapse(index_dir):
    assert got(index_dir, ["beta", "beta"]) == ref_search(["beta"])


def test_search_reads_only_probed_buckets(index_dir):
    """Deleting every bucket the query does NOT hash to must not change
    the result — proof the search never opens unprobed directories."""
    terms = ["alpha", "gamma"]
    expected = ref_search(terms)
    keep = set(_term_buckets(sorted(set(terms)), 8).tolist())
    removed = 0
    for b in range(8):
        d = os.path.join(index_dir, f"bucket={b}")
        if b not in keep and os.path.isdir(d):
            shutil.rmtree(d)
            removed += 1
    assert removed > 0  # the corpus hashes into more buckets than probed
    assert got(index_dir, terms) == expected


def ref_phrase(phrase, docs, k=10):
    out = []
    for did, text in docs:
        words = re.findall(r"\w+", text.lower(), re.ASCII)
        n = sum(
            1
            for i in range(len(words) - len(phrase) + 1)
            if words[i : i + len(phrase)] == list(phrase)
        )
        if n:
            out.append((did, n))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


PHRASE_DOCS = [
    (0, "a b c a b c a b"),
    (1, "b a b a b a"),  # overlapping 'a b a' occurrences
    (2, "c c c"),
    (3, "a b"),
    (4, "x a b c y a b c"),
]


@pytest.fixture()
def pos_index(ray_session, tmp_path):
    import ray.data

    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in PHRASE_DOCS]
    ).repartition(2)
    from texoo_ray.stages.postings import build_postings

    return build_postings(
        ds, str(tmp_path / "pidx"), n_buckets=4, positions=True
    )


def test_phrase_search_counts(pos_index):
    from texoo_ray.stages.postings import phrase_search

    def got(phrase, k=10):
        return [
            (r["doc_id"], r["n_occ"])
            for r in phrase_search(pos_index, phrase, k=k).take_all()
        ]

    for phrase in (
        ["a", "b", "c"],
        ["a", "b"],
        # repeated-word phrases: offsets reuse the same postings row,
        # and overlapping occurrences all count as start positions
        ["b", "a", "b"],
        ["c", "c"],
        ["c", "a"],
    ):
        assert got(phrase) == ref_phrase(phrase, PHRASE_DOCS), phrase
    assert got(["a", "x"]) == []
    assert got(["nosuch", "phrase"]) == []


def test_phrase_search_requires_positions(index_dir):
    from texoo_ray.stages.postings import phrase_search

    with pytest.raises(ValueError):
        phrase_search(index_dir, ["alpha", "beta"])


def test_incremental_update_equals_full_rebuild(ray_session, tmp_path):
    import ray.data

    from texoo_ray.stages.postings import (
        build_postings,
        phrase_search,
        search_postings,
        update_postings,
    )

    old = [{"doc_id": i, "text": t} for i, t in DOCS]
    new = [
        {"doc_id": 100, "text": "alpha beta gamma beta gamma"},
        {"doc_id": 101, "text": "delta epsilon alpha"},
    ]
    inc = build_postings(
        ray.data.from_items(old), str(tmp_path / "inc"), n_buckets=8,
        positions=True,
    )
    update_postings(inc, ray.data.from_items(new))
    full = build_postings(
        ray.data.from_items(old + new), str(tmp_path / "full"), n_buckets=8,
        positions=True,
    )
    for terms in (["alpha", "beta"], ["delta"], ["alpha", "epsilon"]):
        a = sorted(map(tuple, (r.values() for r in
                               search_postings(inc, terms).take_all())))
        b = sorted(map(tuple, (r.values() for r in
                               search_postings(full, terms).take_all())))
        assert a == b, terms
    pa_ = sorted(map(tuple, (r.values() for r in
                             phrase_search(inc, ["beta", "gamma"]).take_all())))
    pb_ = sorted(map(tuple, (r.values() for r in
                             phrase_search(full, ["beta", "gamma"]).take_all())))
    assert pa_ == pb_


def test_planted_bm25_tf_monotonicity_margin():
    """The passages_planted oracle rests on: Okapi BM25 score is
    STRICTLY increasing in tf for passages 'qtK '*tf + 'pad padd.'
    (fixed 2 extra tokens). Pin it up to tf=1000 (the sf0.1 class
    size), against the real Bm25Index."""
    from texoo_ray.stages.linker import Bm25Index

    docs = [("qt7 " * tf) + "pad padd." for tf in range(1, 1001)]
    idx = Bm25Index(docs)
    hits = idx.query("qt7", k=1000)
    # ranking must be exactly tf descending: doc index 999, 998, ...
    assert [i for i, _ in hits] == list(range(999, -1, -1))
    scores = [s for _, s in hits]
    assert all(a > b for a, b in zip(scores, scores[1:]))
