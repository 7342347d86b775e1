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
