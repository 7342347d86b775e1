"""BPE merge learning / application (stages/bpe.py) vs a pure-Python
reference implementation of the public algorithm (Sennrich et al. 2016).
"""

from __future__ import annotations

import collections
import re

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from texoo_ray.stages.bpe import (
    _US,
    _pair_partial,
    _wrap,
    bpe_learn,
    bpe_token_count,
)


def ref_bpe(texts, n_merges):
    """Straight-line BPE: word freqs, greedy left-to-right merges,
    (max count, lexicographically smallest pair) tie-break."""
    wf = collections.Counter()
    for t in texts:
        for w in re.findall(r"\w+", (t or "").lower(), flags=re.ASCII):
            wf[w] += 1
    seqs = {w: tuple(w) for w in wf}
    merges = []
    for r in range(n_merges):
        cnt = collections.Counter()
        for w, f in wf.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += f
        if not cnt:
            break
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r + 1, a, b, c))
        for w in seqs:
            s = seqs[w]
            out = []
            i = 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges, seqs


TEXTS = [
    "the cat sat on the mat",
    "the cats sat",
    "a cat a mat a hat",
    "lower lowest low low lower",
    "newer new newest wider wide",
    "",
    "!!! ???",  # no \w+ words at all
] * 3


def test_greedy_overlap_replace_semantics():
    """'aaaa' under merge (a,a) must become ('aa','aa'), not
    ('aa','a','a') — the double-separator wrapping makes leftmost
    non-overlapping replace equal the greedy BPE merge."""
    seq = _wrap(pa.array(["aaaa", "aaa", "aa", "a"]))
    merged = pc.replace_substring(
        seq, _US + "a" + _US + _US + "a" + _US, _US + "aa" + _US
    )
    n_sym = pc.count_substring(merged, _US + _US)
    assert n_sym.to_pylist() == [1, 1, 0, 0]  # symbols = count + 1


def test_pair_partial_counts_and_boundaries():
    tbl = pa.table(
        {
            "seq": _wrap(pa.array(["ab", "b", "aba"])),
            "freq": pa.array([2, 5, 1], pa.int64()),
        }
    )
    part = _pair_partial(tbl)
    got = dict(zip(part["pair"].to_pylist(), part["cnt"].to_pylist()))
    # 'b' contributes no pairs; no cross-word pairs exist
    assert got == {"a" + _US + "b": 3, "b" + _US + "a": 1}


def test_bpe_learn_matches_reference(ray_session):
    import ray.data

    ds = ray.data.from_items([{"text": t} for t in TEXTS]).repartition(5)
    got = bpe_learn(ds, n_merges=6)
    rows = list(
        zip(
            got["merge_idx"].to_pylist(),
            got["lhs"].to_pylist(),
            got["rhs"].to_pylist(),
            got["freq"].to_pylist(),
        )
    )
    exp, _ = ref_bpe(TEXTS, 6)
    assert rows == exp


def test_bpe_token_count_matches_reference(ray_session):
    import ray.data

    items = [{"doc_id": i, "text": t} for i, t in enumerate(TEXTS)]
    ds = ray.data.from_items(items).repartition(4)
    exp_merges, seqs = ref_bpe(TEXTS, 6)
    merges = [(a, b) for _, a, b, _ in exp_merges]
    out = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_count(ds, merges=merges).take_all()
    }
    for i, t in enumerate(TEXTS):
        ws = re.findall(r"\w+", t.lower(), flags=re.ASCII)
        assert out[i] == (len(ws), sum(len(seqs[w]) for w in ws)), (i, t)


def test_bpe_learn_exhausts_pairs(ray_session):
    """Single-letter vocabulary: every word collapses to one symbol
    after its merges; asking for more merges than exist stops early."""
    import ray.data

    ds = ray.data.from_items([{"text": "ab ab ab"}])
    got = bpe_learn(ds, n_merges=10)
    assert got["merge_idx"].to_pylist() == [1]
    assert got["lhs"].to_pylist() == ["a"] and got["rhs"].to_pylist() == ["b"]


def test_bpe_learn_empty_corpus(ray_session):
    import ray.data

    ds = ray.data.from_items([{"text": "???"}, {"text": ""}])
    got = bpe_learn(ds, n_merges=3)
    assert got.num_rows == 0


def test_driver_and_distributed_loops_identical(ray_session):
    """The driver-local merge loop (small-vocab fast path) and the
    distributed loop must produce the identical merge trajectory."""
    import ray.data

    ds = ray.data.from_items([{"text": t} for t in TEXTS]).repartition(4)
    local = bpe_learn(ds, n_merges=6).to_pylist()
    dist = bpe_learn(ds, n_merges=6, driver_vocab_threshold=0).to_pylist()
    assert local == dist
    exp, _ = ref_bpe(TEXTS, 6)
    assert [(m["merge_idx"], m["lhs"], m["rhs"], m["freq"]) for m in local] == exp


def test_distributed_loop_periodic_rematerialize(ray_session):
    """The distributed loop's materialize_every re-apply branch (fold
    pending merges into the word table, reset pending) must not change
    the merge trajectory: materialize_every=2 over n_merges=6 exercises
    the periodic re-materialize twice."""
    import ray.data

    ds = ray.data.from_items([{"text": t} for t in TEXTS]).repartition(4)
    local = bpe_learn(ds, n_merges=6).to_pylist()
    dist = bpe_learn(
        ds, n_merges=6, driver_vocab_threshold=0, materialize_every=2
    ).to_pylist()
    assert dist == local
