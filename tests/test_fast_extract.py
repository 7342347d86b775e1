"""Column-by-column equivalence of the vectorized fused extraction core
(stages/fast_extract.py) against the object-based path, which is itself
pinned by the golden file and the stage-equivalence tests."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from texoo_ray.stages.extract import ExtractStage

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "extract_golden.json")

EDGE_TEXTS = [
    "",
    " ",
    "\n",
    "\n\n\n",
    "ok",
    "thanks!",
    "Hello World. This is Dr. Smith from the University of Oslo.",
    "line one\nline two\n\nline three",
    "A B C\nD E F",
    'quotes "inside (parens) [brackets] {braces}" here',
    "ellipsis... and -- dashes !! bangs",
    "don't can't won't it's we're I'm you'll they've he'd",
    "1. First item\n2. Second item\n26. Oktober 2019",
    "numbers 1,007 and 29.7 and 44,928,923 end",
    "U.S. km/h e-mail o'clock",
    "<b>bold</b> &amp; <i>tags</i> stripped",
    "***LIST*** placeholder ***formula*** here",
    "========,2,Heading.\nBody text follows.",
    "Der Hund lief über die Straße und der Mann sah ihn.",
    "mixed Ünïcödé tökens ånd ASCII",
    "trailing spaces   \nand\ttabs\there",
    "a" * 300,
    ("Repeated boilerplate line.\n" * 5) + "Unique tail 12345.",
    "NASA launched Apollo 11 in 1969. Neil Armstrong walked.",
    "sentence one. sentence two? sentence three! and a tail",
    "Abbrev at end e.g. more text follows here",
    "Dot.\nNewline after dot.",
    "  leading whitespace sentence.",
    "A.\nB.\nC.",
    "word   nbsp-separated words",
]

GAZ_TERMS = ["University of Oslo", "Neil Armstrong", "Apollo 11", "boilerplate"]


def _table(texts):
    return pa.table({"text": pa.array(texts, pa.string())})


def _run_both(texts, **kwargs):
    fast = ExtractStage(use_fast=True, **kwargs)
    slow = ExtractStage(use_fast=False, **kwargs)
    t = _table(texts)
    return fast(t), slow(t)


def _assert_equal(got: pa.Table, want: pa.Table):
    assert got.column_names == want.column_names
    for c in want.column_names:
        assert got[c].to_pylist() == want[c].to_pylist(), f"column {c} differs"


@pytest.mark.parametrize("lean", [True, False])
def test_edge_corpus_equivalence(lean):
    got, want = _run_both(EDGE_TEXTS, lean=lean)
    _assert_equal(got, want)


def test_gazetteer_equivalence():
    got, want = _run_both(EDGE_TEXTS, lean=True, gazetteer_terms=GAZ_TERMS)
    _assert_equal(got, want)


def test_golden_corpus_equivalence():
    with open(GOLDEN) as f:
        rows = json.load(f)
    texts = [r["text"] for r in rows]
    got, want = _run_both(texts, lean=False, gazetteer_terms=GAZ_TERMS)
    _assert_equal(got, want)


def test_memo_repeat_rows_identical():
    texts = ["ok", "thanks!", "ok", "Hello there. Bye.", "ok", "thanks!"]
    fast = ExtractStage(use_fast=True, lean=True)
    out1 = fast(_table(texts))
    out2 = fast(_table(texts))  # second pass: memo + sentence-cache hits
    _assert_equal(out1, out2)
    slow = ExtractStage(use_fast=False, lean=True)
    _assert_equal(out1, slow(_table(texts)))


def test_empty_batch():
    fast = ExtractStage(use_fast=True, lean=True)
    out = fast(_table([]))
    assert out.num_rows == 0
    assert "mentions" in out.column_names


def test_arrow_types_match_schema():
    from texoo_ray.stages import schema

    fast = ExtractStage(use_fast=True, lean=True)
    out = fast(_table(EDGE_TEXTS))
    assert out["sentences"].type == schema.SENTENCE_TYPE
    assert out["tokens"].type == schema.TOKEN_TYPE
    assert out["mentions"].type == schema.MENTION_TYPE
    assert out["sections"].type == schema.SECTION_TYPE
