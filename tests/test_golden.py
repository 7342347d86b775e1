"""Golden-output regression test (FIXTURES.md §2).

Freezes the full extraction output (sentences/tokens/tags/mentions/
sections) for the first 6 generated conversations. Any semantic change to
the tokenizer, splitter, tagger, gazetteer, or section heuristics shows
up as a diff here — update the golden file ONLY for intentional semantic
changes (regenerate with the snippet in the golden file's git history).
"""

import json
import os

from texoo_ray.sources.fixtures import GAZETTEER_TERMS
from texoo_ray.sources.turns import turns_table
from texoo_ray.stages.extract import ExtractStage

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "extract_golden.json")


def test_extraction_matches_golden():
    with open(GOLDEN) as f:
        golden = json.load(f)
    tbl = turns_table(0, 15, seed=42)
    out = ExtractStage(gazetteer_terms=GAZETTEER_TERMS, section_method="nl")(tbl)
    assert out.num_rows == len(golden)
    for i, want in enumerate(golden):
        got = {
            "conv_id": out["conv_id"][i].as_py(),
            "turn_idx": out["turn_idx"][i].as_py(),
            "text": out["text"][i].as_py(),
            "clean_text": out["clean_text"][i].as_py(),
            "lang": out["lang"][i].as_py(),
            "sentences": out["sentences"][i].as_py(),
            "tokens": out["tokens"][i].as_py(),
            "tags": out["tags"][i].as_py(),
            "mentions": out["mentions"][i].as_py(),
            "sections": out["sections"][i].as_py(),
        }
        assert got == want, f"row {i} ({want['conv_id']}#{want['turn_idx']}) diverged"


def test_golden_has_variety():
    """The frozen slice must actually exercise the interesting paths."""
    with open(GOLDEN) as f:
        golden = json.load(f)
    assert any(r["mentions"] for r in golden)
    assert any(len(r["sections"]) > 1 for r in golden)
    assert any("\n" in r["clean_text"] for r in golden)
    assert any(r["text"] != r["clean_text"] for r in golden)  # markup stripped
    assert any(not r["tokens"] for r in golden)  # degenerate empty turns
