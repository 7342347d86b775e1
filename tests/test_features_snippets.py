"""Char-class features, surface features, snippet windows, retrieval stage."""

import numpy as np
import pyarrow as pa

from texoo_ray.core.features import (
    CHAR_CLASS_DIM,
    char_class_features,
    surface_features,
)
from texoo_ray.stages.extract import SegmentStage, SnippetStage


class TestCharClass:
    def test_classes(self):
        assert char_class_features("(")[4] == 1.0  # open paren
        assert char_class_features(")")[5] == 1.0
        assert char_class_features(",")[7] == 1.0
        assert char_class_features("-")[8] == 1.0
        assert char_class_features(".")[9] == 1.0
        assert char_class_features("...")[10] == 1.0  # colon/ellipsis class
        assert char_class_features("$")[0] == 1.0
        assert char_class_features("+")[1] == 1.0
        assert char_class_features('"')[2] == 1.0
        assert char_class_features("'")[3] == 1.0
        assert char_class_features("/")[6] == 1.0
        assert char_class_features("word").sum() == 0.0
        assert char_class_features("x").shape == (CHAR_CLASS_DIM,)


class TestSurface:
    def test_surface(self):
        v = surface_features("Abc1")
        # startsUpper, mixed case, includesNumeric, endsNumeric
        assert v[0] == 1 and v[4] == 1 and v[6] == 1 and v[8] == 1
        assert surface_features("123")[5] == 1  # all numeric
        assert surface_features("...")[9] == 1 and surface_features("...")[10] == 1


class TestSnippets:
    def _segmented(self, text):
        return SegmentStage(newlines="keep", strip=False)(
            pa.table({"text": [text]})
        )

    def test_windows(self):
        b = self._segmented("One one. Two two. Three three. Four four. Five five.")
        out = SnippetStage(window=3, stride=2)(b)
        snips = out["snippets"][0].as_py()
        assert [(s["sent_begin"], s["sent_end"]) for s in snips] == [(0, 3), (2, 5)]
        sents = out["sentences"][0].as_py()
        assert snips[0]["begin"] == sents[0]["begin"]
        assert snips[0]["end"] == sents[2]["end"]

    def test_short_doc_single_window(self):
        b = self._segmented("Only one sentence here.")
        snips = SnippetStage(window=3, stride=2)(b)["snippets"][0].as_py()
        assert snips == [
            {"sent_begin": 0, "sent_end": 1, "begin": snips[0]["begin"], "end": snips[0]["end"]}
        ]

    def test_empty(self):
        b = SegmentStage(newlines="keep", strip=False)(pa.table({"text": [""]}))
        assert SnippetStage()(b)["snippets"][0].as_py() == []


class TestRetrievalStage:
    def test_term_match_topk(self, ray_session):
        import ray.data

        from texoo_ray.stages.retrieval import term_match_topk

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": ["table table window", "nothing here", "one table"],
            }
        )
        out = term_match_topk(
            ray.data.from_arrow(tbl), ["table", "window"], k=5
        ).to_pandas()
        assert out["doc_id"].tolist() == [1, 3]
        assert out["score"].tolist() == [3, 1]
