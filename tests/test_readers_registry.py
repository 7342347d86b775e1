"""Tests: retrieval metrics, pipeline registry, raw-text + corpus readers."""

import pytest

from texoo_ray.core.retrieval import (
    average_precision,
    evaluate_queries,
    ndcg_at_k,
    precision_at_k,
    reciprocal_rank,
)
from texoo_ray.sources.segmentation_corpora import parse_choi, parse_wiki727

WIKI = """========,1,History.
The town was founded long ago.
It grew quickly.
***LIST***
========,2,Early years.
Settlers arrived by boat.
========,1,Geography.
The town sits on a hill.
"""

CHOI = """line one of segment a
line two of segment a
==========
segment b starts here
==========
final segment c
"""


class TestRetrievalMetrics:
    def test_p_at_k(self):
        assert precision_at_k([1, 2, 3, 4], {2, 4}, 2) == 0.5
        assert precision_at_k([], {1}, 3) == 0.0

    def test_rr(self):
        assert reciprocal_rank([5, 2, 1], {1}) == pytest.approx(1 / 3)
        assert reciprocal_rank([5], {1}) == 0.0

    def test_ap(self):
        # hits at ranks 1 and 3 of 2 relevant: (1/1 + 2/3)/2
        assert average_precision([1, 9, 2], {1, 2}) == pytest.approx((1 + 2 / 3) / 2)

    def test_ndcg_perfect(self):
        assert ndcg_at_k([1, 2], {1: 2.0, 2: 1.0}, 2) == pytest.approx(1.0)
        assert ndcg_at_k([2, 1], {1: 2.0, 2: 1.0}, 2) < 1.0

    def test_evaluate_queries(self):
        res = evaluate_queries({"q": [1, 2, 3]}, {"q": {1, 3}}, k=3)
        assert res["p_at_k"] == pytest.approx(2 / 3)
        assert res["mrr"] == 1.0


class TestWiki727:
    def test_sections_and_text(self):
        d = parse_wiki727(WIKI, "doc1")
        assert "***LIST***" not in d["text"]
        assert "========" not in d["text"]
        headings = [s["heading"] for s in d["gold_sections"]]
        assert headings == ["History", "History | Early years", "Geography"]
        for s in d["gold_sections"]:
            assert d["text"][s["begin"] : s["end"]].strip()

    def test_level_filter_merges(self):
        d = parse_wiki727(WIKI, "doc1", max_level=1)
        headings = [s["heading"] for s in d["gold_sections"]]
        assert headings == ["History", "Geography"]
        # the level-2 content stays inside History's span
        hist = d["gold_sections"][0]
        assert "Settlers arrived" in d["text"][hist["begin"] : hist["end"]]


class TestChoi:
    def test_segments(self):
        d = parse_choi(CHOI, "c1")
        assert len(d["gold_sections"]) == 3
        assert d["text"][d["gold_sections"][1]["begin"] :].startswith("segment b")


class TestRegistry:
    def test_build_and_run(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.registry import build_pipeline, registered
        from texoo_ray.sources.turns import turns_table

        assert "segment" in registered() and "extract" in registered()
        spec = [
            {"stage": "segment", "newlines": "keep"},
            {"stage": "tag"},
            {"stage": "mention_decode"},
            {"stage": "sections", "method": "nl"},
        ]
        fn = build_pipeline(spec)
        out = fn(ray.data.from_arrow(turns_table(0, 5))).to_pandas()
        assert {"sentences", "tokens", "tags", "mentions", "sections"} <= set(
            out.columns
        )

    def test_unknown_stage(self):
        from texoo_ray.pipelines.registry import build_pipeline

        with pytest.raises(KeyError):
            build_pipeline([{"stage": "nope"}])


class TestRawTextReader:
    def test_read_directory(self, ray_session, tmp_path):
        from texoo_ray.sources.raw_text import list_files, read_raw_text

        (tmp_path / "a.txt").write_text("Title line\nBody text here.")
        (tmp_path / "b.txt").write_text("Second file.")
        (tmp_path / "c.log").write_text("skip me")
        (tmp_path / "empty.txt").write_text("   ")
        files = list_files(str(tmp_path), pattern=r".*\.txt")
        assert [f.split("/")[-1] for f in files] == ["a.txt", "b.txt", "empty.txt"]
        ds = read_raw_text(str(tmp_path), pattern=r".*\.txt", use_first_line_as_title=True)
        df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert df["doc_id"].tolist() == ["a.txt", "b.txt"]  # empty skipped
        assert df["title"][0] == "Title line"
        assert df["text"][0] == "Body text here."


class TestWikiSection:
    DOC = {
        "id": "Q123",
        "type": "disease",
        "title": "Dementia",
        "abstract": "About dementia.",
        "text": "Symptoms include memory loss. Treatment involves therapy.",
        "annotations": [
            {"class": "SectionAnnotation", "source": "GOLD", "begin": 0,
             "length": 29, "sectionHeading": "Signs | Symptoms",
             "sectionLabel": "disease.symptom"},
            {"class": "SectionAnnotation", "source": "GOLD", "begin": 30,
             "length": 27, "sectionHeading": "Treatment",
             "sectionLabel": "disease.treatment"},
        ],
    }

    def test_parse_array_payload(self):
        import json

        from texoo_ray.sources.wikisection import parse_wikisection_docs

        docs = parse_wikisection_docs(json.dumps([self.DOC, {"id": "e", "text": "  "}]))
        assert len(docs) == 1  # empty doc skipped (WikiSectionReader.java:40-41)
        d = docs[0]
        assert d["doc_id"] == "Q123"
        secs = d["gold_sections"]
        assert [(s["begin"], s["end"]) for s in secs] == [(0, 29), (30, 57)]
        assert secs[0]["label"] == "disease.symptom"
        assert secs[0]["heading"] == "Signs | Symptoms"
        assert d["text"][secs[1]["begin"]:secs[1]["end"]] == "Treatment involves therapy."

    def test_ray_reader(self, ray_session, tmp_path):
        import json

        from texoo_ray.sources.wikisection import read_wikisection

        p = tmp_path / "wikisection_en_test.json"
        p.write_text(json.dumps([self.DOC]))
        df = read_wikisection([str(p)]).to_pandas()
        assert len(df) == 1
        assert df["gold_sections"][0][0]["label"] == "disease.symptom"


class TestPipelineBundle:
    def test_save_load_roundtrip_with_artifacts(self, ray_session, tmp_path):
        """Annotator.writeModel/loadAnnotator analogue: spec + externalized
        component resources reload into a working pipeline."""
        import json
        import os

        import ray.data

        from texoo_ray.pipelines.registry import (
            build_pipeline,
            load_pipeline,
            save_pipeline,
        )
        from texoo_ray.sources.turns import turns_table

        terms = ["Berlin", "quick fox"]
        spec = [
            {"stage": "segment", "newlines": "keep"},
            {"stage": "gazetteer", "terms": terms, "concurrency": 1},
        ]
        bundle = str(tmp_path / "bundle")
        spec_file = save_pipeline(spec, bundle, name="annotator")
        # terms externalized out of the spec json into an artifact file
        with open(spec_file) as f:
            saved = json.load(f)
        assert saved["stages"][1]["terms"] == {"$file": "01_gazetteer_terms.json"}
        assert os.path.exists(os.path.join(bundle, "01_gazetteer_terms.json"))

        ds = ray.data.from_arrow(turns_table(0, 5))
        direct = build_pipeline(spec)(ds).to_pandas()
        loaded = load_pipeline(bundle)(ds).to_pandas()
        assert list(direct.columns) == list(loaded.columns)
        assert len(direct) == len(loaded)

    def test_load_discovers_spec_file(self, tmp_path):
        from texoo_ray.pipelines.registry import load_pipeline, save_pipeline

        save_pipeline([{"stage": "segment"}], str(tmp_path), name="myname")
        (tmp_path / "unrelated.json").write_text('{"x": 1}')
        fn = load_pipeline(str(tmp_path))  # findXML-style discovery
        assert callable(fn)
