"""CDV retrieval family tests (texoo-cdv inference semantics:
WikipediaUrlPreprocessor, AspectPreprocessor, Entity/AspectIndex lookup
splitting, QueryRunner threshold/rank passage extraction)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from texoo_ray.stages.cdv import (
    AspectIndex,
    EntityIndex,
    aspect_preprocess,
    build_aspect_index_from_labels,
    build_entity_index_from_queries,
    clean_wiki_page_title,
    cdv_retrieve,
    bm25_doc_candidates,
    passages_by_rank,
    passages_by_threshold,
    query_vector,
)


class TestPreprocessors:
    def test_wiki_title_url_strip(self):
        assert (
            clean_wiki_page_title("https://en.wikipedia.org/wiki/Diabetes_mellitus")
            == "Diabetes_mellitus"
        )

    def test_wiki_title_anchor_and_percent(self):
        assert clean_wiki_page_title("Foo_bar#Section") == "Foo_bar"
        assert clean_wiki_page_title("A%20B") == "A_B"  # decoded then space->_
        # lone '%' survives (escaped to %25 before decoding)
        assert clean_wiki_page_title("50%_rule") == "50%_rule"

    def test_wiki_title_html_entity_and_spaces(self):
        assert clean_wiki_page_title("Tom &amp; Jerry") == "Tom_&_Jerry"

    def test_aspect_preprocess_chain(self):
        assert aspect_preprocess(" Signs and-Symptoms ") == "signs_and_symptoms"
        assert aspect_preprocess("Fallbeispiel 3 (Übung)") == "fallbeispiel_#_uebung"
        assert aspect_preprocess(None) is None


class TestIndexes:
    def test_entity_multi_id_average(self):
        idx = EntityIndex(4)
        idx.put("A", np.array([1.0, 0, 0, 0]))
        idx.put("B", np.array([0, 1.0, 0, 0]))
        v = idx.lookup("A;B")
        assert np.allclose(v, [0.5, 0.5, 0, 0])
        assert idx.lookup("C") is None

    def test_entity_key_preprocessing(self):
        idx = EntityIndex(4)
        idx.put("https://en.wikipedia.org/wiki/Some_Page", np.ones(4))
        assert idx.lookup("Some Page") is not None  # spaces -> underscores

    def test_entity_encode_underscores(self):
        idx = EntityIndex(16)
        a = idx.encode("Diabetes_mellitus")
        b = idx.encode("Diabetes mellitus")
        assert np.allclose(a, b)

    def test_aspect_heading_split_average(self):
        idx = AspectIndex(4)
        idx.put("symptoms", np.array([1.0, 0, 0, 0]))
        idx.put("treatment", np.array([0, 1.0, 0, 0]))
        v = idx.lookup("Symptoms | Treatment")
        assert np.allclose(v, [0.5, 0.5, 0, 0])
        v2 = idx.lookup("symptoms and treatment")
        assert np.allclose(v2, [0.5, 0.5, 0, 0])
        v3 = idx.lookup("symptoms/treatment")
        assert np.allclose(v3, [0.5, 0.5, 0, 0])

    def test_build_aspect_index_abstract_alias(self):
        idx = build_aspect_index_from_labels(["Abstract", "Symptoms"])
        assert "description" in idx.vectors
        assert "symptoms" in idx.vectors
        assert "abstract" not in idx.vectors

    def test_build_entity_index_from_queries(self):
        qs = [
            {"query_id": "q1", "entity_id": "Foo;Bar", "entity": "foo bar"},
            {"query_id": "q2", "entity_id": None, "entity": "skipped"},
        ]
        idx = build_entity_index_from_queries(qs, dim=16)
        assert set(idx.vectors) == {"Foo", "Bar"}

    def test_query_vector_concat_unit(self):
        ent = EntityIndex(2)
        ent.put("E", np.array([3.0, 4.0]))
        asp = AspectIndex(2)
        asp.put("symptoms", np.array([0.0, 2.0]))
        mode, v = query_vector(
            {"query_id": "q", "entity_id": "E", "entity": "E", "aspect": "Symptoms"},
            ent,
            asp,
        )
        # unit([unit([3,4]), unit([0,2])]) = unit([.6,.8,0,1])
        expect = np.array([0.6, 0.8, 0.0, 1.0])
        expect /= np.linalg.norm(expect)
        assert mode == "fa"
        assert np.allclose(v, expect, atol=1e-6)

    def test_query_vector_entity_only_mode(self):
        # QueryRunner.java:242-243: entity-only queries score against the
        # entity sentence matrix alone, dimension-matched
        ent = EntityIndex(2)
        ent.put("E", np.array([3.0, 4.0]))
        mode, v = query_vector(
            {"query_id": "q", "entity_id": "E", "entity": "E", "aspect": None},
            ent,
            AspectIndex(2),
        )
        assert mode == "f"
        assert np.allclose(v, [0.6, 0.8], atol=1e-6)


class TestPassageExtraction:
    def test_threshold_state_machine(self):
        # QueryRunner.java:354-392 semantics: open at >=0.8, extend while
        # >=0.6, close below 0.6 with score = mean of in-passage values
        bounds = [(0, 10), (11, 20), (21, 30), (31, 40), (41, 50)]
        hist = np.array([0.9, 0.7, 0.5, 0.85, 0.2])
        out = passages_by_threshold(hist, bounds, 0.8, 0.6)
        assert out == [
            (0, 20, (0.9 + 0.7) / 2),
            (31, 40, 0.85),
        ]

    def test_threshold_flush_at_eof(self):
        bounds = [(0, 5), (6, 12)]
        out = passages_by_threshold(np.array([0.95, 0.9]), bounds, 0.8, 0.6)
        assert out == [(0, 12, 0.925)]

    def test_threshold_no_hits(self):
        assert passages_by_threshold(np.array([0.1, 0.2]), [(0, 1), (2, 3)]) == []

    def test_rank_mean_over_overlap(self):
        bounds = [(0, 10), (11, 20), (21, 30)]
        hist = np.array([0.2, 0.6, 1.0])
        out = passages_by_rank(hist, bounds, [(0, 20), (21, 30), (100, 120)])
        assert len(out) == 2
        assert out[0] == (0, 20, (0.2 + 0.6) / 2)
        assert out[1] == (21, 30, 1.0)


class TestCdvRetrieve:
    DOCS = [
        (1, "Apples grow on trees. Bananas are yellow fruit."),
        (2, "Gearbox failure causes grinding noise. Replace the gearbox oil. Totally unrelated closing words."),
        (3, "The weather is sunny today. Rain is expected tomorrow."),
    ]

    def _docs_ds(self):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([d[0] for d in self.DOCS], pa.int64()),
                    "text": pa.array([d[1] for d in self.DOCS], pa.string()),
                }
            )
        )

    def test_end_to_end_threshold(self, ray_session):
        queries = [
            {
                "query_id": "q-gearbox",
                "entity": "gearbox failure",
                "entity_id": None,
                "aspect": "causes",
            }
        ]
        out = cdv_retrieve(
            self._docs_ds(),
            queries,
            k=3,
            thres_in=0.3,
            thres_out=0.2,
            concurrency=1,
        ).to_pandas()
        assert len(out) >= 1
        # best passage must come from the gearbox document
        assert out.iloc[0]["doc_id"] == 2
        assert out.iloc[0]["rank"] == 0
        assert list(out["rank"]) == sorted(out["rank"])

    def test_candidate_restriction(self, ray_session):
        queries = [
            {
                "query_id": "q1",
                "entity": "gearbox failure",
                "entity_id": None,
                "aspect": "causes",
                "candidate_docs": [1, 3],  # exclude the matching doc 2
            }
        ]
        out = cdv_retrieve(
            self._docs_ds(), queries, k=5, thres_in=0.3, thres_out=0.2, concurrency=1
        ).to_pandas()
        assert len(out) == 0 or 2 not in set(out["doc_id"])

    def test_bm25_candidates(self, ray_session):
        queries = [
            {"query_id": "q1", "entity": "gearbox", "entity_id": None, "aspect": ""}
        ]
        with_cands = bm25_doc_candidates(self._docs_ds(), queries, num=1)
        assert with_cands[0]["candidate_docs"] == [2]


def test_cdv_planted_residue_table_pinned(ray_session):
    """CDV_RESIDUE_PASSAGES (the cdv_planted SQL oracle's VALUES
    literals) must equal what the single-process stage computes for
    every residue, and the pattern family must exercise the full
    threshold-machine behavior space: zero-passage docs, EOF flushes,
    extend-only hysteresis (EXT never opens) and reopened two-passage
    docs."""
    from texoo_ray.core.planted import (
        CDV_CYCLE,
        CDV_RESIDUE_PASSAGES,
        cdv_passages_for_residue,
        cdv_planted_text,
    )

    got = {r: cdv_passages_for_residue(r) for r in range(CDV_CYCLE)}
    assert got == CDV_RESIDUE_PASSAGES
    counts = sorted(len(v) for v in got.values())
    assert counts[0] == 0 and counts[-1] == 2  # variety: 0..2 passages
    # hysteresis: residue 3 starts with the extend-only sentence and
    # must NOT open a passage
    assert got[3] == [] and cdv_planted_text(3).startswith("Zephyr.")
    # text depends only on the residue class
    assert cdv_planted_text(5) == cdv_planted_text(5 + CDV_CYCLE * 7)
