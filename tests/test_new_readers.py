"""Parse tests for the round-2 readers: WNED, MultiSeg, WikiCities,
MedQuAD, HealthQA, MatchZoo, WikiSectionQA (hand-built fixtures that
mirror each reference format)."""

import textwrap

import pyarrow as pa

from texoo_ray.sources.entity_linking import (
    normalize_wned_text,
    parse_wned_xml,
)
from texoo_ray.sources.qa_corpora import (
    parse_healthqa,
    parse_matchzoo,
    parse_medquad,
)
from texoo_ray.sources.segmentation_corpora import (
    parse_multiseg,
    parse_multiseg_labels,
    parse_wikicities,
)

WNED_XML = """<?xml version="1.0" encoding="UTF-8"?>
<wned.entityAnnotation>
  <document docName="doc1.txt">
    <annotation>
      <mention>Barack Obama</mention>
      <wikiName>Barack Obama</wikiName>
      <offset>0</offset>
      <length>12</length>
    </annotation>
    <annotation>
      <mention>Berlin</mention>
      <wikiName>NIL</wikiName>
      <offset>20</offset>
      <length>99</length>
    </annotation>
  </document>
  <document docName="doc2.txt"/>
</wned.entityAnnotation>
"""


class TestWned:
    def test_parse_annotations(self):
        anns = parse_wned_xml(WNED_XML)
        assert set(anns) == {"doc1.txt", "doc2.txt"}
        a = anns["doc1.txt"]
        assert a[0]["text"] == "Barack Obama" and a[0]["ref_id"] == "Barack Obama"
        assert a[0]["begin"] == 0 and a[0]["end"] == 12
        assert a[0]["source"] == "GOLD" and a[0]["confidence"] == 1.0

    def test_length_repair(self):
        # length 99 != len("Berlin") -> repaired (WNEDDataset.java:178-183)
        a = parse_wned_xml(WNED_XML)["doc1.txt"][1]
        assert a["end"] - a["begin"] == len("Berlin")
        assert a["ref_id"] == "NIL"

    def test_double_newline_collapse(self):
        assert normalize_wned_text("a.\n\nb.") == "a. \nb."

    def test_ray_reader(self, ray_session, tmp_path):
        from texoo_ray.sources.entity_linking import read_wned

        (tmp_path / "doc1.txt").write_text("Barack Obama visited\n\nBerlin today.")
        (tmp_path / "doc2.txt").write_text("No annotations here.")
        xml = tmp_path / "anns.xml"
        xml.write_text(WNED_XML)
        df = read_wned(str(xml), str(tmp_path)).to_pandas().set_index("doc_id")
        assert len(df) == 2
        assert df.loc["doc1.txt", "gold_entities"][0]["text"] == "Barack Obama"
        assert len(df.loc["doc2.txt", "gold_entities"]) == 0


class TestMultiSeg:
    LABELS = "topicA 0::0-1 1::0-0\ntopicB 0::3-4\n"
    TEXT = "line0\nline1\nskipped\nline3\nline4\ntrailing\n"

    def test_labels(self):
        starts, ends = parse_multiseg_labels(self.LABELS, 0)
        assert starts == {0, 3} and ends == {1, 4}

    def test_sections_and_dropped_lines(self):
        d = parse_multiseg(self.TEXT, self.LABELS, 0, "f.0")
        assert len(d["gold_sections"]) == 2
        # lines 'skipped' and 'trailing' are outside every range -> dropped
        assert "skipped" not in d["text"] and "trailing" not in d["text"]
        s0, s1 = d["gold_sections"]
        assert d["text"][s0["begin"] : s0["end"]] == "line0\nline1\n"
        assert d["text"][s1["begin"] : s1["end"]] == "line3\nline4\n"
        assert s0["label"] == "0" and s1["label"] == "1"

    def test_other_doc_num(self):
        d = parse_multiseg(self.TEXT, self.LABELS, 1, "f.1")
        assert len(d["gold_sections"]) == 1
        assert d["text"] == "line0\n"

    def test_ray_reader(self, ray_session, tmp_path):
        from texoo_ray.sources.segmentation_corpora import read_multiseg

        (tmp_path / "set.0").write_text(self.TEXT)
        (tmp_path / "set.label").write_text(self.LABELS)
        df = read_multiseg([str(tmp_path / "set.0")]).to_pandas()
        assert len(df) == 1 and len(df["gold_sections"][0]) == 2


class TestWikiCities:
    TEXT = textwrap.dedent(
        """\
        1,1,TOP-LEVEL SEGMENT,City intro sentence
        1,2,History,Founded long ago
        1,3,History,Grew over time
        1,4,Economy,Farms and mills
        2,1,History,Another city history
        """
    )

    def test_documents_and_sections(self):
        docs = parse_wikicities(self.TEXT)
        assert [d["doc_id"] for d in docs] == ["1", "2"]
        d1 = docs[0]
        labels = [s["label"] for s in d1["gold_sections"]]
        assert labels == ["history", "economy"]
        h = d1["gold_sections"][0]
        assert d1["text"][h["begin"] : h["end"]] == "Founded long ago . Grew over time ."
        assert d1["gold_sections"][0]["heading"] == "history"

    def test_top_level_kept_when_not_skipped(self):
        docs = parse_wikicities(self.TEXT, skip_top_level=False)
        labels = [s["label"] for s in docs[0]["gold_sections"]]
        assert labels[0] == "preface"

    def test_label_spacing_underscore(self):
        docs = parse_wikicities("3,1,Early History,Once upon a time\n")
        assert docs[0]["gold_sections"][0]["label"] == "early_history"


MEDQUAD_XML = """<?xml version="1.0" encoding="UTF-8"?>
<Document id="0000001" source="GARD" url="https://example.org/q1">
  <Focus>What I need to know about Gout</Focus>
  <FocusAnnotations>
    <UMLS>
      <CUIs><CUI>C0018099</CUI></CUIs>
      <SemanticGroup>Disorders</SemanticGroup>
    </UMLS>
  </FocusAnnotations>
  <QAPairs>
    <QAPair pid="1">
      <Question qid="0000001-1" qtype="information">What is gout?</Question>
      <Answer>Gout is a form of arthritis. Symptoms include - pain - swelling</Answer>
    </QAPair>
    <QAPair pid="2">
      <Question qid="0000001-2" qtype="treatment">How to treat gout?</Question>
      <Answer>Medication helps.</Answer>
    </QAPair>
  </QAPairs>
</Document>
"""


class TestMedQuAD:
    def test_parse_document(self):
        doc, queries = parse_medquad(MEDQUAD_XML, "GARD_QA")
        assert doc["doc_id"] == "GARD_0000001"
        assert doc["title"] == "Gout"  # prefix fix applied
        assert doc["type"] == "GARD"
        assert len(doc["gold_passages"]) == 2
        # " - " list markers rewritten to newlines (MedQuADReader.java:262)
        assert "\n- pain\n- swelling" in doc["text"]
        p0 = doc["gold_passages"][0]
        assert doc["text"][p0["begin"] : p0["end"]].startswith("Gout is a form")

    def test_queries(self):
        _, queries = parse_medquad(MEDQUAD_XML, "GARD_QA")
        assert len(queries) == 2
        assert queries[0]["aspect"] == "information"
        assert queries[0]["question"] == "What is gout?"
        assert queries[0]["entity"] == "Gout"

    def test_non_disorders_filtered(self):
        xml = MEDQUAD_XML.replace("Disorders", "Genes")
        assert parse_medquad(xml, "GARD_QA") is None

    def test_ghr_treatment_query_dropped(self):
        xml = MEDQUAD_XML.replace('source="GARD"', 'source="GHR"')
        doc, queries = parse_medquad(xml, "GHR_QA")
        # passage kept, query dropped (MedQuADReader.java:281-283)
        assert len(doc["gold_passages"]) == 2
        assert len(queries) == 1 and queries[0]["aspect"] == "information"


HEALTHQA_TSV = (
    "1\tWhat is diabetes ?\tDiabetes is a disease.\n"
    "0\tWhat is diabetes ?\tUnrelated negative passage.\n"
    "1\tHow to treat diabetes ?\tWith insulin.\n"
    "1\tWhat is asthma ?\tAsthma affects airways.\n"
)
HEALTHQA_LABELS = (
    "id\tdocstart\tquestion\tentityId\tentity\ttype\taspect\n"
    "0\t1\tWhat is diabetes ?\tQ12206\tdiabetes\tdisease\tinformation\n"
    "2\t0\tHow to treat diabetes ?\tQ12206\tdiabetes\tdisease\ttreatment\n"
    "3\t1\tWhat is asthma ?\tQ35869\tasthma\tdisease\tinformation\n"
)


class TestHealthQA:
    def test_documents(self):
        docs, queries = parse_healthqa(HEALTHQA_TSV, HEALTHQA_LABELS, "dev")
        assert len(docs) == 2
        assert docs[0]["title"] == "diabetes"
        assert "Diabetes is a disease." in docs[0]["text"]
        assert "With insulin." in docs[0]["text"]
        assert "Unrelated negative" not in docs[0]["text"]
        assert docs[1]["title"] == "asthma"

    def test_passage_spans(self):
        docs, _ = parse_healthqa(HEALTHQA_TSV, HEALTHQA_LABELS, "dev")
        for d in docs:
            for p in d["gold_passages"]:
                assert d["text"][p["begin"] : p["end"]].strip()

    def test_queries_merge_on_entity_aspect(self):
        _, queries = parse_healthqa(HEALTHQA_TSV, HEALTHQA_LABELS, "dev")
        keys = {(q["entity"], q["aspect"]) for q in queries}
        assert keys == {
            ("diabetes", "information"),
            ("diabetes", "treatment"),
            ("asthma", "information"),
        }
        assert all(q["entity_id"] for q in queries)


class TestMatchZoo:
    def test_parse(self):
        rows = parse_matchzoo("1\tq one\tp one\n0\tq two\tp two\nbroken line\n")
        assert len(rows) == 2
        assert rows[0]["relevant"] is True and rows[1]["relevant"] is False
        assert rows[1]["question"] == "q two"

    def test_ray_reader(self, ray_session, tmp_path):
        from texoo_ray.sources.qa_corpora import read_matchzoo

        p = tmp_path / "data.txt"
        p.write_text("1\tq\tp\n0\tq\tn\n")
        df = read_matchzoo([str(p)]).to_pandas()
        assert len(df) == 2 and df["relevant"].tolist() == [True, False]


class TestWikiSectionQA:
    def test_convert(self, ray_session):
        import ray.data

        from texoo_ray.sources.qa_corpora import wikisection_qa_queries
        from texoo_ray.stages import schema

        tbl = pa.table(
            {
                "doc_id": pa.array(["d1"], pa.string()),
                "title": pa.array(["Gout"], pa.string()),
                "text": pa.array(["abstract text here body text here"], pa.string()),
                "gold_sections": pa.array(
                    [
                        [
                            {"begin": 0, "end": 18, "label": "abstract",
                             "heading": "Abstract", "confidence": 1.0},
                            {"begin": 18, "end": 33, "label": "disease;treatment",
                             "heading": "Treatment", "confidence": 1.0},
                        ]
                    ],
                    schema.SECTION_TYPE,
                ),
            }
        )
        df = wikisection_qa_queries(ray.data.from_arrow(tbl)).to_pandas()
        assert len(df) == 2
        assert df["question"].tolist() == ["Gout ; information", "Gout ; disease treatment"]
        assert df["query_id"].tolist() == ["d1-0", "d1-1"]
        assert df["relevance"].tolist() == [1, 1]
        assert df["begin"].tolist() == [0, 18]


class TestRegistry:
    def test_all_builtin_readers_registered(self):
        from texoo_ray.sources import READERS, get_reader

        for name in (
            "raw_text", "conll", "json", "wikisection", "wiki727", "choi",
            "multiseg", "wikicities", "wned", "medquad", "healthqa", "matchzoo",
        ):
            assert callable(get_reader(name)), name

    def test_unknown_reader_raises(self):
        import pytest

        from texoo_ray.sources import get_reader

        with pytest.raises(KeyError):
            get_reader("nope")


class TestPassageCandidates:
    def test_candidates(self, ray_session):
        import ray.data

        from texoo_ray.sources.qa_corpora import (
            _docs_table,
            _queries_table,
            parse_healthqa,
        )
        from texoo_ray.stages.retrieval import passage_candidates

        docs, queries = parse_healthqa(HEALTHQA_TSV, HEALTHQA_LABELS, "dev")
        out = passage_candidates(
            ray.data.from_arrow(_docs_table(docs)),
            ray.data.from_arrow(_queries_table(queries)),
            num=5,
        ).to_pandas()
        # every query got results, gold first with relevance 1
        for qid, grp in out.groupby("query_id"):
            grp = grp.sort_values("rank")
            assert grp["rank"].tolist() == list(range(len(grp)))
            assert grp.iloc[0]["relevance"] == 1
            assert grp["passage_id"].is_unique
            assert len(grp) <= 5
        # the diabetes query retrieves a diabetes-document passage
        q_diab = out[(out["query_id"] == "dev-0") & (out["relevance"] == 0)]
        assert any("dev-" in p for p in q_diab["passage_id"])
