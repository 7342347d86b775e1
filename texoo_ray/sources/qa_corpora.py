"""QA / passage-retrieval corpus readers (texoo-cdv reader family).

Covers the observable parse semantics of:

- MedQuADReader.java (texoo-cdv/.../reader/MedQuADReader.java:199-320):
  per-XML Document -> focus entity + QAPair passages; keeps only the
  "Disorders" semantic group, fixes the "What I need to know about "
  focus prefix, rewrites " - " list markers to newlines, applies the
  per-source aspect fixes (NIHSeniorHealth "support groups" -> treatment;
  GHR "treatment" -> dropped).
- HealthQAReader.java (:129-236): TSV lines ``relevant\\tquestion\\t
  passage`` paired with a label file ``id\\tdocstart\\tquestion\\t
  entityId\\tentity\\ttype\\taspect``; only relevant rows are kept,
  docstart==1 opens a new document, queries merge on (entity, aspect).
- MatchZooReader.java (:24-58): the abstract relevance-TSV walk — here a
  concrete ``label\\tquery\\tpassage`` triple parser, the common
  MatchZoo interchange layout.
- WikiSectionQAReader.java (:46-80 convertTrainingPassages): converts a
  WikiSection dataset (our ``read_wikisection`` output) into
  entity-aspect retrieval queries: one query per GOLD section, label
  "abstract" -> "information", query text ``title ; label``, the section
  span as the relevance-1 result.

Every reader returns plain Arrow-rowed Datasets: documents carry
(doc_id, title, text, gold_passages) and queries carry
(query_id, question, entity, entity_id, aspect, doc_id, begin, end,
relevance) — the Query/Result span model (SURVEY.md §1) flattened to
columns.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

PASSAGE_TYPE = pa.list_(
    pa.struct(
        [
            ("begin", pa.int32()),
            ("end", pa.int32()),
            ("id", pa.string()),
            ("label", pa.string()),
        ]
    )
)

QUERY_SCHEMA = pa.schema(
    [
        ("query_id", pa.string()),
        ("question", pa.string()),
        ("entity", pa.string()),
        ("entity_id", pa.string()),
        ("aspect", pa.string()),
        ("doc_id", pa.string()),
        ("begin", pa.int32()),
        ("end", pa.int32()),
        ("relevance", pa.int32()),
    ]
)


def _docs_table(docs: List[Dict]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
            "title": pa.array([d.get("title", "") for d in docs], pa.string()),
            "type": pa.array([d.get("type", "") for d in docs], pa.string()),
            "text": pa.array([d["text"] for d in docs], pa.string()),
            "gold_passages": pa.array(
                [d.get("gold_passages", []) for d in docs], PASSAGE_TYPE
            ),
        }
    )


def _queries_table(qs: List[Dict]) -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([q["query_id"] for q in qs], pa.string()),
            "question": pa.array([q["question"] for q in qs], pa.string()),
            "entity": pa.array([q.get("entity", "") for q in qs], pa.string()),
            "entity_id": pa.array([q.get("entity_id", "") for q in qs], pa.string()),
            "aspect": pa.array([q.get("aspect", "") for q in qs], pa.string()),
            "doc_id": pa.array([q.get("doc_id", "") for q in qs], pa.string()),
            "begin": pa.array([q.get("begin", 0) for q in qs], pa.int32()),
            "end": pa.array([q.get("end", 0) for q in qs], pa.int32()),
            "relevance": pa.array([q.get("relevance", 1) for q in qs], pa.int32()),
        }
    )


# --- MedQuAD ---------------------------------------------------------------


def parse_medquad(xml_text: str, subset: str = "") -> Optional[Tuple[Dict, List[Dict]]]:
    """One MedQuAD XML file -> (document, queries) or None when filtered
    (non-Disorders focus group, MedQuADReader.java:216)."""
    root = ET.fromstring(xml_text)
    source = root.get("source") or ""
    doc_id = "%s_%s" % (source, root.get("id") or "")
    focus = (root.findtext("Focus") or "").replace("What I need to know about ", "")
    group = root.findtext("FocusAnnotations/UMLS/SemanticGroup") or ""
    if group != "Disorders":
        return None
    text_parts: List[str] = []
    passages: List[Dict] = []
    queries: List[Dict] = []
    cursor = 0
    for pair in root.findall("QAPairs/QAPair"):
        q = pair.find("Question")
        qid = q.get("qid") if q is not None else ""
        aspect = (q.get("qtype") if q is not None else "") or ""
        question = (q.text if q is not None else "") or ""
        answer = (pair.findtext("Answer") or "") + "\n"
        answer = answer.replace(" - ", "\n- ")  # MedQuADReader.java:262
        begin = cursor
        text_parts.append(answer)
        cursor += len(answer)
        passage_id = "%s_%s" % (source, qid)
        passages.append(
            {"begin": begin, "end": cursor, "id": passage_id, "label": aspect}
        )
        # aspect fixes, MedQuADReader.java:277-284
        if source == "NIHSeniorHealth" and aspect == "support groups":
            aspect = "treatment"
        elif source == "GHR" and aspect == "treatment":
            continue  # generic links only -> no query
        queries.append(
            {
                "query_id": passage_id,
                "question": question.strip(),
                "entity": focus,
                "entity_id": "",
                "aspect": aspect,
                "doc_id": doc_id,
                "begin": begin,
                "end": cursor,
                "relevance": 1,
            }
        )
    doc = {
        "doc_id": doc_id,
        "title": focus,
        "type": subset.replace("_QA", ""),
        "text": "".join(text_parts),
        "gold_passages": passages,
    }
    return doc, queries


def read_medquad(paths):
    """Ray reader: (documents_ds, queries_ds). The subset name derives
    from the MedQuAD folder layout ``<n>_<subset>/file.xml``
    (MedQuADReader.java:57 subsetPattern)."""
    import ray.data

    pat = re.compile(r".*/(\d+)_([^/]+)/[^/]+\.xml$")

    def parse_docs(batch: pa.Table) -> pa.Table:
        docs = []
        for path, payload in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            m = pat.match(path)
            subset = m.group(2) if m else ""
            parsed = parse_medquad(payload.decode("utf-8", errors="replace"), subset)
            if parsed:
                docs.append(parsed[0])
        return _docs_table(docs)

    def parse_queries(batch: pa.Table) -> pa.Table:
        qs: List[Dict] = []
        for path, payload in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            m = pat.match(path)
            subset = m.group(2) if m else ""
            parsed = parse_medquad(payload.decode("utf-8", errors="replace"), subset)
            if parsed:
                qs.extend(parsed[1])
        return _queries_table(qs)

    raw = ray.data.read_binary_files(paths, include_paths=True)
    return (
        raw.map_batches(parse_docs, batch_format="pyarrow"),
        raw.map_batches(parse_queries, batch_format="pyarrow"),
    )


# --- MatchZoo --------------------------------------------------------------


def parse_matchzoo(tsv_text: str) -> List[Dict]:
    """``label\\tquery\\tpassage`` rows (the MatchZoo interchange layout
    the abstract MatchZooReader walks, MatchZooReader.java:24-58)."""
    rows = []
    for i, line in enumerate(tsv_text.splitlines()):
        parts = line.split("\t")
        if len(parts) < 3:
            continue
        rows.append(
            {
                "line": i,
                "relevant": parts[0].strip() == "1",
                "question": parts[1],
                "passage": parts[2],
            }
        )
    return rows


def read_matchzoo(paths):
    """Ray reader: Dataset[(file, line, relevant, question, passage)]."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        files, lines, rel, qs, ps = [], [], [], [], []
        for path, payload in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            name = os.path.basename(path)
            for r in parse_matchzoo(payload.decode("utf-8", errors="replace")):
                files.append(name)
                lines.append(r["line"])
                rel.append(r["relevant"])
                qs.append(r["question"])
                ps.append(r["passage"])
        return pa.table(
            {
                "file": pa.array(files, pa.string()),
                "line": pa.array(lines, pa.int64()),
                "relevant": pa.array(rel, pa.bool_()),
                "question": pa.array(qs, pa.string()),
                "passage": pa.array(ps, pa.string()),
            }
        )

    return ray.data.read_binary_files(paths, include_paths=True).map_batches(
        parse, batch_format="pyarrow"
    )


# --- HealthQA --------------------------------------------------------------


def parse_healthqa(
    tsv_text: str, labels_text: str, file_name: str
) -> Tuple[List[Dict], List[Dict]]:
    """HealthQAReader.java:129-236: keep relevant rows only; the label
    file (one row PER RELEVANT LINE after a header) supplies docstart,
    entity, entityId and aspect; docstart==1 opens a new document;
    queries merge on (entity, aspect)."""
    labels = labels_text.splitlines()[1:]  # skip header
    label_it = iter(labels)
    docs: List[Dict] = []
    queries: List[Dict] = []
    by_entity_aspect: Dict[Tuple[str, str], Dict] = {}
    doc: Optional[Dict] = None
    for line_idx, line in enumerate(tsv_text.splitlines()):
        parts = line.split("\t")
        if len(parts) < 3:
            continue
        if parts[0].strip() != "1":
            continue  # skip negative samples (:159)
        label = next(label_it).split("\t")
        passage_id = "%s-%d" % (file_name, line_idx)
        doc_start = label[1].strip() == "1"
        question = parts[1]
        text = parts[2]
        entity_id = label[3] if len(label) > 3 else ""
        entity = label[4] if len(label) > 4 else ""
        aspect = label[6] if len(label) > 6 else ""
        if doc_start:
            if doc and doc["text"].strip():
                docs.append(doc)
            doc = {
                "doc_id": "%s-doc-%d" % (file_name, line_idx),
                "title": entity,
                "type": "healthqa",
                "text": "",
                "gold_passages": [],
            }
        # trailing comma fix (:181-182)
        if len(text) >= 2 and text[-2] == ",":
            text = text[:-2]
        passage = text.strip() + "\n"
        begin = len(doc["text"])
        doc["text"] += passage
        end = len(doc["text"])
        doc["gold_passages"].append(
            {"begin": begin, "end": end, "id": passage_id, "label": question}
        )
        key = (entity, aspect)
        if key not in by_entity_aspect:
            q = {
                "query_id": passage_id,
                "question": question,
                "entity": entity,
                "entity_id": entity_id,
                "aspect": aspect,
                "doc_id": doc["doc_id"],
                "begin": begin,
                "end": end,
                "relevance": 1,
            }
            by_entity_aspect[key] = q
            queries.append(q)
    if doc and doc["text"].strip():
        docs.append(doc)
    return docs, queries


def read_healthqa(data_path: str, labels_path: str):
    """Ray reader: (documents_ds, queries_ds) from one HealthQA TSV +
    label CSV pair. Files are line-aligned, so they parse together."""
    import ray.data

    name = os.path.basename(data_path).replace(".txt", "")
    with open(data_path, encoding="utf-8") as f:
        tsv = f.read()
    with open(labels_path, encoding="utf-8") as f:
        labels = f.read()
    docs, queries = parse_healthqa(tsv, labels, name)
    return (
        ray.data.from_arrow(_docs_table(docs)),
        ray.data.from_arrow(_queries_table(queries)),
    )


# --- WikiSectionQA ---------------------------------------------------------


def wikisection_qa_queries(ds):
    """WikiSectionQAReader.convertTrainingPassages (:46-80): one retrieval
    query per GOLD section of a WikiSection dataset — label lowercased
    with ';' -> ' ', "abstract" -> "information", query text
    ``title ; label``, the section span as the relevance-1 result.

    Pure per-batch transform over ``read_wikisection`` output."""

    def convert(batch: pa.Table) -> pa.Table:
        qs: List[Dict] = []
        for doc_id, title, sections in zip(
            batch["doc_id"].to_pylist(),
            batch["title"].to_pylist(),
            batch["gold_sections"].to_pylist(),
        ):
            ordered = sorted(sections or [], key=lambda s: (s["begin"], s["end"]))
            for count, ann in enumerate(ordered):
                label = (ann.get("label") or ann.get("heading") or "").replace(
                    ";", " "
                ).lower()
                if label == "abstract":
                    label = "information"
                qs.append(
                    {
                        "query_id": "%s-%d" % (doc_id, count),
                        "question": "%s ; %s" % (title, label),
                        "entity": title,
                        "entity_id": doc_id,
                        "aspect": label,
                        "doc_id": doc_id,
                        "begin": ann["begin"],
                        "end": ann["end"],
                        "relevance": 1,
                    }
                )
        return _queries_table(qs)

    return ds.map_batches(convert, batch_format="pyarrow")
