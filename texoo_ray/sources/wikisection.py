"""WikiSection JSON reader.

Parses the public WikiSection dataset format as consumed by the
reference's WikiSectionReader (WikiSectionReader.java:31-45; field layout
WikiDocument.java:14 ``{id, type, title, abstract, text, annotations}``
and SectionAnnotation.java:23 ``{class, source, begin, length,
sectionHeading, sectionLabel}``): every annotation becomes a GOLD section
with confidence 1.0 and ``end = begin + length``; empty documents are
skipped.
"""

from __future__ import annotations

import json
from typing import Dict, List

import pyarrow as pa

from ..stages import schema


def parse_wikisection_docs(payload: str) -> List[Dict]:
    """Parse one JSON payload (array of documents, or one per line)."""
    payload = payload.strip()
    if not payload:
        return []
    if payload.startswith("["):
        raw_docs = json.loads(payload)
    else:
        raw_docs = [json.loads(line) for line in payload.splitlines() if line.strip()]
    out: List[Dict] = []
    for d in raw_docs:
        text = d.get("text") or ""
        if not text.strip():
            continue
        sections = []
        for a in d.get("annotations") or []:
            begin = int(a.get("begin", 0))
            length = int(a.get("length", 0))
            sections.append(
                {
                    "begin": begin,
                    "end": begin + length,
                    "label": a.get("sectionLabel") or "",
                    "heading": a.get("sectionHeading") or "",
                    "confidence": 1.0,
                }
            )
        out.append(
            {
                "doc_id": str(d.get("id") or ""),
                "title": d.get("title") or "",
                "text": text,
                "gold_sections": sections,
            }
        )
    return out


def _to_table(docs: List[Dict]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
            "title": pa.array([d["title"] for d in docs], pa.string()),
            "text": pa.array([d["text"] for d in docs], pa.string()),
            "gold_sections": pa.array(
                [d["gold_sections"] for d in docs], schema.SECTION_TYPE
            ),
        }
    )


def read_wikisection(paths):
    """Ray reader: one document row per WikiSection article."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        docs: List[Dict] = []
        for payload in batch["bytes"].to_pylist():
            docs.extend(parse_wikisection_docs(payload.decode("utf-8")))
        return _to_table(docs)

    return ray.data.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow"
    )
