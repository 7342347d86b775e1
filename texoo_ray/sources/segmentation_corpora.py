"""Segmentation-corpus readers: Wiki727-style and Choi-style formats.

Mirrors the observable parse semantics of the reference's readers
(/root/reference/texoo-sector/src/main/java/de/datexis/sector/reader/):

- Wiki727Reader.java:37-140: ``========,<level>,<heading>.`` marker lines
  open sections; the heading path is rebuilt as ``parent | child`` from
  the level stack; sections below ``max_level`` are merged into their
  parent; ``***LIST*** / ***formula*** / ***codice***`` placeholder lines
  are stripped.
- ChoiDatasetReader: segments separated by ``==========`` lines.

Output rows carry (doc_id, text, gold_sections) where gold_sections are
GOLD SectionAnnotations over the concatenated text (confidence 1.0, like
WikiSectionReader.java:31-45).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from ..stages import schema

_WIKI_MARKER_RE = re.compile(r"^========,(\d+),(.*?)\.?\s*$")
_PLACEHOLDER_LINE_RE = re.compile(r"^\s*\*\*\*(?:LIST|formula|codice)\*\*\*\s*$")
_CHOI_SEP_RE = re.compile(r"^==========\s*$")


def parse_wiki727(text: str, doc_id: str = "", max_level: int = 2) -> Dict:
    """One Wiki727 document -> {doc_id, text, gold_sections}."""
    heading_stack: List[Tuple[int, str]] = []
    sections: List[Dict] = []
    out_lines: List[str] = []
    cursor = 0
    open_begin: Optional[int] = None
    open_heading = ""

    def close(end: int):
        nonlocal open_begin
        if open_begin is not None and end > open_begin:
            sections.append(
                {
                    "begin": open_begin,
                    "end": end,
                    "label": open_heading.lower().replace(" | ", "/"),
                    "heading": open_heading,
                    "confidence": 1.0,
                }
            )
        open_begin = None

    for line in text.splitlines():
        m = _WIKI_MARKER_RE.match(line)
        if m:
            level = int(m.group(1))
            heading = m.group(2).strip()
            while heading_stack and heading_stack[-1][0] >= level:
                heading_stack.pop()
            heading_stack.append((level, heading))
            if level <= max_level:
                close(cursor)
                open_heading = " | ".join(h for _, h in heading_stack)
                open_begin = None  # opens at first content line
            continue
        if _PLACEHOLDER_LINE_RE.match(line):
            continue
        if out_lines:
            out_lines.append("\n")
            cursor += 1
        out_lines.append(line)
        if open_begin is None and line.strip():
            open_begin = cursor
        cursor += len(line)
    close(cursor)
    return {"doc_id": doc_id, "text": "".join(out_lines), "gold_sections": sections}


def parse_choi(text: str, doc_id: str = "") -> Dict:
    """Choi corpus document: ``==========`` separates segments."""
    sections: List[Dict] = []
    out: List[str] = []
    cursor = 0
    seg_begin: Optional[int] = None
    seg_idx = 0

    def close(end: int):
        nonlocal seg_begin, seg_idx
        if seg_begin is not None and end > seg_begin:
            sections.append(
                {
                    "begin": seg_begin,
                    "end": end,
                    "label": "seg-%d" % seg_idx,
                    "heading": "",
                    "confidence": 1.0,
                }
            )
            seg_idx += 1
        seg_begin = None

    for line in text.splitlines():
        if _CHOI_SEP_RE.match(line):
            close(cursor)
            continue
        if out:
            out.append("\n")
            cursor += 1
        out.append(line)
        if seg_begin is None and line.strip():
            seg_begin = cursor
        cursor += len(line)
    close(cursor)
    return {"doc_id": doc_id, "text": "".join(out), "gold_sections": sections}


def _to_table(docs: List[Dict]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
            "text": pa.array([d["text"] for d in docs], pa.string()),
            "gold_sections": pa.array(
                [d["gold_sections"] for d in docs], schema.SECTION_TYPE
            ),
        }
    )


def read_wiki727(paths, max_level: int = 2):
    """Ray reader: one document per file."""
    import os

    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        docs = [
            parse_wiki727(
                payload.decode("utf-8", errors="replace"),
                os.path.basename(path),
                max_level,
            )
            for path, payload in zip(
                batch["path"].to_pylist(), batch["bytes"].to_pylist()
            )
        ]
        return _to_table(docs)

    return ray.data.read_binary_files(paths, include_paths=True).map_batches(
        parse, batch_format="pyarrow"
    )
