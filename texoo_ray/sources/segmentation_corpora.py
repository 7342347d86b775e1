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

import os
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


# --- MultiSeg (MultiSegReader.java) ----------------------------------------


def parse_multiseg_labels(label_text: str, doc_num: int):
    """Line-range section starts/ends for one document of the set
    (MultiSegReader.java:readSectionsFromLabel:139-170): each label line is
    ``topicLabel docId::start-end docId::start-end ...``."""
    starts, ends = set(), set()
    for line in label_text.splitlines():
        toks = line.split()
        if not toks:
            continue
        for token in toks[1:]:
            seg = token.split("::")
            if len(seg) != 2:
                continue
            did = int(seg[0])
            pts = seg[1].split("-")
            if did == doc_num and len(pts) == 2:
                starts.add(int(pts[0]))
                ends.add(int(pts[1]))
    return starts, ends


def parse_multiseg(text: str, label_text: str, doc_num: int, doc_id: str = "") -> Dict:
    """One MultiSeg document: label-file line ranges become GOLD sections
    numbered by order (MultiSegReader.java:58-137). Lines outside any
    [start, end] range are dropped, exactly like the reference (the buffer
    resets at every section start and the trailing close is disabled,
    :96-118). Section text keeps one line per paragraph."""
    starts, ends = parse_multiseg_labels(label_text, doc_num)
    sections: List[Dict] = []
    pieces: List[str] = []
    buf: List[str] = []
    cursor = 0
    n = 0
    for i, line in enumerate(text.splitlines()):
        if i in starts:
            buf = []
        buf.append(line)
        if i in ends:
            sec_text = "\n".join(s.strip() for s in buf if s.strip())
            if sec_text:
                sec_text += "\n"
                sections.append(
                    {
                        "begin": cursor,
                        "end": cursor + len(sec_text),
                        "label": str(n),
                        "heading": str(n),
                        "confidence": 1.0,
                    }
                )
                pieces.append(sec_text)
                cursor += len(sec_text)
                n += 1
            buf = []
    return {"doc_id": doc_id, "text": "".join(pieces), "gold_sections": sections}


def read_multiseg(paths):
    """Ray reader for MultiSeg: each content file ``name.N`` pairs with
    ``name.label`` in the same directory (MultiSegReader.java:69-79)."""
    import re as _re

    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        docs = []
        for path, payload in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            m = _re.match(r"^(.*?)([^/]+)\.(\d+)$", path)
            if not m:
                continue
            label_path = m.group(1) + m.group(2) + ".label"
            with open(label_path, encoding="utf-8") as f:
                label_text = f.read()
            docs.append(
                parse_multiseg(
                    payload.decode("utf-8", errors="replace"),
                    label_text,
                    int(m.group(3)),
                    os.path.basename(path),
                )
            )
        return _to_table(docs)

    return ray.data.read_binary_files(paths, include_paths=True).map_batches(
        parse, batch_format="pyarrow"
    )


# --- WikiCities (WikiCitiesReader.java) ------------------------------------

_TOPLEVEL = "TOP-LEVEL SEGMENT"


def parse_wikicities(text: str, skip_top_level: bool = True) -> List[Dict]:
    """WikiCities lines are ``docno,sentno,heading,sentence``; sentno==1
    opens a new document, heading changes open a new GOLD section
    (WikiCitiesReader.java:56-140). The reference's LINE_PATTERN drops the
    comma between heading and sentence (a degenerate lazy-group regex that
    reduces every heading to one character); we parse the intended
    4-field layout and note the deviation here. Sentences join with a
    space and a trailing " ." like addToDocument (:118-119)."""
    docs: List[Dict] = []
    cur: Optional[Dict] = None
    buf: List[str] = []
    heading = ""

    def close_section():
        nonlocal buf, cur
        sec_text = "".join(buf)
        if cur is not None and sec_text.strip():
            label = (heading or "").strip().lower()
            if label == _TOPLEVEL.lower():
                label = "preface"
            begin = len(cur["text"])
            cur["text"] += sec_text
            cur["gold_sections"].append(
                {
                    "begin": begin,
                    "end": begin + len(sec_text),
                    "label": re.sub(r"\s+", "_", label),
                    "heading": label,
                    "confidence": 1.0,
                }
            )
        buf = []

    def close_doc():
        nonlocal cur
        close_section()
        if cur is not None and cur["text"].strip():
            docs.append(cur)
        cur = None

    for line in text.splitlines():
        parts = line.split(",", 3)
        if len(parts) != 4:
            continue
        docno, sentno, head, sentence = parts
        if int(sentno) == 1:
            close_doc()
            cur = {"doc_id": docno, "text": "", "gold_sections": []}
            heading = ""
        if skip_top_level and head == _TOPLEVEL:
            continue
        if head != heading:
            close_section()
            heading = head
        if buf:
            buf.append(" ")
        buf.append(sentence + " .")
    close_doc()
    return docs


def read_wikicities(paths, skip_top_level: bool = True):
    """Ray reader: many documents per WikiCities file."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        docs: List[Dict] = []
        for payload in batch["bytes"].to_pylist():
            docs.extend(
                parse_wikicities(
                    payload.decode("utf-8", errors="replace"), skip_top_level
                )
            )
        return _to_table(docs)

    return ray.data.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow"
    )


def read_choi(paths):
    """Ray reader for Choi documents: one document per file
    (ChoiDatasetReader.java; ``====`` separators become GOLD sections)."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        docs = [
            parse_choi(
                payload.decode("utf-8", errors="replace"), os.path.basename(path)
            )
            for path, payload in zip(
                batch["path"].to_pylist(), batch["bytes"].to_pylist()
            )
        ]
        return _to_table(docs)

    return ray.data.read_binary_files(paths, include_paths=True).map_batches(
        parse, batch_format="pyarrow"
    )
