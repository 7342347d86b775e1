"""Layout-text parsing: the PDF/print-layout half of main-content
extraction.

PDF binary decoding needs a codec library the sandbox doesn't ship, so —
exactly like ``stages/multimodal.py`` — the *decode* step is an
injectable/stubbed boundary, while everything after it is real: this
module takes "layout text" (fixed-width text as produced by
``pdftotext -layout``-class tools: one string per page, spaces encoding
horizontal position) and recovers reading order and paragraphs.

Heuristics (standard print-layout rules, cf. the column/paragraph logic
described in the Poppler/pdftotext and PDFMiner documentation):

- **Column split**: if a run of lines shares a vertical whitespace gutter
  (>= ``min_gutter`` spaces at the same column range), the page region is
  two columns read left-then-right. Detected per contiguous line run, so
  full-width headers/footers above or below a two-column body survive.
- **Dehyphenation**: a line ending ``xxx-`` whose next line starts with a
  lowercase letter joins without the hyphen.
- **Paragraph reflow**: wrapped lines merge; a paragraph break is an
  empty line, an indent jump, or a line ending well short of the column's
  right edge followed by a full line.
- **Headings**: short lines (<= ``heading_max_words`` words) that are
  numbered ("3.", "2.1") or ALL-CAPS/Title Case and are vertically
  isolated become heading blocks.
- **Headers/footers**: lines repeating on >= ``repeat_threshold`` of
  pages at the same position (page furniture) are dropped, as are pure
  page numbers.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

_PAGE_NUM_RE = re.compile(r"^\s*(?:page\s+)?\d+(?:\s*(?:/|of)\s*\d+)?\s*$", re.I)
_NUMBERED_HEADING_RE = re.compile(r"^\s*\d+(?:\.\d+)*[.)]?\s+\S")
_HYPHEN_END_RE = re.compile(r"[A-Za-z]-\s*$")


@dataclass
class LayoutBlock:
    text: str
    kind: str  # "paragraph" | "heading"
    page: int
    column: int


def _gutter_of(lines: Sequence[str], min_gutter: int = 3) -> Optional[Tuple[int, int]]:
    """Find a shared vertical whitespace gutter across the given lines:
    returns (start, end) column range of the widest common all-space run
    that splits every non-empty line into two non-empty halves."""
    filled = [ln for ln in lines if ln.strip()]
    if len(filled) < 2:
        return None
    width = max(len(ln) for ln in filled)
    if width < 2 * min_gutter + 2:
        return None
    all_space = [True] * width
    for ln in filled:
        padded = ln.ljust(width)
        for i, c in enumerate(padded):
            if c != " ":
                all_space[i] = False
    best: Optional[Tuple[int, int]] = None
    run_start = None
    for i in range(width + 1):
        if i < width and all_space[i]:
            if run_start is None:
                run_start = i
        else:
            if run_start is not None:
                start, end = run_start, i
                # a real gutter has text on both sides on every filled line
                if (
                    end - start >= min_gutter
                    and start > 0
                    and end < width
                    and all(ln[:start].strip() for ln in filled)
                    and all(ln.ljust(width)[end:].strip() for ln in filled)
                ):
                    if best is None or (end - start) > (best[1] - best[0]):
                        best = (start, end)
                run_start = None
    return best


def split_columns(page: str, min_gutter: int = 3) -> List[str]:
    """Split a page into reading-order chunks. Contiguous line runs with a
    shared gutter become (left column, right column); full-width runs pass
    through in place."""
    lines = page.splitlines()
    chunks: List[str] = []
    i = 0
    n = len(lines)
    while i < n:
        if not lines[i].strip():
            i += 1
            continue
        # grow the current run while the gutter persists
        j = i + 1
        g = None
        while j <= n:
            cand = _gutter_of(lines[i:j], min_gutter) if j - i >= 2 else None
            if j - i >= 2 and cand is None:
                j -= 1
                break
            g = cand
            if j == n:
                break
            if not lines[j].strip():
                break
            j += 1
        if g is not None and j - i >= 3:
            start, end = g
            left = "\n".join(ln[:start].rstrip() for ln in lines[i:j])
            right = "\n".join(ln.ljust(end)[end:].rstrip() for ln in lines[i:j])
            chunks.append(left)
            chunks.append(right)
            i = j
        else:
            # full-width run: take lines until the next blank line
            k = i
            while k < n and lines[k].strip():
                k += 1
            chunks.append("\n".join(ln.strip() for ln in lines[i:k]))
            chunks.append("")  # preserve the paragraph break
            i = k
    return chunks


def _is_heading(line: str, heading_max_words: int = 8) -> bool:
    s = line.strip()
    if not s or len(s.split()) > heading_max_words:
        return False
    if _NUMBERED_HEADING_RE.match(s):
        return True
    letters = [c for c in s if c.isalpha()]
    if letters and all(c.isupper() for c in letters):
        return True
    words = [w for w in s.split() if w[:1].isalpha()]
    if len(words) >= 2 and all(w[:1].isupper() for w in words) and not s.endswith("."):
        return True
    return False


def reflow_paragraphs(chunk: str, heading_max_words: int = 8) -> List[Tuple[str, str]]:
    """Merge wrapped lines into paragraphs; emit (kind, text) in order.
    Dehyphenates across joins; short isolated lines become headings."""
    out: List[Tuple[str, str]] = []
    para: List[str] = []

    def flush():
        if para:
            text = ""
            for piece in para:
                if _HYPHEN_END_RE.search(text) and piece[:1].islower():
                    text = text.rstrip()[:-1] + piece
                elif text:
                    text += " " + piece
                else:
                    text = piece
            out.append(("paragraph", text.strip()))
            para.clear()

    for raw in chunk.splitlines():
        line = raw.strip()
        if not line:
            flush()
            continue
        if _is_heading(line, heading_max_words) and not para:
            flush()
            out.append(("heading", line))
            continue
        para.append(line)
    flush()
    return [(k, t) for k, t in out if t]


def drop_page_furniture(
    pages_blocks: List[List[Tuple[str, str]]], repeat_threshold: float = 0.6
) -> List[List[Tuple[str, str]]]:
    """Remove page numbers and lines repeating across >= threshold of
    pages (running headers/footers)."""
    n_pages = len(pages_blocks)
    if n_pages == 0:
        return pages_blocks
    counts = Counter()
    for blocks in pages_blocks:
        for _, text in set(blocks):
            counts[text] += 1
    min_repeat = max(2, int(repeat_threshold * n_pages))
    furniture = {t for t, c in counts.items() if c >= min_repeat and len(t) < 120}
    cleaned = []
    for blocks in pages_blocks:
        cleaned.append(
            [
                (k, t)
                for k, t in blocks
                if t not in furniture and not _PAGE_NUM_RE.match(t)
            ]
        )
    return cleaned


def parse_layout_document(
    pages: Sequence[str],
    min_gutter: int = 3,
    heading_max_words: int = 8,
    repeat_threshold: float = 0.6,
) -> List[LayoutBlock]:
    """Full layout parse: per page, split columns, reflow paragraphs;
    then drop repeated page furniture across pages."""
    pages_blocks: List[List[Tuple[str, str]]] = []
    col_of: List[List[int]] = []
    for page in pages:
        blocks: List[Tuple[str, str]] = []
        cols: List[int] = []
        for ci, chunk in enumerate(split_columns(page or "", min_gutter)):
            for kind, text in reflow_paragraphs(chunk, heading_max_words):
                blocks.append((kind, text))
                cols.append(ci)
        pages_blocks.append(blocks)
        col_of.append(cols)
    kept = drop_page_furniture(pages_blocks, repeat_threshold)
    out: List[LayoutBlock] = []
    for pi, blocks in enumerate(kept):
        # column ids survive only for un-dropped blocks: re-associate by text
        col_map = {}
        for (k, t), c in zip(pages_blocks[pi], col_of[pi]):
            col_map.setdefault((k, t), c)
        for k, t in blocks:
            out.append(LayoutBlock(text=t, kind=k, page=pi, column=col_map.get((k, t), 0)))
    return out


def layout_main_text(pages: Sequence[str], joiner: str = "\n\n", **kw) -> str:
    """Paragraph text of the document in reading order (headings dropped)."""
    return joiner.join(
        b.text for b in parse_layout_document(pages, **kw) if b.kind == "paragraph"
    )
