"""Markup / boilerplate stripping for transcript turns.

Generalizes the reference's corpus cleaners: Wiki727Reader strips
``***LIST*** / ***formula*** / ***codice***`` placeholders and
``========,<level>,<heading>.`` section markers
(Wiki727Reader.java:37-140), and WikipediaUrlPreprocessor cleans URLs
(texoo-retrieval). Our stage additionally strips HTML-ish noise
(FIXTURES.md §1.4). Stripping happens BEFORE segmentation, so all span
offsets refer to the cleaned text (same contract as the reference readers,
which parse markup at read time).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

_TAG_RE = re.compile(r"</?[A-Za-z][^<>]*>")
_PLACEHOLDER_RE = re.compile(r"\*\*\*(?:LIST|formula|codice)\*\*\*")
_SECTION_MARKER_RE = re.compile(r"^========,(\d+),(.*?)\.?$", re.MULTILINE)
_MULTISPACE_RE = re.compile(r"[ \t]{2,}")
_ENTITIES = (
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
)


def extract_section_markers(text: str) -> List[Tuple[int, str]]:
    """Wiki727-style ``========,<level>,<heading>.`` markers as
    (level, heading) in document order (Wiki727Reader.java:62-95)."""
    return [(int(m.group(1)), m.group(2)) for m in _SECTION_MARKER_RE.finditer(text)]


# Any char that could make one of the passes below fire: '<' (tags),
# '&' (entities), '*' (placeholders), '=' (section markers), '\t' or a
# double space (multispace collapse), ' \n' (trailing-space drop), or a
# 3+ newline run. One C scan; when it misses, every sub below is a no-op
# and the result is exactly text.strip().
_HINT_RE = re.compile(r"[<&*=\t]|  | \n|\n\n\n")


def strip_markup(text: str) -> str:
    """Remove HTML tags/entities, wiki placeholders, and section-marker
    lines; collapse runs of spaces left behind. Newlines are preserved
    (they carry paragraph structure for the NL section heuristic)."""
    if _HINT_RE.search(text) is None:
        return text.strip()
    t = _SECTION_MARKER_RE.sub("", text)
    t = _TAG_RE.sub("", t)
    t = _PLACEHOLDER_RE.sub("", t)
    for src, dst in _ENTITIES:
        t = t.replace(src, dst)
    t = _MULTISPACE_RE.sub(" ", t)
    # drop trailing spaces before newlines introduced by removals
    t = re.sub(r" +\n", "\n", t)
    t = re.sub(r"\n{3,}", "\n\n", t)
    return t.strip()
