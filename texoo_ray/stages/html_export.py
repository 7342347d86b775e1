"""HTML gold-vs-pred debug export.

Mirrors the reference's HTMLExport (texoo-entity-recognition/.../eval/
HTMLExport.java, 227 LoC): render each document's text with gold and
predicted mention spans highlighted so evaluation disagreements are
eyeballable. Debug-only sink: ``map_batches`` to an ``html`` column, then
``ds.write_json`` (SURVEY.md §2.2).
"""

from __future__ import annotations

import html as html_mod
from typing import Dict, List, Optional, Sequence

import pyarrow as pa

_STYLES = {
    "GOLD": "border-bottom:2px solid #2a7;",
    "PRED": "background:#cdf;",
    "SILVER": "background:#fec;",
}


def render_mentions_html(text: str, mentions: Sequence[Dict]) -> str:
    """Text with <span> marks per mention; overlapping spans nest by
    begin order; all text HTML-escaped."""
    events: List = []
    for i, m in enumerate(sorted(mentions, key=lambda m: (m["begin"], -m["end"]))):
        events.append((m["begin"], 0, i, m))
        events.append((m["end"], 1, i, m))
    opens = {e[2]: e for e in events if e[1] == 0}
    out: List[str] = []
    cursor = 0
    # simple linear render: split text at all boundaries
    bounds = sorted({0, len(text), *(m["begin"] for m in mentions), *(m["end"] for m in mentions)})
    for b0, b1 in zip(bounds, bounds[1:]):
        piece = html_mod.escape(text[b0:b1])
        active = [m for m in mentions if m["begin"] <= b0 and b1 <= m["end"]]
        for m in active:
            style = _STYLES.get(m.get("source", ""), "background:#eee;")
            title = html_mod.escape("%s %s [%d,%d)" % (m.get("source", ""), m.get("type", ""), m["begin"], m["end"]))
            piece = '<span style="%s" title="%s">%s</span>' % (style, title, piece)
        out.append(piece)
    return "<div>%s</div>" % "".join(out).replace("\n", "<br/>")


def html_export(batch: pa.Table, text_col: str = "clean_text") -> pa.Table:
    """attaches: ``html`` — rendered text with gold+pred mention marks."""
    texts = batch[text_col if text_col in batch.column_names else "text"].to_pylist()
    mention_cols = [c for c in ("gold_mentions", "mentions") if c in batch.column_names]
    htmls: List[str] = []
    for i, t in enumerate(texts):
        ms: List[Dict] = []
        for c in mention_cols:
            ms.extend(batch[c][i].as_py() or [])
        htmls.append(render_mentions_html(t or "", ms))
    return batch.append_column("html", pa.array(htmls, pa.string()))
