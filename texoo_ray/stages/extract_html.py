"""Main-content extraction stages: HTML boilerplate strip + layout parse.

The Ray front door for web/print corpora: stateless ``map_batches``
transforms (per-document parsing is inherently row-wise, like
tokenization) emitting the cleaned article text plus accounting columns
so the curation pipeline can gate on extraction quality.

- ``MainContentStage``: html column -> (title, main_text, n_good_blocks,
  n_blocks, boilerplate_ratio). Core logic in ``core/html_extract.py``
  (Boilerpipe WSDM-2010 rules).
- ``LayoutParseStage``: layout-text pages (list<string> column, the
  decoded form of a PDF — decode itself is the stubbed codec boundary,
  like ``stages/multimodal.py``) -> (main_text, n_headings,
  n_paragraphs). Core logic in ``core/layout.py``.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from ..core.html_extract import extract_main_content
from ..core.layout import parse_layout_document


def wrap_documents_html(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id",
    words_per_para: int = 20,
) -> pa.Table:
    """Deterministically wrap plain doc text in a realistic boilerplate
    page (masthead nav, breadcrumb nav, h1, related-links list, footer)
    — the synthetic web corpus for the ``html_main_content`` oracle: a
    correct extractor returns exactly the whitespace-normalized source
    text, so DuckDB can verify extraction by value.

    Paragraphs are >= ``words_per_para`` word chunks (tail excepted);
    with the breadcrumb (link density < 1/3) between the link-dense
    masthead and the content, every content paragraph classifies GOOD
    under the WSDM-2010 rules regardless of doc length."""
    import html as _html

    menus = " ".join(
        '<a href="/s%d">section %d page</a>' % (i, i) for i in range(6)
    )
    crumb = (
        'You are here: <a href="/">Home</a> near <a href="/arc">Archive</a> today'
    )
    related = " ".join('<a href="/r%d">related item %d</a>' % (i, i) for i in range(5))
    htmls = []
    ids = batch[id_col].to_pylist()
    for doc_id, text in zip(ids, batch[text_col].to_pylist()):
        words = (text or "").split()
        paras = [
            " ".join(words[i : i + words_per_para])
            for i in range(0, len(words), words_per_para)
        ]
        body = "".join("<p>%s</p>" % _html.escape(p) for p in paras)
        htmls.append(
            "<html><head><title>Doc %s</title></head><body>"
            "<nav>%s</nav><nav>%s</nav><h1>Doc %s full review article</h1>%s"
            '<div class="related">%s</div>'
            '<footer><a href="/tos">Terms</a> <a href="/p">Privacy</a> '
            "© 2020 Site</footer></body></html>"
            % (doc_id, menus, crumb, doc_id, body, related)
        )
    return pa.table(
        {id_col: batch[id_col], "html": pa.array(htmls, pa.string())}
    )


def wrap_documents_layout(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 6,
    lines_per_col: int = 10,
) -> pa.Table:
    """Deterministically render doc text as two-column print-layout pages
    (running ALL-CAPS journal header, page numbers, fixed gutter) — the
    synthetic PDF-text corpus for the ``layout_main_content`` oracle.
    The header renders as a heading (dropped from main text) and page
    numbers are furniture, so a correct layout parse recovers exactly the
    whitespace-normalized source text in reading order."""
    ids = batch[id_col].to_pylist()
    pages_col = []
    for text in batch[text_col].to_pylist():
        words = (text or "").split()
        per_col = words_per_line * lines_per_col
        cols = [words[i : i + per_col] for i in range(0, len(words), per_col)]
        pages: List[str] = []
        for pi in range(0, len(cols), 2):
            left = cols[pi]
            right = cols[pi + 1] if pi + 1 < len(cols) else None
            llines = [
                " ".join(left[i : i + words_per_line])
                for i in range(0, len(left), words_per_line)
            ]
            lines = ["THE WIDGET JOURNAL", ""]
            # two-column rendering only when the right column is FULL —
            # the gutter heuristic (core/layout.py::_gutter_of) requires
            # text on both sides of the gutter on every body line
            if right is not None and len(right) == per_col:
                rlines = [
                    " ".join(right[i : i + words_per_line])
                    for i in range(0, len(right), words_per_line)
                ]
                width = max(len(ln) for ln in llines) + 1
                n = max(len(llines), len(rlines))
                for i in range(n):
                    lft = llines[i] if i < len(llines) else ""
                    rgt = rlines[i] if i < len(rlines) else ""
                    lines.append((lft.ljust(width) + "    " + rgt).rstrip())
            else:
                lines.extend(llines)
                if right:
                    lines.append("")
                    lines.extend(
                        " ".join(right[i : i + words_per_line])
                        for i in range(0, len(right), words_per_line)
                    )
            lines.extend(["", str(len(pages) + 1)])
            pages.append("\n".join(lines))
        pages_col.append(pages)
    return pa.table(
        {
            id_col: batch[id_col],
            "pages": pa.array(pages_col, pa.list_(pa.string())),
        }
    )


class MainContentStage:
    """html_col -> title/main_text/+counters. Stateless; classless fn
    would also do, but the class keeps kwargs one-time like the other
    stages."""

    def __init__(
        self,
        html_col: str = "html",
        include_headings: bool = True,
        joiner: str = "\n\n",
    ):
        self.html_col = html_col
        self.include_headings = include_headings
        self.joiner = joiner

    def __call__(self, batch: pa.Table) -> pa.Table:
        titles: List[str] = []
        texts: List[str] = []
        n_good: List[int] = []
        n_all: List[int] = []
        for html in batch[self.html_col].to_pylist():
            title, text, good, total = extract_main_content(
                html or "", self.include_headings, self.joiner
            )
            titles.append(title)
            texts.append(text)
            n_good.append(good)
            n_all.append(total)
        ratio = [
            (1.0 - g / t) if t else 0.0 for g, t in zip(n_good, n_all)
        ]
        batch = batch.drop_columns([self.html_col])
        batch = batch.append_column("title", pa.array(titles, pa.string()))
        batch = batch.append_column("main_text", pa.array(texts, pa.string()))
        batch = batch.append_column("n_good_blocks", pa.array(n_good, pa.int64()))
        batch = batch.append_column("n_blocks", pa.array(n_all, pa.int64()))
        batch = batch.append_column("boilerplate_ratio", pa.array(ratio, pa.float64()))
        return batch


class LayoutParseStage:
    """pages_col (list<string>) -> main_text/n_headings/n_paragraphs."""

    def __init__(self, pages_col: str = "pages", joiner: str = "\n\n"):
        self.pages_col = pages_col
        self.joiner = joiner

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts: List[str] = []
        n_heads: List[int] = []
        n_paras: List[int] = []
        for pages in batch[self.pages_col].to_pylist():
            blocks = parse_layout_document(pages or [])
            paras = [b.text for b in blocks if b.kind == "paragraph"]
            texts.append(self.joiner.join(paras))
            n_heads.append(sum(1 for b in blocks if b.kind == "heading"))
            n_paras.append(len(paras))
        batch = batch.drop_columns([self.pages_col])
        batch = batch.append_column("main_text", pa.array(texts, pa.string()))
        batch = batch.append_column("n_headings", pa.array(n_heads, pa.int64()))
        batch = batch.append_column("n_paragraphs", pa.array(n_paras, pa.int64()))
        return batch
