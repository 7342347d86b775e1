"""HTML gold-vs-pred export (HTMLExport analogue)."""

import pyarrow as pa

from texoo_ray.stages import schema
from texoo_ray.stages.html_export import html_export, render_mentions_html

TEXT = "Albert Einstein visited <Paris> today."
MENTIONS = [
    {"begin": 0, "end": 15, "text": "Albert Einstein", "type": "PER",
     "confidence": 1.0, "source": "PRED"},
    {"begin": 25, "end": 30, "text": "Paris", "type": "LOC",
     "confidence": 1.0, "source": "GOLD"},
]


def test_render_marks_and_escapes():
    h = render_mentions_html(TEXT, MENTIONS)
    assert '<span style="background:#cdf;" title="PRED PER [0,15)">Albert Einstein</span>' in h
    assert "border-bottom" in h and ">Paris</span>" in h
    assert "&lt;" in h and "<Paris>" not in h  # raw markup escaped


def test_newlines_become_br():
    h = render_mentions_html("a\nb", [])
    assert "<br/>" in h


def test_batch_export():
    batch = pa.table(
        {
            "clean_text": [TEXT, ""],
            "mentions": pa.array([MENTIONS, []], schema.MENTION_TYPE),
        }
    )
    out = html_export(batch)
    htmls = out["html"].to_pylist()
    assert htmls[0].startswith("<div>") and htmls[1] == "<div></div>"
