"""CLI end-to-end: generate -> annotate -> resume-skip, in subprocesses."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


pytestmark = pytest.mark.skipif(
    not os.environ.get("TEXOO_CLI_TESTS"),
    reason="CLI subprocess tests spawn 4 fresh Ray sessions (~4 min); "
    "set TEXOO_CLI_TESTS=1 to run (flow also exercised manually, see "
    ".claude/skills/verify)",
)


def run_cli(*args, timeout=300):
    out = subprocess.run(
        [sys.executable, "-m", "texoo_ray.cli", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=timeout,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_generate_annotate_resume(tmp_path):
    turns = str(tmp_path / "turns")
    r = run_cli("generate", "--output", turns, "--convs", "30", "--files", "2", "--num-cpus", "4")
    assert r["rows"] > 0

    out1 = run_cli(
        "annotate", "--input", turns, "--output", str(tmp_path / "out"),
        "--sections", "nl", "--num-cpus", "4",
    )
    assert out1["rows"] == r["rows"]

    res_dir = str(tmp_path / "out_resume")
    first = run_cli(
        "annotate", "--input", turns, "--output", res_dir,
        "--resume", "--partitions", "2", "--num-cpus", "4",
    )
    assert first == {"partitions": 2, "skipped": 0, "rows": r["rows"]}
    second = run_cli(
        "annotate", "--input", turns, "--output", res_dir,
        "--resume", "--partitions", "2", "--num-cpus", "4",
    )
    assert second["skipped"] == 2 and second["rows"] == r["rows"]


def test_cli_curate_and_extract_html(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from texoo_ray.stages.extract_html import wrap_documents_html

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "a good long document with plenty of words to survive the gate",
                "a good long document with plenty of words to survive the gate",
                "short",
            ],
        }
    )
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)
    out = run_cli("curate", "--input", src, "--output", str(tmp_path / "cur"), "--num-cpus", "4")
    assert out["rows"] == 1  # dup collapsed, short dropped

    html_src = str(tmp_path / "html.parquet")
    pq.write_table(wrap_documents_html(docs), html_src)
    out2 = run_cli(
        "extract-html", "--input", html_src, "--output", str(tmp_path / "ext"), "--num-cpus", "4"
    )
    assert out2["rows"] == 3
    got = pq.read_table(str(tmp_path / "ext"))
    assert "main_text" in got.column_names
