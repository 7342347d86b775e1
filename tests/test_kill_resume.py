"""Multi-node failure story, end-to-end: a resumable extraction run is
SIGKILLed mid-flight, resumed in a fresh process, and the resumed output
must equal a clean single-shot run value-for-value.

Each phase runs in its own subprocess with its own Ray session (killing a
partition mid-write inside the shared test session would take the session
down); the test asserts the three lineage guarantees:
- a killed run leaves SOME completed partitions (manifests) but not all,
- the resume skips exactly the completed partitions and reruns the rest,
- the final dataset is identical to a never-killed run.
"""

from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pyarrow.dataset as pads

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
import glob, json
from texoo_ray.pipelines.extract import run_extract_resumable
files = sorted(glob.glob({turns!r} + "/*.parquet"))
r = run_extract_resumable(
    files, {out!r}, num_partitions=4, max_concurrent=1,
    sort_output=True, lean=True, batch_size=512,
)
print(json.dumps(r))
ray.shutdown()
"""

_GEN = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
from texoo_ray.sources.turns import write_turns_corpus
rows = write_turns_corpus({turns!r}, 4000, seed=7, num_files=8)
print(rows)
ray.shutdown()
"""


def _spawn(code: str) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=REPO,
    )


def _read_sorted(out_dir: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(out_dir, "part=*[0-9]", "*.parquet")))
    df = pads.dataset(files).to_table().to_pandas()
    df = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return df[sorted(df.columns)]


def test_kill_mid_run_then_resume_matches_clean_run(tmp_path):
    turns = str(tmp_path / "turns")
    gen = _spawn(_GEN.format(repo=REPO, turns=turns))
    gen_out, _ = gen.communicate(timeout=300)
    assert gen.returncode == 0 and int(gen_out.strip().splitlines()[-1]) > 0

    out_killed = str(tmp_path / "out_killed")
    out_clean = str(tmp_path / "out_clean")

    # clean reference run
    clean = _spawn(_WORKER.format(repo=REPO, turns=turns, out=out_clean))
    clean_out, _ = clean.communicate(timeout=600)
    assert clean.returncode == 0, clean_out
    clean_stats = json.loads(clean_out.strip().splitlines()[-1])
    assert clean_stats["partitions"] == 4 and clean_stats["skipped"] == 0

    # killed run: SIGKILL as soon as the first partition manifest lands
    victim = _spawn(_WORKER.format(repo=REPO, turns=turns, out=out_killed))
    deadline = time.time() + 600
    manifest_glob = os.path.join(out_killed, "part=*", "_MANIFEST.json")
    while time.time() < deadline:
        if victim.poll() is not None:
            break  # finished before we could kill it (machine too fast)
        if glob.glob(manifest_glob):
            os.kill(victim.pid, signal.SIGKILL)
            victim.wait(timeout=60)
            break
        time.sleep(0.05)
    n_manifests = len(glob.glob(manifest_glob))
    assert n_manifests >= 1, "kill landed before any partition completed"
    # the interesting case is a PARTIAL run; with max_concurrent=1 and 4
    # partitions the kill lands well before completion in practice
    assert n_manifests < 4, "run completed before the kill (raise corpus size)"

    # resume in a fresh process: completed partitions must be skipped
    resume = _spawn(_WORKER.format(repo=REPO, turns=turns, out=out_killed))
    resume_out, _ = resume.communicate(timeout=600)
    assert resume.returncode == 0, resume_out
    stats = json.loads(resume_out.strip().splitlines()[-1])
    assert stats["partitions"] == 4
    assert stats["skipped"] == n_manifests
    assert stats["rows"] == clean_stats["rows"]

    got = _read_sorted(out_killed)
    want = _read_sorted(out_clean)
    pd.testing.assert_frame_equal(got, want)


_GEN_SCATTERED = """
import sys
sys.path.insert(0, {repo!r})
import os
import pyarrow as pa
import pyarrow.parquet as pq
from texoo_ray.sources.turns import turns_table
# deliberately SCATTERED layout: rows round-robin across files, so every
# conversation is striped over all 8 files (no file-level co-location)
tbl = turns_table(0, 2500, seed=11)
os.makedirs({turns!r}, exist_ok=True)
for f in range(8):
    idx = list(range(f, tbl.num_rows, 8))
    pq.write_table(tbl.take(idx), os.path.join({turns!r}, "scat-%02d.parquet" % f))
print(tbl.num_rows)
"""

_WORKER_BYKEY = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
import glob, json
from texoo_ray.pipelines.extract import run_extract_resumable
files = sorted(glob.glob({turns!r} + "/*.parquet"))
r = run_extract_resumable(
    files, {out!r}, num_partitions=4, max_concurrent=1,
    sort_output=True, lean=True, batch_size=512, partition_by_key=True,
)
print(json.dumps(r))
ray.shutdown()
"""


def test_scattered_layout_kill_resume_whole_conversations(tmp_path):
    """The conv-hash re-shard path (run_resumable_by_key): on an input
    whose files stripe every conversation across all of them, a killed
    run must resume to a result identical to a clean run, and every
    OUTPUT partition must hold whole conversations (all turns of a conv
    in exactly one partition, contiguous and turn-ordered within its
    file)."""
    turns = str(tmp_path / "scattered")
    gen = _spawn(_GEN_SCATTERED.format(repo=REPO, turns=turns))
    gen_out, _ = gen.communicate(timeout=300)
    assert gen.returncode == 0 and int(gen_out.strip().splitlines()[-1]) > 0

    out_killed = str(tmp_path / "out_killed")
    out_clean = str(tmp_path / "out_clean")

    clean = _spawn(_WORKER_BYKEY.format(repo=REPO, turns=turns, out=out_clean))
    clean_out, _ = clean.communicate(timeout=600)
    assert clean.returncode == 0, clean_out
    clean_stats = json.loads(clean_out.strip().splitlines()[-1])
    assert clean_stats["partitions"] == 4 and clean_stats["skipped"] == 0
    assert clean_stats["reshard_partitions"] == 8

    # killed run: SIGKILL once at least TWO manifests exist anywhere
    # (phase A or phase B), so the resume exercises skip logic in at
    # least one phase
    victim = _spawn(_WORKER_BYKEY.format(repo=REPO, turns=turns, out=out_killed))
    deadline = time.time() + 600
    patterns = [
        os.path.join(out_killed, "bucketed", "part=*", "_MANIFEST.json"),
        os.path.join(out_killed, "part=*", "_MANIFEST.json"),
    ]
    while time.time() < deadline:
        if victim.poll() is not None:
            break
        n = sum(len(glob.glob(p)) for p in patterns)
        if n >= 2:
            os.kill(victim.pid, signal.SIGKILL)
            victim.wait(timeout=60)
            break
        time.sleep(0.05)
    n_manifests = sum(len(glob.glob(p)) for p in patterns)
    assert n_manifests >= 1, "kill landed before any partition completed"
    assert len(glob.glob(patterns[1])) < 4, "run completed before the kill"

    resume = _spawn(_WORKER_BYKEY.format(repo=REPO, turns=turns, out=out_killed))
    resume_out, _ = resume.communicate(timeout=600)
    assert resume.returncode == 0, resume_out
    stats = json.loads(resume_out.strip().splitlines()[-1])
    assert stats["partitions"] == 4
    assert stats["rows"] == clean_stats["rows"]
    assert stats["reshard_skipped"] + stats["skipped"] >= 1

    got = _read_sorted(out_killed)
    want = _read_sorted(out_clean)
    pd.testing.assert_frame_equal(got, want)

    # per-partition whole-conversation ordering
    global_counts = want.groupby("conv_id").size().to_dict()
    seen_parts = {}
    for part in sorted(glob.glob(os.path.join(out_clean, "part=*[0-9]"))):
        files = sorted(glob.glob(os.path.join(part, "*.parquet")))
        if not files:
            continue
        for fpath in files:
            df = pads.dataset(fpath).to_table().to_pandas()
            for conv, sub in df.groupby("conv_id", sort=False):
                # contiguous within the file and turn-ordered
                pos = sub.index.to_numpy()
                assert (pos[1:] - pos[:-1] == 1).all(), (part, conv)
                ti = sub["turn_idx"].to_numpy()
                assert (ti[1:] > ti[:-1]).all(), (part, conv)
        pdf = pads.dataset(files).to_table().to_pandas()
        for conv, n in pdf.groupby("conv_id").size().items():
            assert seen_parts.setdefault(conv, part) == part, conv
            assert n == global_counts[conv], conv
    assert len(seen_parts) == len(global_counts)


_GEN_SMALL = """
import sys
sys.path.insert(0, {repo!r})
import os
import pyarrow.parquet as pq
from texoo_ray.sources.turns import turns_table
os.makedirs({turns!r}, exist_ok=True)
for f in range(4):
    tbl = turns_table(f * 150, (f + 1) * 150, seed=3)
    pq.write_table(tbl, os.path.join({turns!r}, "part-%02d.parquet" % f))
print(4)
"""

_WORKER_PATH = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
import glob, json
from texoo_ray.pipelines.extract import run_extract_resumable
files = sorted(glob.glob({turns!r} + "/*.parquet"))
r = run_extract_resumable(
    files, {out!r}, num_partitions=2, max_concurrent=1,
    sort_output=True, lean=True, batch_size=512, partition_by_key={bykey},
)
print(json.dumps(r))
ray.shutdown()
"""


def test_by_key_path_equals_by_file_path_on_colocated_layout(tmp_path):
    """On a layout that already co-locates conversations (whole convs
    per file), the conv-hash re-shard path and the plain by-file path
    must produce value-identical extractions — only the partitioning of
    rows into output parts may differ."""
    turns = str(tmp_path / "coloc")
    gen = _spawn(_GEN_SMALL.format(repo=REPO, turns=turns))
    gen_out, _ = gen.communicate(timeout=300)
    assert gen.returncode == 0

    out_a = str(tmp_path / "by_file")
    out_b = str(tmp_path / "by_key")
    for out, bykey in ((out_a, "False"), (out_b, "True")):
        w = _spawn(_WORKER_PATH.format(repo=REPO, turns=turns, out=out, bykey=bykey))
        w_out, _ = w.communicate(timeout=600)
        assert w.returncode == 0, w_out
    a = _read_sorted(out_a)
    b = _read_sorted(out_b)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
