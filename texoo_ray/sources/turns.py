"""Deterministic synthetic transcript ("turns") table generator.

Schema per BASELINE.json ``input_hint``::

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Every value derives from ``(seed, conv_idx, turn_idx)`` only, so any worker
can generate any shard independently and reproducibly (generation is a
``ray.data.range -> map_batches`` pipeline, no driver-side loop). Turn
counts per conversation follow a Zipf-ish skew (FIXTURES.md §1 scale
knobs) to exercise skewed ``groupby(conv_id)`` handling.
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta, timezone
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

from .fixtures import (
    ABBREV_SAMPLES,
    DE_SENTENCES,
    ENTITY_TERMS,
    MARKUP_SNIPPETS,
    ROLES,
    TOOL_NAMES,
    WORD_BANK,
)

_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)

TURNS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _rng(seed: int, *parts: int) -> random.Random:
    h = hashlib.blake2b(digest_size=8)
    h.update(seed.to_bytes(8, "little", signed=False))
    for p in parts:
        h.update(int(p).to_bytes(8, "little", signed=True))
    return random.Random(int.from_bytes(h.digest(), "little"))


def turns_in_conv(conv_idx: int, seed: int = 42, mean_turns: int = 8) -> int:
    """Zipf-ish skewed turn count: most conversations are short, a few are
    10-100x the median (FIXTURES.md §1)."""
    r = _rng(seed, conv_idx, -1)
    u = r.random()
    n = int(mean_turns * 0.5 / max(u, 1e-4) ** 0.6)
    return max(2, min(n, mean_turns * 120))


def _prose(r: random.Random) -> str:
    n_sent = r.randint(2, 6)
    parts: List[str] = []
    for si in range(n_sent):
        n_words = r.randint(4, 12)
        words = [r.choice(WORD_BANK) for _ in range(n_words)]
        words[0] = words[0].capitalize()
        if r.random() < 0.3:
            words.insert(r.randint(1, len(words)), r.choice(ABBREV_SAMPLES))
        if r.random() < 0.25:
            words.insert(r.randint(1, len(words)), "(%d,%03d mbar)" % (r.randint(1, 9), r.randint(0, 999)))
        if r.random() < 0.2:
            words.append("[%d]" % r.randint(1, 40))
        sent = " ".join(words) + r.choice([".", ".", ".", "!", "?"])
        parts.append(sent)
    seps = [" " if r.random() < 0.7 else "\n" for _ in range(n_sent - 1)]
    out = parts[0]
    for sep, s in zip(seps, parts[1:]):
        out += sep + s
    return out


def _edge_case(r: random.Random) -> str:
    choices = [
        "123 abc\n\nxyz  789 .\n456",
        "A  double  space and a trailing dot .",
        "Numbers like 1,007 and 29.7 stay together.",
        "Brackets (like these) [and refs] {braces} \"quoted\" text.",
        "Line one\nline two\n\nline four",
    ]
    return r.choice(choices)


def _enumeration(r: random.Random) -> str:
    n = r.randint(2, 4)
    head = "They describe the process in %d stages:" % n
    items = "".join(
        "\n%d. %s stage." % (i + 1, r.choice(WORD_BANK).capitalize()) for i in range(n)
    )
    return head + items


def _listy(r: random.Random) -> str:
    n = r.randint(2, 4)
    return "Key points follow:\n" + "\n".join(
        "- %s %s" % (r.choice(WORD_BANK), r.choice(WORD_BANK)) for _ in range(n)
    )


def _markup(r: random.Random) -> str:
    return r.choice(MARKUP_SNIPPETS) + "\n" + _prose(r)


def _entities(r: random.Random) -> str:
    n_sent = r.randint(1, 4)
    parts = []
    for _ in range(n_sent):
        term = r.choice(ENTITY_TERMS)
        tmpl = r.choice(
            [
                "Reports about %s arrived %s today.",
                "The visit to %s was %s and calm.",
                "%s announced a new %s initiative.",
                "Experts from %s discussed the %s results.",
            ]
        )
        parts.append(tmpl % (term, r.choice(WORD_BANK)))
    return " ".join(parts)


def _unicode_de(r: random.Random) -> str:
    return r.choice(DE_SENTENCES) + " " + r.choice(DE_SENTENCES)


def _degenerate(r: random.Random) -> str:
    kind = r.random()
    if kind < 0.3:
        return ""
    if kind < 0.5:
        return "   "
    if kind < 0.7:
        return "token"
    # long turn (wide-row/skew case); kept few KB at small scale
    block = _prose(r)
    reps = r.randint(5, 20)
    return "\n".join(block for _ in range(reps))


_GENERATORS = [
    (_prose, 40),
    (_edge_case, 8),
    (_enumeration, 8),
    (_listy, 6),
    (_markup, 10),
    (_entities, 16),
    (_unicode_de, 6),
    (_degenerate, 6),
]
_GEN_CUM = np.cumsum([w for _, w in _GENERATORS])
_GEN_TOTAL = int(_GEN_CUM[-1])


def turn_text(conv_idx: int, turn_idx: int, seed: int = 42) -> str:
    r = _rng(seed, conv_idx, turn_idx)
    pick = r.randrange(_GEN_TOTAL)
    for (fn, _), cum in zip(_GENERATORS, _GEN_CUM):
        if pick < cum:
            return fn(r)
    return _prose(r)


def conv_rows(conv_idx: int, seed: int = 42, mean_turns: int = 8) -> Dict[str, list]:
    """All rows of one conversation as a dict of column lists."""
    n = turns_in_conv(conv_idx, seed, mean_turns)
    conv_id = "conv-%08d" % conv_idx
    r = _rng(seed, conv_idx, -2)
    base_ts = _EPOCH + timedelta(seconds=conv_idx * 60)
    cols: Dict[str, list] = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    t = base_ts
    for i in range(n):
        if i == 0 and r.random() < 0.2:
            role = "system"
        elif r.random() < 0.12:
            role = "tool"
        else:
            role = "user" if i % 2 == 0 else "assistant"
        tool = r.choice(TOOL_NAMES) if role == "tool" else ""
        t = t + timedelta(seconds=r.randint(1, 120))
        cols["conv_id"].append(conv_id)
        cols["turn_idx"].append(i)
        cols["role"].append(role)
        cols["text"].append(turn_text(conv_idx, i, seed))
        cols["tool"].append(tool)
        cols["ts"].append(t)
    return cols


def turns_table(
    conv_begin: int, conv_end: int, seed: int = 42, mean_turns: int = 8
) -> pa.Table:
    """Arrow table for a contiguous range of conversations."""
    cols: Dict[str, list] = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for ci in range(conv_begin, conv_end):
        rows = conv_rows(ci, seed, mean_turns)
        for k, v in rows.items():
            cols[k].extend(v)
    arrays = [
        pa.array(cols["conv_id"], pa.string()),
        pa.array(cols["turn_idx"], pa.int32()),
        pa.array(cols["role"], pa.string()),
        pa.array(cols["text"], pa.string()),
        pa.array(cols["tool"], pa.string()),
        pa.array(cols["ts"], pa.timestamp("us")),
    ]
    return pa.Table.from_arrays(arrays, schema=TURNS_SCHEMA)


def write_turns_corpus(
    out_dir: str,
    n_convs: int,
    seed: int = 42,
    mean_turns: int = 8,
    num_files: int = 64,
    shuffle_files: bool = True,
) -> int:
    """Write a multi-file turns corpus with Ray Data (parallel, deterministic).

    Conversations are hash-scattered across files so that blocks are not
    pre-sorted by conv_id (the ordering shuffle has real work to do).
    Returns the number of turns written. Requires an initialised Ray.
    """
    import ray.data

    import pyarrow.parquet as pq
    import os

    os.makedirs(out_dir, exist_ok=True)
    num_files = min(num_files, max(1, n_convs))

    def gen_file(batch: pa.Table) -> pa.Table:
        counts = []
        for file_idx in batch["id"].to_pylist():
            convs = [c for c in range(n_convs) if (c * 2654435761) % num_files == file_idx]
            tables = [turns_table(c, c + 1, seed, mean_turns) for c in convs]
            tbl = pa.concat_tables(tables) if tables else turns_table(0, 0)
            pq.write_table(tbl, os.path.join(out_dir, "part-%05d.parquet" % file_idx))
            counts.append(tbl.num_rows)
        return pa.Table.from_arrays([pa.array(counts, pa.int64())], names=["rows"])

    res = (
        ray.data.range(num_files)
        .map_batches(gen_file, batch_size=1, batch_format="pyarrow")
        .sum("rows")
    )
    return int(res)
