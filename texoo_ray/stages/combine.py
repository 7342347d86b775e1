"""Fast large-domain grouped sums.

Ray's generic multi-key ``groupby().aggregate(Sum)`` is sort-overhead
bound once the key domain reaches ~1M groups (measured 9.3 s for a
1.7M-row/1.2M-group combine at sf0.1/32 cpus). The idiom here — ONE
small-int hash-bucket exchange plus a block-local structured
sort/``np.add.reduceat`` sum — is ~8x on the same domain (1.1 s) and is
already used by the basket family (pipelines/relational.py) and the
cross-source gram masks (stages/text_stats.py). ``bucket_sum`` is the
reusable form for all-int64 keys.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

_MIX = (
    0x9E3779B97F4A7C15,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x27D4EB2F165667C5,
)


def bucket_sum(
    ds,
    key_cols: Sequence[str],
    val_cols,
    n_buckets: int = 96,
    carry_cols: Sequence[str] = (),
):
    """Exact grouped int64 sum over int64 key columns: hash-bucket
    exchange + block-local reduceat. Result schema: key_cols + [val_col]
    + carry_cols (all int64); groups are globally unique (buckets
    partition keys). ``carry_cols`` are columns that are FUNCTIONS of
    the key (constant within a group) — the group's first row's value is
    carried through, replacing a redundant Min aggregate. Equivalent to
    ``groupby(key_cols).aggregate(Sum(val_col), Min(carry)...)`` —
    pinned by tests/test_stats_ops.py::test_bucket_sum_matches_groupby."""
    keys = list(key_cols)
    vals = [val_cols] if isinstance(val_cols, str) else list(val_cols)
    carries = list(carry_cols)

    def tag(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for i, c in enumerate(keys):
            h ^= np.asarray(batch[c], dtype=np.int64).view(np.uint64) * (
                np.uint64(_MIX[i % 4] + 2 * i)
            )
        gb = ((h >> np.uint64(33)) % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("gb", pa.array(gb, pa.int64()))

    dt = [(c, "<i8") for c in keys]
    empty = pa.table(
        {**{c: pa.array([], pa.int64()) for c in keys},
         **{c: pa.array([], pa.int64()) for c in vals},
         **{c: pa.array([], pa.int64()) for c in carries}}
    )

    def local(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        m = np.empty((group.num_rows, len(keys)), np.int64)
        for j, c in enumerate(keys):
            m[:, j] = np.asarray(group[c], dtype=np.int64)
        mv = m.view(dt).ravel()
        order = np.argsort(mv, kind="stable")
        mv = mv[order]
        first = np.concatenate([[True], mv[1:] != mv[:-1]])
        idx = np.flatnonzero(first)
        key = mv[idx]
        cols = {c: pa.array(key[c], pa.int64()) for c in keys}
        for c in vals:
            v = np.asarray(group[c], dtype=np.int64)[order]
            cols[c] = pa.array(np.add.reduceat(v, idx), pa.int64())
        for c in carries:
            cv = np.asarray(group[c], dtype=np.int64)[order]
            cols[c] = pa.array(cv[idx], pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(local, batch_format="pyarrow")
    )


def bucket_distinct(
    ds,
    key_cols: Sequence[str],
    n_buckets: int = 96,
):
    """Exact DISTINCT over int64 key columns: the same hash-bucket
    exchange with a block-local structured unique (buckets partition
    keys, so the in-bucket unique is global). Equivalent to
    ``groupby(key_cols).count().select(key_cols)``."""
    keys = list(key_cols)

    def tag(batch: pa.Table) -> pa.Table:
        # per-batch pre-distinct bounds the exchange at one row per key
        # per block
        m = np.empty((batch.num_rows, len(keys)), np.int64)
        for j, c in enumerate(keys):
            m[:, j] = np.asarray(batch[c], dtype=np.int64)
        m = np.unique(m, axis=0)
        h = np.zeros(len(m), dtype=np.uint64)
        for i in range(len(keys)):
            h ^= m[:, i].view(np.uint64) * np.uint64(_MIX[i % 4] + 2 * i)
        gb = ((h >> np.uint64(33)) % np.uint64(n_buckets)).astype(np.int64)
        cols = {c: pa.array(m[:, j], pa.int64()) for j, c in enumerate(keys)}
        cols["gb"] = pa.array(gb, pa.int64())
        return pa.table(cols)

    empty = pa.table({c: pa.array([], pa.int64()) for c in keys})

    def local(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        m = np.empty((group.num_rows, len(keys)), np.int64)
        for j, c in enumerate(keys):
            m[:, j] = np.asarray(group[c], dtype=np.int64)
        m = np.unique(m, axis=0)
        return pa.table(
            {c: pa.array(m[:, j], pa.int64()) for j, c in enumerate(keys)}
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(local, batch_format="pyarrow")
    )
