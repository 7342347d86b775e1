"""Z-order (Morton-curve) Parquet layout + multi-column pruned reads.

The hash-bucketed layout (``state/clustered.py``) prepays ONE equi-join
key; Z-ordering prepays RANGE predicates on TWO columns at once — the
lakehouse data-skipping idiom (Delta/Iceberg ``ZORDER BY``, a public
design): interleave the bits of both columns' rank-quantized values,
range-partition by that Morton value, and record per-file min/max of
BOTH raw columns in a manifest. Because z-adjacent rows are close in
both dimensions, a predicate on either column (or both) intersects few
files' [min, max] envelopes, and the reader opens only those — pruning
at the storage layer, before any Ray task sees a byte.

Correctness never depends on the curve: the manifest stores TRUE
per-file min/max, the planner keeps every file whose envelope
intersects the predicate, and the reader re-applies the exact row
filter. The curve only decides how MUCH is pruned (a skewed column
quantizes through its min/max span; pathological skew degrades pruning,
never correctness). Reference analogue: the engine's IVF parquet layout
prunes by cell the same way (stages/ivf.py); this generalizes the trick
to relational range predicates.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

ZORDER_MANIFEST = "_ZORDER.json"


def _spread_bits32(x: np.ndarray) -> np.ndarray:
    """Spread each of the low 32 bits of ``x`` to the even bit
    positions of a uint64 (the Morton magic-number ladder)."""
    v = x.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def zvalue(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Morton interleave of two uint32 arrays -> uint64 (a gets the
    even bits, b the odd)."""
    return _spread_bits32(a) | (_spread_bits32(b) << np.uint64(1))


def _quantize(x: np.ndarray, lo: int, hi: int) -> np.ndarray:
    """Monotone map of int64 values in [lo, hi] onto uint32."""
    if hi <= lo:
        return np.zeros(len(x), dtype=np.uint64)
    span = np.uint64(hi - lo)
    off = (x.astype(np.int64) - np.int64(lo)).astype(np.uint64)
    return (off * np.uint64(0xFFFFFFFF)) // span


def write_zorder(
    ds,
    out_dir: str,
    col_a: str,
    col_b: str,
    n_files: int = 64,
) -> str:
    """Write ``ds`` Z-ordered by int64 columns (col_a, col_b) into
    ``out_dir/zfile=i/`` with a per-file min/max manifest.

    Three passes over the INPUT + one read-back, nothing corpus-sized
    on the driver: (1) global min/max of both columns (one scalar
    aggregate); (2) a 4096-bin histogram of the top z bits, inverted on
    the driver into ~equal-row file boundaries (balanced files up to
    bin granularity — the same histogram-inversion move as the exact
    quantile operators); (3) the write with ``zfile`` attached
    row-locally; the manifest's per-file min/max then aggregates over
    the WRITTEN files, not the input lineage. Each pass re-executes
    ``ds``'s lineage — hand this function a plain ``read_parquet`` (or
    a materialized dataset), not an expensive pipeline tail.
    """
    from ray.data.aggregate import Max, Min, Sum

    os.makedirs(out_dir, exist_ok=True)

    stats = ds.aggregate(
        Min(col_a, alias_name="amin"),
        Max(col_a, alias_name="amax"),
        Min(col_b, alias_name="bmin"),
        Max(col_b, alias_name="bmax"),
    )
    amin, amax = int(stats["amin"]), int(stats["amax"])
    bmin, bmax = int(stats["bmin"]), int(stats["bmax"])

    def zcol(batch: pa.Table) -> np.ndarray:
        a = _quantize(np.asarray(batch[col_a], dtype=np.int64), amin, amax)
        b = _quantize(np.asarray(batch[col_b], dtype=np.int64), bmin, bmax)
        return zvalue(a, b)

    # histogram of the top 12 z bits -> driver-side boundary inversion
    def hist(batch: pa.Table) -> pa.Table:
        bins = (zcol(batch) >> np.uint64(52)).astype(np.int64)
        u, c = np.unique(bins, return_counts=True)
        return pa.table(
            {
                "bin": pa.array(u, pa.int64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    rows = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    rows.sort(key=lambda r: r["bin"])
    counts = np.array([r["n"] for r in rows], dtype=np.int64)
    bins = np.array([r["bin"] for r in rows], dtype=np.int64)
    total = int(counts.sum())
    cum = np.cumsum(counts)
    # boundary bins: first bin whose cumulative count reaches k*total/n
    targets = (np.arange(1, n_files) * total) // n_files
    bounds = bins[np.searchsorted(cum, targets, side="left")]

    def assign(batch: pa.Table) -> pa.Table:
        zb = (zcol(batch) >> np.uint64(52)).astype(np.int64)
        f = np.searchsorted(bounds, zb, side="right")
        return batch.append_column("zfile", pa.array(f, pa.int64()))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["zfile"]
    )

    # manifest from the WRITTEN files' parquet FOOTER statistics — no
    # data read, no re-execution of the input lineage (footers are the
    # same min/max source Delta/Iceberg skipping uses)
    import pyarrow.parquet as pq

    manifest_rows = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("zfile="):
            continue
        zf = int(name.split("=", 1)[1])
        part = os.path.join(out_dir, name)
        amn = amx = bmn = bmx = None
        for fname in sorted(os.listdir(part)):
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(part, fname)).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            ia, ib = names.index(col_a), names.index(col_b)
            for rg in range(md.num_row_groups):
                sa = md.row_group(rg).column(ia).statistics
                sb = md.row_group(rg).column(ib).statistics
                if sa is None or sb is None or not sa.has_min_max:
                    raise ValueError("parquet stats missing for %s" % fname)
                amn = sa.min if amn is None else min(amn, sa.min)
                amx = sa.max if amx is None else max(amx, sa.max)
                bmn = sb.min if bmn is None else min(bmn, sb.min)
                bmx = sb.max if bmx is None else max(bmx, sb.max)
        manifest_rows.append(
            {
                "zfile": zf,
                "amin": int(amn),
                "amax": int(amx),
                "bmin": int(bmn),
                "bmax": int(bmx),
            }
        )
    with open(os.path.join(out_dir, ZORDER_MANIFEST), "w") as f:
        json.dump(
            {
                "col_a": col_a,
                "col_b": col_b,
                "files": sorted(
                    (
                        {
                            "zfile": int(r["zfile"]),
                            "amin": int(r["amin"]),
                            "amax": int(r["amax"]),
                            "bmin": int(r["bmin"]),
                            "bmax": int(r["bmax"]),
                        }
                        for r in manifest_rows
                    ),
                    key=lambda d: d["zfile"],
                ),
            },
            f,
        )
    return out_dir


def zorder_plan(
    out_dir: str,
    a_range: Optional[Tuple[int, int]] = None,
    b_range: Optional[Tuple[int, int]] = None,
):
    """File directories surviving min/max envelope pruning for the
    given closed ranges (None = no predicate on that column). Exposed
    separately so tests can assert HOW MUCH was pruned."""
    with open(os.path.join(out_dir, ZORDER_MANIFEST)) as f:
        man = json.load(f)
    keep = []
    for fi in man["files"]:
        if a_range and (fi["amax"] < a_range[0] or fi["amin"] > a_range[1]):
            continue
        if b_range and (fi["bmax"] < b_range[0] or fi["bmin"] > b_range[1]):
            continue
        keep.append(os.path.join(out_dir, "zfile=%d" % fi["zfile"]))
    return keep, len(man["files"])


def read_zorder(
    out_dir: str,
    a_range: Optional[Tuple[int, int]] = None,
    b_range: Optional[Tuple[int, int]] = None,
):
    """Pruned read: open only the files whose envelope intersects the
    predicate, then re-apply the EXACT row filter (pruning is a
    superset guarantee, never a substitute for the predicate). Returns
    a Dataset without the layout's zfile column."""
    import pyarrow.compute as pc
    import ray.data

    with open(os.path.join(out_dir, ZORDER_MANIFEST)) as f:
        man = json.load(f)
    col_a, col_b = man["col_a"], man["col_b"]
    dirs, _ = zorder_plan(out_dir, a_range, b_range)
    if not dirs:
        # nothing intersects: read one file for its schema; the exact
        # filter below empties it (never read the manifest JSON)
        dirs = [
            os.path.join(out_dir, "zfile=%d" % man["files"][0]["zfile"])
        ]
    # read_parquet takes one dir or a list of FILES — expand the dirs
    paths = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    ds = ray.data.read_parquet(paths)

    def exact(batch: pa.Table) -> pa.Table:
        mask = np.ones(batch.num_rows, dtype=bool)
        if a_range:
            a = np.asarray(batch[col_a], dtype=np.int64)
            mask &= (a >= a_range[0]) & (a <= a_range[1])
        if b_range:
            b = np.asarray(batch[col_b], dtype=np.int64)
            mask &= (b >= b_range[0]) & (b <= b_range[1])
        out = batch.filter(pa.array(mask))
        if "zfile" in out.column_names:
            out = out.drop_columns(["zfile"])
        return out

    return ds.map_batches(exact, batch_format="pyarrow")
