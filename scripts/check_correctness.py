"""Local stand-in for the driver's correctness gate: run every queries()
entry and compare against oracle_sql() via DuckDB (row count, column
names, order-insensitive values).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def to_df(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        path = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_df(fn(sf_dir)))
        except Exception as e:
            print(f"[FAIL] {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        wall = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)} ({wall:.1f}s)")
            if len(got) == 0 and name != "knn_lsh":
                print(f"  WARNING: empty result")
            continue
        want = canon(con.execute(oracles[name]).fetchdf())
        ok = True
        if list(got.columns) != list(want.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} != {list(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"[FAIL] {name}: rows {len(got)} != {len(want)}")
            ok = False
        else:
            try:
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-12
                )
            except AssertionError as e:
                print(f"[FAIL] {name}: values differ: {str(e)[:400]}")
                ok = False
        # The driver's value hash is dtype-sensitive (r2: purchase_attribution
        # was hash-red on Int64-<NA> vs float64-NaN while value-green here).
        # Treat any physical-dtype mismatch vs the oracle's fetchdf() frame
        # as a failure so the hazard class is caught locally.
        if ok:
            dt_bad = [
                (c, str(got[c].dtype), str(want[c].dtype))
                for c in got.columns
                if str(got[c].dtype) != str(want[c].dtype)
            ]
            if dt_bad:
                print(f"[DTYPE] {name}: {dt_bad}")
                ok = False
        if ok:
            print(f"[OK]   {name}: {len(got)} rows match oracle ({wall:.1f}s)")
        else:
            failures += 1
    ray.shutdown()
    print("failures:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
