"""Audit physical dtype parity between queries() output and oracle_sql()
output (DuckDB fetchdf). The driver's value hash is sensitive to physical
representation (pandas nullable Int64 <NA> vs float64 NaN was the one red
row in round 2), which the rtol-based local gate cannot see.

Usage: python scripts/check_dtypes.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def to_df(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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

    mismatches = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            got = to_df(fn(sf_dir))
        except Exception as e:
            print(f"[ERR]  {name}: query raised {type(e).__name__}: {e}")
            mismatches += 1
            continue
        want = con.execute(oracles[name]).fetchdf()
        diffs = []
        for c in sorted(set(got.columns) | set(want.columns)):
            g = str(got[c].dtype) if c in got.columns else "<missing>"
            w = str(want[c].dtype) if c in want.columns else "<missing>"
            if g != w:
                diffs.append(f"{c}: engine={g} oracle={w}")
        if diffs:
            mismatches += 1
            print(f"[DTYPE] {name}: " + "; ".join(diffs))
        else:
            print(f"[ok]    {name}")
    ray.shutdown()
    print("dtype mismatches:", mismatches)
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
