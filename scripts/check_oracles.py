"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` DuckDB
equivalent on the same sf dir and compares row count, column names and
an order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df):
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def value_hash(df) -> str:
    import hashlib
    import pandas as pd

    df = df.copy()
    # round floats BEFORE the canonical sort: sub-rounding cross-engine
    # jitter on the sort column could otherwise reorder rows whose
    # rounded values agree, failing a numerically-identical result
    # (agreement bar: 4 decimal places)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(4)
    df = canon(df)
    payload = df.to_csv(index=False, float_format="%.4f").encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def main() -> int:
    import duckdb
    import ray

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = to_pandas(fn(sf))
        except Exception as ex:
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows={len(mine)} (no oracle — rows-only)")
            continue
        ref = con.execute(oracles[name]).fetchdf()
        problems = []
        if len(mine) != len(ref):
            problems.append(f"rows {len(mine)} != {len(ref)}")
        if sorted(mine.columns) != sorted(ref.columns):
            problems.append(f"cols {sorted(mine.columns)} != {sorted(ref.columns)}")
        elif value_hash(mine) != value_hash(ref):
            problems.append("value hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if "value hash mismatch" in problems:
                m, r = canon(mine.copy()), canon(ref.copy())
                print("  mine:", m.head(3).to_dict(orient="records"))
                print("  ref :", r.head(3).to_dict(orient="records"))
            failed.append(name)
        else:
            print(f"PASS  {name}: rows={len(mine)}")
    ray.shutdown()
    if failed:
        print("FAILED:", failed)
        return 1
    print("all oracles green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
