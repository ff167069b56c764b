"""Local mimic of the driver's oracle comparison: run every
plans.relational query on Spark AND its ORACLE_SQL twin on DuckDB at
the given sf dir; compare row count, column names, and
order-insensitive values. Usage: python tools/check_oracles.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from mobility_lakehouse_project_spark.plans.relational import ORACLE_SQL, QUERIES
from mobility_lakehouse_project_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            import os
            if os.environ.get("ORACLE_EXACT"):
                df[c] = df[c].astype("float64")
            else:
                df[c] = df[c].round(6).astype("float64")
        elif "datetime" in str(df[c].dtype) or str(df[c].dtype).startswith("date"):
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            if name not in ORACLE_SQL:
                print(f"  {name}: NO-ORACLE rows={len(sdf)}")
                continue
            odf = con.execute(ORACLE_SQL[name]).df()
            a, b = canon(sdf), canon(odf)
            if list(a.columns) != list(b.columns):
                failures.append((name, f"columns {list(a.columns)} vs {list(b.columns)}"))
                continue
            if len(a) != len(b):
                failures.append((name, f"rows {len(a)} vs {len(b)}"))
                continue
            if not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                bad_cols = [c for c in a.columns if neq[c].any()]
                idx = neq.any(axis=1)
                failures.append(
                    (name, f"values differ in {bad_cols}; first diff:\n"
                     f"spark:\n{a[idx].head(3)}\noracle:\n{b[idx].head(3)}")
                )
                continue
            print(f"  {name}: OK rows={len(a)}")
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"EXC {type(e).__name__}: {str(e)[:500]}"))
    print()
    for name, why in failures:
        print(f"FAIL {name}: {why}\n")
    print(f"{len(failures)} failures / {len(only) if only else len(QUERIES)} checked")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
