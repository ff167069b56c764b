"""Dump .explain(\"formatted\") for named relational queries to files.

Usage: python tools/dump_plans.py <outdir> <suffix> <name> [name...]
Writes <outdir>/<name><suffix>.txt for each query, over
/root/testdata/sf0.01 (plan shape is sf-independent).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from mobility_lakehouse_project_spark.plans.relational import QUERIES  # noqa: E402
from mobility_lakehouse_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plans", cores=8)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name in names:
        df = QUERIES[name](spark, "/root/testdata/sf0.01")
        txt = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"{name}: {txt.count('Exchange')} Exchange, "
              f"{txt.count('SortMergeJoin')} SMJ, "
              f"{txt.count('BroadcastHashJoin')} BHJ, "
              f"{txt.count('Scan parquet')} scans")
    spark.stop()


if __name__ == "__main__":
    main()
