"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship gold query at sf0.001; ``queries`` /
``oracle_sql`` expose the full relational layer
(mobility_lakehouse_project_spark/plans/relational.py — SURVEY.md §2
operator inventory + training-data ops) for the DuckDB oracle gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mobility_lakehouse_project_spark.plans.relational import ORACLE_SQL, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the gold OD-matrix
    (reference: src/sql/gold.sql:4-16) over the TPC-H-shaped tables."""
    return QUERIES["gold_od_matrix_top"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # Keep the same ordering as queries() so any driver-side windowing
    # (first-N snapshot) covers the same entries in both dicts.
    ordered = {name: ORACLE_SQL[name] for name in QUERIES if name in ORACLE_SQL}
    ordered.update({k: v for k, v in ORACLE_SQL.items() if k not in ordered})
    return ordered
