"""mobility_lakehouse_project_spark — a PySpark-native lakehouse
table-maintenance engine.

From-scratch re-expression of the capabilities of the reference
DuckDB/Airflow "DuckLake" lakehouse (YonkimonkY/Mobility_Lakehouse_Project):
an Iceberg-style table format (snapshots, manifest files, atomic
version-pointer commits) implemented over plain parquet + JSON, with
maintenance operators (bin-pack compaction, Z-order / Hilbert clustering,
manifest rewrite, snapshot expiration, MERGE INTO upserts), a per-partition
lineage checkpoint for kill/resume, and a relational query layer covering
the reference's full operator inventory (SURVEY.md §2).

Everything is idiomatic Spark: DataFrame/SQL plans optimized by Catalyst,
AQE for skew/coalesce, Arrow-vectorized pandas UDFs for per-row work
(image decode, space-filling-curve keys) — never row-at-a-time Python.
"""

__version__ = "0.1.0"
