"""Bronze-layer ingest sources: schema-on-read CSV -> typed silver.

Re-expresses the reference's ingest surface (SURVEY.md §2.1):
 * S1 gz CSV scan with custom delimiter
   (`read_csv('*.csv.gz', delim='|', header=True)`,
   src/ingest_bronze.py:24-29) -> spark.read.csv with sep; gzip codec
   inferred from the extension.
 * S2 all-varchar + source-file capture
   (`all_varchar=True, filename=True`, dags/Bronze_Ingest_Dag.py:100-109)
   -> all-StringType schema + F.input_file_name().
 * TRY_CAST bronze->typed promotion (Bronze_Ingest_Dag.py:105-106)
   -> Column.try_cast (null on failure, never a job abort).
 * S3 existence probe / skip-empty-day (Bronze_Ingest_Dag.py:76-84)
   -> glob check before submitting the read.
 * strptime('%Y%m%d') date parsing (src/sql/silver.sql:95)
   -> F.to_date(col, 'yyyyMMdd').
"""

from __future__ import annotations

import glob as globmod

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv_stringly(
    spark: SparkSession,
    path: str,
    columns: list[str],
    sep: str = "|",
    header: bool = True,
    capture_filename: bool = True,
) -> DataFrame | None:
    """S2: schema-on-read scan — every column StringType, bad rows kept
    (the bronze contract: never lose raw data), source file attached.
    Returns None when the glob matches nothing (S3 skip-day probe)."""
    # existence probe applies to LOCAL paths only: Python glob cannot
    # see object-store URIs (s3a://, hdfs://) and would mistake every
    # remote path for an empty day — those go straight to spark.read
    if "://" not in path and not globmod.glob(path):
        return None
    schema = T.StructType([T.StructField(c, T.StringType(), True) for c in columns])
    df = spark.read.options(sep=sep, header=header, mode="PERMISSIVE").schema(schema).csv(path)
    if capture_filename:
        df = df.withColumn("ingestion_file", F.input_file_name())
    return df


def promote_typed(
    bronze: DataFrame,
    casts: dict[str, str],
    date_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Bronze -> silver type promotion with TRY_CAST semantics: a
    malformed value becomes NULL (audited by a quality gate), never a
    failed job — the reference's TRY_CAST(viajes AS DOUBLE) idiom."""
    out = bronze
    for col, typ in casts.items():
        out = out.withColumn(col, F.col(col).try_cast(typ))
    for col, fmt in (date_cols or {}).items():
        out = out.withColumn(col, F.to_date(F.col(col), fmt))
    return out


def quality_gate_nulls(df: DataFrame, key_cols: list[str]) -> dict:
    """The reference's null-integrity gate (scripts/check_bronze.py:
    183-196): one pass, COUNT(*) FILTER per key column."""
    aggs = [F.count("*").alias("total")] + [
        F.count(F.when(F.col(c).isNull(), 1)).alias(f"null_{c}") for c in key_cols
    ]
    row = df.agg(*aggs).collect()[0].asDict()
    row["ok"] = all(v == 0 for k, v in row.items() if k.startswith("null_"))
    return row
