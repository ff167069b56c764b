"""End-to-end medallion pipeline: bronze CSV -> silver star schema ->
gold analytics, over engine-managed lakehouse tables.

This is the reference's full local pipeline (scripts/run_pipeline.py ->
src/ingest_bronze.py -> src/process_silver.py -> src/process_gold.py)
re-expressed Spark-first, with each layer a snapshot-versioned
LakehouseTable instead of a .duckdb file:

 * bronze: stringly-typed CSV scan + filename capture
   (src/sql/bronze.sql:5-18; all-VARCHAR schema-on-read)
 * silver: TRY_CAST promotion, strptime date parse, hour extraction
   from `periodo` (src/sql/silver.sql:92-120), xxhash64 surrogate key
   (the DAG's hash(fecha,periodo,origen,destino),
   dags/Silver_Transform_Dag.py:197), viajes>0 filter, and the
   join-free "TURBO" insert discipline (reports/Sprint2_Review.html:
   416-442 — dims are joined at query time, never at write time)
 * gold: od_matrix_top / hourly_patterns / mobility_by_day_type
   (src/sql/gold.sql:4-37) as DataFrames over the silver table
 * per-day idempotency: silver writes via overwrite_partitions on the
   fecha-derived partition (DELETE day + INSERT day,
   dags/Silver_Transform_Dag.py:188-207)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import csv_bronze
from ..tableformat import LakehouseTable

BRONZE_COLS = ["fecha", "periodo", "origen", "destino", "actividad_origen",
               "actividad_destino", "residencia", "edad", "sexo", "viajes", "viajes_km"]


def ingest_bronze(spark: SparkSession, csv_glob: str, warehouse: str) -> LakehouseTable | None:
    """S1+S2: gz CSV -> stringly bronze table (append snapshots)."""
    df = csv_bronze.read_csv_stringly(spark, csv_glob, BRONZE_COLS)
    if df is None:
        return None  # S3 skip-empty probe
    loc = os.path.join(warehouse, "bronze_mitma_viajes")
    t = LakehouseTable(loc)
    if not t.exists:
        t = LakehouseTable.create(loc, df.schema, partition_col=None)
    t.append(df, n_files=max(2, spark.sparkContext.defaultParallelism // 4))
    return t


def transform_silver(spark: SparkSession, bronze: LakehouseTable, warehouse: str) -> LakehouseTable:
    """Bronze -> silver_fact_viajes: typed, hour-extracted, hash-keyed,
    aggregated on insert (GROUP BY fecha,periodo,origen,destino with
    SUM — the DAG's aggregate-on-insert, Silver_Transform_Dag.py:194-207).
    Join-free by design (TURBO); orphan checks are a separate gate."""
    b = bronze.scan(spark)
    typed = (
        b.withColumn("fecha_d", F.to_date("fecha", "yyyyMMdd"))
        .withColumn("hora", F.substring("periodo", -2, 2).try_cast("int"))
        .withColumn("viajes_n", F.col("viajes").try_cast("double"))
        .withColumn("viajes_km_n", F.col("viajes_km").try_cast("double"))
        .filter(F.col("viajes_n") > 0)
    )
    fact = (
        typed.groupBy("fecha_d", "hora", "origen", "destino")
        .agg(F.sum("viajes_n").alias("viajes"), F.sum("viajes_km_n").alias("viajes_km"))
        .select(
            F.xxhash64("fecha_d", "hora", "origen", "destino").alias("viaje_id"),
            F.col("fecha_d").alias("fecha"),
            "hora",
            F.col("origen").alias("origen_zone_id"),
            F.col("destino").alias("destino_zone_id"),
            "viajes",
            "viajes_km",
            F.date_format("fecha_d", "yyyyMMdd").alias("dia"),  # partition col
        )
    )
    loc = os.path.join(warehouse, "silver_fact_viajes")
    t = LakehouseTable(loc)
    if not t.exists:
        t = LakehouseTable.create(loc, fact.schema, partition_col="dia")
    # per-day idempotent re-run: partitions present in the batch replace
    t.overwrite_partitions(fact, n_files=max(2, fact.select("dia").distinct().count()))
    return t


def silver_quality_gates(spark: SparkSession, silver: LakehouseTable, zone_dim: DataFrame) -> dict:
    """The reference's silver gates (src/process_silver.py:84-128):
    conservation total, null gate, orphan anti-join count."""
    s = silver.scan(spark)
    totals = s.agg(
        F.count("*").alias("rows"),
        F.sum("viajes").alias("total_viajes"),
        F.count(F.when(F.col("fecha").isNull() | F.col("origen_zone_id").isNull()
                       | F.col("viajes").isNull(), 1)).alias("nulls"),
    ).collect()[0]
    orphans = (
        s.select(F.col("origen_zone_id").alias("zone_id"))
        .union(s.select(F.col("destino_zone_id").alias("zone_id")))
        .join(F.broadcast(zone_dim), "zone_id", "left_anti")
        .count()
    )
    return {"rows": totals["rows"], "total_viajes": float(totals["total_viajes"] or 0),
            "nulls": int(totals["nulls"]), "orphans": orphans}


def gold_tables(spark: SparkSession, silver: LakehouseTable) -> dict[str, DataFrame]:
    """The gold layer (src/sql/gold.sql:4-37) over the silver table."""
    s = silver.scan(spark)
    od = (
        s.groupBy("origen_zone_id", "destino_zone_id")
        .agg(F.sum("viajes").alias("total_viajes"),
             F.sum("viajes_km").alias("total_km"),
             F.countDistinct("fecha").alias("n_days"))
    )
    w = Window.orderBy(F.desc("total_viajes"), "origen_zone_id", "destino_zone_id")
    od_top = od.withColumn("od_rank", F.row_number().over(w)).filter(F.col("od_rank") <= 1000)

    hourly = (
        s.groupBy("hora").agg(F.sum("viajes").alias("total_viajes"))
        .withColumn("pct_dia",
                    F.col("total_viajes") * 100.0
                    / F.sum("total_viajes").over(Window.partitionBy()))
        .orderBy("hora")
    )
    day_type = F.when(F.dayofweek("fecha").isin(1, 7), "weekend").otherwise("weekday")
    by_daytype = (
        s.groupBy(day_type.alias("day_type"))
        .agg(F.sum("viajes").alias("total_viajes"), F.countDistinct("fecha").alias("n_days"))
        .withColumn("avg_daily", F.col("total_viajes") / F.col("n_days"))
    )
    return {"gold_od_matrix_top": od_top, "gold_hourly_patterns": hourly,
            "gold_mobility_by_day_type": by_daytype}


def export_gold(gold: dict[str, DataFrame], out_dir: str) -> None:
    """S10/S11 export sinks: CSV + parquet (dags/Demo_dag.py:536-651)."""
    for name, df in gold.items():
        df.write.mode("overwrite").option("header", True).csv(os.path.join(out_dir, f"{name}_csv"))
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}_parquet"))
