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
ZONES_COLS = ["id", "name", "zone_type", "centroid_lat", "centroid_lon"]
CAL_COLS = ["fecha", "dia_semana", "tipo_dia", "es_festivo_nacional", "zona_provincia"]
REL_COLS = ["distrito_mitma", "municipio_mitma", "gau_mitma"]
PERSONAS_COLS = ["fecha", "zona_pernoctacion", "edad", "sexo", "personas"]


def ingest_bronze_table(
    spark: SparkSession, csv_glob: str, warehouse: str,
    name: str, columns: list[str],
) -> LakehouseTable | None:
    """S1+S2: gz CSV -> stringly bronze table (append snapshots)."""
    df = csv_bronze.read_csv_stringly(spark, csv_glob, columns)
    if df is None:
        return None  # S3 skip-empty probe
    loc = os.path.join(warehouse, name)
    t = LakehouseTable(loc)
    if not t.exists:
        t = LakehouseTable.create(loc, df.schema, partition_col=None)
    t.append(df, n_files=max(2, spark.sparkContext.defaultParallelism // 4))
    return t


def ingest_bronze(spark: SparkSession, csv_glob: str, warehouse: str) -> LakehouseTable | None:
    return ingest_bronze_table(spark, csv_glob, warehouse, "bronze_mitma_viajes", BRONZE_COLS)


_REPLACE_MAX_FILES = 10_000


def _replace_table(df: DataFrame, loc: str, n_files: int = 2) -> LakehouseTable:
    """S8 replace sink (CTAS semantics): full-rebuild dimension write —
    the reference's CREATE OR REPLACE / INSERT-after-truncate idiom.

    Serves METADATA-SIZED dimension tables only: it collects the full
    replaced file list on the driver, which is fine for a dim's handful
    of files but must never be pointed at a fact table — guarded by an
    explicit file-count assertion (one metadata aggregation)."""
    t = LakehouseTable(loc)
    if not t.exists:
        t = LakehouseTable.create(loc, df.schema, partition_col=None)
        t.append(df, n_files=n_files)
        return t
    n_live = t.size_stats(df.sparkSession)["files"]
    if n_live > _REPLACE_MAX_FILES:
        raise ValueError(
            f"_replace_table is a dimension-table sink; {loc} has {n_live} "
            f"files (> {_REPLACE_MAX_FILES}). Rebuild fact tables via "
            "overwrite_partitions/compaction, which plan in chunks."
        )
    removed = {
        r["file_path"]
        for r in t.plan_files(df.sparkSession).select("file_path").collect()
    }
    entries = t.write_data_files(df, n_files=n_files)
    t.commit_replace(removed, entries, operation="replace")
    return t


def build_silver_dims(
    spark: SparkSession,
    bronze_zones: LakehouseTable,
    bronze_calendario: LakehouseTable,
    bronze_relacion: LakehouseTable,
    warehouse: str,
) -> dict[str, LakehouseTable]:
    """The reference's silver dimension layer (src/sql/silver.sql:4-89):

     * silver_dim_zonas — A2 MAX-dedup over zone id + derived provincia
       prefix (silver.sql:52-67)
     * silver_dim_zona_atributos — zone centroids for the gravity model
       (typed TRY_CAST promotion)
     * silver_dim_calendario — DISTINCT calendar with date parts and
       day-type booleans, national rows only (silver.sql:69-80)
     * silver_dim_zona_jerarquia — 3-way self-validating join of the
       relation table against dim_zonas (silver.sql:85-89); dims are
       broadcast, never shuffled
    """
    z = bronze_zones.scan(spark).filter(
        F.col("id").isNotNull() & (F.col("id") != "")
    )
    dim_zonas = (
        z.groupBy(F.col("id").alias("zone_id"))
        .agg(F.max("name").alias("zone_name"), F.max("zone_type").alias("zone_level"))
        .withColumn(
            "provincia_code",
            F.when(F.length("zone_id") >= 2, F.substring("zone_id", 1, 2)),
        )
    )
    dim_atributos = (
        z.groupBy(F.col("id").alias("zone_id"))
        .agg(
            F.max(F.col("centroid_lat").try_cast("double")).alias("centroid_lat"),
            F.max(F.col("centroid_lon").try_cast("double")).alias("centroid_lon"),
        )
    )
    c = bronze_calendario.scan(spark).filter(F.col("zona_provincia").isNull())
    dim_cal = (
        c.select(
            F.to_date("fecha", "yyyyMMdd").alias("fecha"),
            F.substring("fecha", 1, 4).cast("int").alias("anio"),
            F.substring("fecha", 5, 2).cast("int").alias("mes"),
            F.substring("fecha", 7, 2).cast("int").alias("dia"),
            "dia_semana",
            (F.col("tipo_dia") == "laborable").alias("es_laborable"),
            (F.col("es_festivo_nacional") == "1").alias("es_festivo_nacional"),
            (F.col("tipo_dia") == "fin_de_semana").alias("es_fin_de_semana"),
        )
        .distinct()
    )
    zon = F.broadcast(dim_zonas.select("zone_id"))
    r = bronze_relacion.scan(spark)
    jer = (
        r.join(zon.withColumnRenamed("zone_id", "distrito_mitma"), "distrito_mitma")
        .join(zon.withColumnRenamed("zone_id", "municipio_mitma"), "municipio_mitma")
        .join(zon.withColumnRenamed("zone_id", "gau_mitma"), "gau_mitma")
        .select("distrito_mitma", "municipio_mitma", "gau_mitma")
    )
    # deterministic surrogate (the reference's ROW_NUMBER() OVER () is
    # order-arbitrary; ranking over the natural key is strictly better)
    jer = jer.withColumn(
        "jerarquia_id",
        F.row_number().over(
            Window.orderBy("distrito_mitma", "municipio_mitma", "gau_mitma")
        ),
    ).select("jerarquia_id", "distrito_mitma", "municipio_mitma", "gau_mitma")
    out = {}
    for name, df in (
        ("silver_dim_zonas", dim_zonas),
        ("silver_dim_zona_atributos", dim_atributos),
        ("silver_dim_calendario", dim_cal),
        ("silver_dim_zona_jerarquia", jer),
    ):
        out[name] = _replace_table(df, os.path.join(warehouse, name))
    return out


def transform_silver_personas(
    spark: SparkSession,
    bronze_personas: LakehouseTable,
    dims: dict[str, LakehouseTable],
    warehouse: str,
) -> LakehouseTable:
    """silver_fact_personas (src/sql/silver.sql:42-49,119-131): typed
    promotion, INNER-JOIN discipline against dim_zonas + dim_calendario
    (both broadcast), personas > 0 filter, hash surrogate key,
    per-day idempotent partition overwrite."""
    p = bronze_personas.scan(spark)
    zones = F.broadcast(dims["silver_dim_zonas"].scan(spark, columns=["zone_id"]))
    cal = F.broadcast(dims["silver_dim_calendario"].scan(spark, columns=["fecha"]))
    typed = (
        p.withColumn("fecha_d", F.to_date("fecha", "yyyyMMdd"))
        .withColumn("personas_n", F.col("personas").try_cast("double"))
        .filter(F.col("personas_n") > 0)
        .join(zones.withColumnRenamed("zone_id", "zona_pernoctacion"), "zona_pernoctacion")
        .join(cal.withColumnRenamed("fecha", "fecha_d"), "fecha_d")
    )
    fact = typed.select(
        F.xxhash64("fecha_d", "zona_pernoctacion", "edad", "sexo").alias("persona_id"),
        F.col("fecha_d").alias("fecha"),
        F.col("zona_pernoctacion").alias("zona_pernoctacion_id"),
        "edad",
        "sexo",
        F.col("personas_n").alias("personas"),
        F.date_format("fecha_d", "yyyyMMdd").alias("dia"),
    )
    loc = os.path.join(warehouse, "silver_fact_personas")
    t = LakehouseTable(loc)
    if not t.exists:
        t = LakehouseTable.create(loc, fact.schema, partition_col="dia")
    # day count from the raw bronze column — never re-execute the
    # joined fact pipeline just to size the write
    n_days = p.select("fecha").distinct().count()
    t.overwrite_partitions(fact, n_files=max(2, n_days))
    return t


def transform_silver(
    spark: SparkSession,
    bronze: LakehouseTable,
    warehouse: str,
    dims: dict[str, LakehouseTable] | None = None,
) -> LakehouseTable:
    """Bronze -> silver_fact_viajes: typed, hour-extracted, hash-keyed,
    aggregated on insert (GROUP BY fecha,periodo,origen,destino with
    SUM — the DAG's aggregate-on-insert, Silver_Transform_Dag.py:194-207).
    Join-free by default (the TURBO discipline,
    reports/Sprint2_Review.html:416-442; orphan checks are a separate
    gate); with ``dims`` it applies the reference's INNER JOIN
    discipline (src/sql/silver.sql:92-106) as broadcast SEMI joins —
    the filter semantics of the inner join without widening rows."""
    b = bronze.scan(spark)
    typed = (
        b.withColumn("fecha_d", F.to_date("fecha", "yyyyMMdd"))
        .withColumn("hora", F.substring("periodo", -2, 2).try_cast("int"))
        .withColumn("viajes_n", F.col("viajes").try_cast("double"))
        .withColumn("viajes_km_n", F.col("viajes_km").try_cast("double"))
        .filter(F.col("viajes_n") > 0)
    )
    if dims is not None:
        zones = F.broadcast(dims["silver_dim_zonas"].scan(spark, columns=["zone_id"]))
        cal = F.broadcast(
            dims["silver_dim_calendario"].scan(spark, columns=["fecha"])
            .withColumnRenamed("fecha", "fecha_d")
        )
        typed = (
            typed.join(zones.withColumnRenamed("zone_id", "origen"), "origen", "left_semi")
            .join(zones.withColumnRenamed("zone_id", "destino"), "destino", "left_semi")
            .join(cal, "fecha_d", "left_semi")
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
    # day count from the raw bronze column (column-pruned, no joins) —
    # counting on `fact` would execute the whole agg pipeline twice
    n_days = b.select("fecha").distinct().count()
    # per-day idempotent re-run: partitions present in the batch replace
    t.overwrite_partitions(fact, n_files=max(2, n_days))
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


def gold_tables(
    spark: SparkSession,
    silver: LakehouseTable,
    dims: dict[str, LakehouseTable] | None = None,
    gravity_min_trips: float = 100.0,
) -> dict[str, DataFrame]:
    """The gold layer (src/sql/gold.sql) over the silver star. Without
    ``dims`` only the dimension-free tables are built; with the full
    star it adds gold_top_zones, the calendar-typed day-type table, and
    gold_gravity_model (gold.sql:124-249). Every dim is broadcast."""
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
    out = {"gold_od_matrix_top": od_top, "gold_hourly_patterns": hourly}

    if dims is None:
        day_type = F.when(F.dayofweek("fecha").isin(1, 7), "weekend").otherwise("weekday")
        out["gold_mobility_by_day_type"] = (
            s.groupBy(day_type.alias("day_type"))
            .agg(F.sum("viajes").alias("total_viajes"),
                 F.countDistinct("fecha").alias("n_days"))
            .withColumn("avg_daily", F.col("total_viajes") / F.col("n_days"))
        )
        return out

    zonas = F.broadcast(dims["silver_dim_zonas"].scan(spark))
    cal = F.broadcast(dims["silver_dim_calendario"].scan(spark))

    # day type from the calendar dim (gold.sql:104-122)
    cat = (
        F.when(F.col("es_fin_de_semana"), "fin_de_semana")
        .when(F.col("es_festivo_nacional"), "festivo")
        .otherwise("laborable")
    )
    out["gold_mobility_by_day_type"] = (
        s.join(cal, "fecha")
        .groupBy(cat.alias("day_type"))
        .agg(F.sum("viajes").alias("total_viajes"), F.avg("viajes").alias("avg_viajes"))
    )

    # top 20 zones by origin trips (gold.sql:124-137)
    ztop = Window.orderBy(F.desc("total_trips"), "zone_id")
    out["gold_top_zones"] = (
        s.join(zonas.withColumnRenamed("zone_id", "origen_zone_id"), "origen_zone_id")
        .groupBy(
            F.col("origen_zone_id").alias("zone_id"), "zone_name", "zone_level"
        )
        .agg(F.sum("viajes").alias("total_trips"))
        .withColumn("rank", F.row_number().over(ztop))
        .filter(F.col("rank") <= 20)
        .select("rank", "zone_id", "zone_name", "zone_level", "total_trips")
    )

    # gravity model Tij = k * Pi * Ej / d^2 (gold.sql:139-249)
    attrs = F.broadcast(dims["silver_dim_zona_atributos"].scan(spark))
    zo = zonas.select(F.col("zone_id").alias("origen_zone_id"),
                      F.col("zone_name").alias("origen_zone_name"))
    zd = zonas.select(F.col("zone_id").alias("destino_zone_id"),
                      F.col("zone_name").alias("destino_zone_name"))
    ao = attrs.select(F.col("zone_id").alias("origen_zone_id"),
                      F.col("centroid_lat").alias("o_lat"),
                      F.col("centroid_lon").alias("o_lon"))
    ad = attrs.select(F.col("zone_id").alias("destino_zone_id"),
                      F.col("centroid_lat").alias("d_lat"),
                      F.col("centroid_lon").alias("d_lon"))
    # NOTE on missing centroids: GREATEST skips NULLs in both Spark and
    # DuckDB (verified), so a pair with no centroid gets the 0.5 km
    # floor and the reference's own `WHERE distance_km IS NOT NULL`
    # guard (gold.sql:221) is vestigial there too — we reproduce the
    # reference's ACTUAL results rather than its comment's intent.
    dist = F.greatest(
        F.lit(0.5),
        F.when(
            F.col("o_lat").isNotNull() & F.col("d_lat").isNotNull(),
            111.32 * F.sqrt(
                F.pow(F.col("o_lat") - F.col("d_lat"), 2)
                + F.pow(
                    (F.col("o_lon") - F.col("d_lon"))
                    * F.cos(F.radians((F.col("o_lat") + F.col("d_lat")) / 2)),
                    2,
                )
            ),
        ),
    )
    base = (
        s.join(zo, "origen_zone_id").join(zd, "destino_zone_id")
        .join(ao, "origen_zone_id", "left").join(ad, "destino_zone_id", "left")
        .groupBy("origen_zone_id", "origen_zone_name", "destino_zone_id",
                 "destino_zone_name", "o_lat", "o_lon", "d_lat", "d_lon")
        .agg(F.sum("viajes").alias("observed_trips"))
        .filter(F.col("observed_trips") > gravity_min_trips)
        .withColumn("distance_km", dist)
    )
    prod = base.groupBy(F.col("origen_zone_id").alias("zone_id")).agg(
        F.sum("observed_trips").alias("pi")
    )
    attr = base.groupBy(F.col("destino_zone_id").alias("zone_id")).agg(
        F.sum("observed_trips").alias("ej")
    )
    gterm = (
        base.join(F.broadcast(prod).withColumnRenamed("zone_id", "origen_zone_id"),
                  "origen_zone_id")
        .join(F.broadcast(attr).withColumnRenamed("zone_id", "destino_zone_id"),
              "destino_zone_id")
        .filter(F.col("distance_km").isNotNull())
        .withColumn("gravity_factor",
                    F.col("pi") * F.col("ej") / F.pow("distance_km", 2))
    )
    # A11 ratio-of-sums calibration: k = sum(observed) / sum(factor)
    k = F.broadcast(
        gterm.agg(
            (F.sum("observed_trips") / F.sum("gravity_factor")).alias("k_factor")
        )
    )
    grank = Window.orderBy(F.desc("observed_trips"),
                           "origen_zone_id", "destino_zone_id")
    out["gold_gravity_model"] = (
        gterm.crossJoin(k)
        .withColumn("theoretical_trips", F.col("gravity_factor") * F.col("k_factor"))
        .withColumn(
            "ratio_obs_theo",
            F.col("observed_trips") / F.nullif(F.col("theoretical_trips"), F.lit(0.0)),
        )
        .withColumn("od_pair_id", F.row_number().over(grank))
        .filter(F.col("od_pair_id") <= 5000)
        .select("od_pair_id", "origen_zone_id", "origen_zone_name",
                "destino_zone_id", "destino_zone_name", "observed_trips",
                "theoretical_trips", "ratio_obs_theo", "distance_km",
                F.col("o_lat").alias("origen_lat"), F.col("o_lon").alias("origen_lon"),
                F.col("d_lat").alias("destino_lat"), F.col("d_lon").alias("destino_lon"))
    )
    return out


def export_gold(gold: dict[str, DataFrame], out_dir: str) -> None:
    """S10/S11 export sinks: CSV + parquet (dags/Demo_dag.py:536-651)."""
    for name, df in gold.items():
        df.write.mode("overwrite").option("header", True).csv(os.path.join(out_dir, f"{name}_csv"))
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}_parquet"))
