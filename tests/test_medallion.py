"""End-to-end medallion pipeline test with a DuckDB oracle.

Synthesizes reference-shaped mobility CSVs (FIXTURES.md F3 bronze
shape), runs bronze->silver->gold through engine-managed tables, and
checks the gold OD matrix against DuckDB computing the same pipeline
from the same CSVs."""

import gzip
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.plans import medallion


def _make_csvs(d: str) -> list[str]:
    paths = []
    for day, n in (("20220301", 40), ("20220302", 35)):
        p = os.path.join(d, f"viajes_{day}.csv.gz")
        lines = ["fecha|periodo|origen|destino|actividad_origen|actividad_destino|"
                 "residencia|edad|sexo|viajes|viajes_km"]
        for i in range(n):
            o, dz = f"Z{i % 5:02d}", f"Z{(i * 3 + 1) % 5:02d}"
            lines.append(
                f"{day}|{i % 24:02d}|{o}|{dz}|casa|trabajo|ES|25-45|M|{(i % 7) + 0.5}|{i * 1.25}"
            )
        # one malformed row (viajes not numeric) exercising TRY_CAST
        lines.append(f"{day}|05|Z00|Z01|casa|otros|ES|25-45|F|bad|1.0")
        with gzip.open(p, "wt") as f:
            f.write("\n".join(lines))
        paths.append(p)
    return paths


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("medallion"))
    _make_csvs(d)
    wh = os.path.join(d, "warehouse")
    bronze = medallion.ingest_bronze(spark, os.path.join(d, "viajes_*.csv.gz"), wh)
    silver = medallion.transform_silver(spark, bronze, wh)
    gold = medallion.gold_tables(spark, silver)
    return d, bronze, silver, gold


def test_bronze_stringly_and_counts(spark, pipeline):
    d, bronze, _, _ = pipeline
    b = bronze.scan(spark)
    assert b.count() == 77  # 40+35+2 malformed
    assert dict(b.dtypes)["viajes"] == "string"


def test_silver_matches_duckdb_oracle(spark, pipeline):
    d, _, silver, _ = pipeline
    s = silver.scan(spark)
    con = duckdb.connect()
    oracle = con.execute(f"""
        SELECT CAST(strptime(fecha,'%Y%m%d') AS DATE) AS fecha,
               CAST(periodo AS INTEGER) AS hora, origen, destino,
               SUM(TRY_CAST(viajes AS DOUBLE)) AS viajes
        FROM read_csv('{d}/viajes_*.csv.gz', delim='|', header=true, all_varchar=true)
        WHERE TRY_CAST(viajes AS DOUBLE) > 0
        GROUP BY 1,2,3,4
    """).df()
    got = s.select("fecha", "hora", F.col("origen_zone_id").alias("origen"),
                   F.col("destino_zone_id").alias("destino"), "viajes").toPandas()
    assert len(got) == len(oracle)
    key = ["fecha", "hora", "origen", "destino"]
    a = got.astype({"fecha": str}).sort_values(key).reset_index(drop=True)
    b = oracle.astype({"fecha": str}).sort_values(key).reset_index(drop=True)
    assert (a["viajes"].round(6) == b["viajes"].round(6)).all()


def test_silver_rerun_idempotent(spark, pipeline):
    d, bronze, silver, _ = pipeline
    before = silver.scan(spark).count()
    medallion.transform_silver(spark, bronze, os.path.join(d, "warehouse"))
    assert silver.scan(spark).count() == before  # DELETE day + INSERT day


def test_quality_gates(spark, pipeline):
    d, _, silver, _ = pipeline
    zones = spark.createDataFrame([(f"Z{i:02d}",) for i in range(5)], "zone_id string")
    gates = medallion.silver_quality_gates(spark, silver, zones)
    assert gates["nulls"] == 0
    assert gates["orphans"] == 0
    assert gates["total_viajes"] > 0


def test_gold_and_export(spark, pipeline, tmp_path):
    d, _, _, gold = pipeline
    od = gold["gold_od_matrix_top"].collect()
    assert len(od) > 0 and od[0]["od_rank"] == 1
    hourly = gold["gold_hourly_patterns"].toPandas()
    assert abs(hourly["pct_dia"].sum() - 100.0) < 1e-6
    out = str(tmp_path / "export")
    medallion.export_gold({"gold_hourly_patterns": gold["gold_hourly_patterns"]}, out)
    re_read = spark.read.parquet(os.path.join(out, "gold_hourly_patterns_parquet"))
    assert re_read.count() == len(hourly)
