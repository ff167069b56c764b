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


def _gz(path: str, lines: list[str]) -> None:
    with gzip.open(path, "wt") as f:
        f.write("\n".join(lines))


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
        _gz(p, lines)
        paths.append(p)
    return paths


def _make_dim_csvs(d: str) -> None:
    """Reference-shaped zone / calendar / relation / personas CSVs
    (bronze_ine_zones, bronze_calendario_laboral, bronze_ine_relacion,
    bronze_mitma_personas)."""
    zones = ["id|name|zone_type|centroid_lat|centroid_lon"]
    for i in range(5):  # districts (duplicated rows exercise MAX-dedup)
        zones.append(f"Z{i:02d}|Zona {i}|distrito|{40.0 + i * 0.1}|{-3.7 + i * 0.05}")
        zones.append(f"Z{i:02d}|Zona {i}|distrito|{40.0 + i * 0.1}|{-3.7 + i * 0.05}")
    for i in range(2):  # municipios
        zones.append(f"M{i:02d}|Municipio {i}|municipio|{40.5 + i * 0.1}|{-3.6}")
    zones.append("G00|GAU Centro|gau|40.4|-3.7")
    zones.append("|sin id|distrito|0|0")  # empty id filtered out
    _gz(os.path.join(d, "zones.csv.gz"), zones)

    cal = ["fecha|dia_semana|tipo_dia|es_festivo_nacional|zona_provincia",
           "20220301|martes|laborable|0|",
           "20220302|miercoles|fin_de_semana|0|",   # synthetic weekend
           "20220303|jueves|laborable|1|",          # festivo (no trips)
           "20220301|martes|laborable|0|28"]        # provincial row filtered
    _gz(os.path.join(d, "calendario.csv.gz"), cal)

    rel = ["distrito_mitma|municipio_mitma|gau_mitma"]
    for i in range(5):
        rel.append(f"Z{i:02d}|M{i % 2:02d}|G00")
    rel.append("Z99|M00|G00")  # orphan district -> dropped by the join
    _gz(os.path.join(d, "relacion.csv.gz"), rel)

    per = ["fecha|zona_pernoctacion|edad|sexo|personas"]
    for day in ("20220301", "20220302"):
        for i in range(5):
            per.append(f"{day}|Z{i:02d}|25-45|M|{(i + 1) * 10.5}")
    per.append("20220301|Z00|25-45|F|0")     # personas=0 filtered
    per.append("20220301|ZXX|25-45|M|5.0")   # orphan zone dropped by join
    _gz(os.path.join(d, "personas.csv.gz"), per)


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("medallion"))
    _make_csvs(d)
    wh = os.path.join(d, "warehouse")
    bronze = medallion.ingest_bronze(spark, os.path.join(d, "viajes_*.csv.gz"), wh)
    silver = medallion.transform_silver(spark, bronze, wh)
    gold = medallion.gold_tables(spark, silver)
    return d, bronze, silver, gold


@pytest.fixture(scope="module")
def star(spark, tmp_path_factory):
    """Full star schema: dims + both facts + the dim-joined gold layer."""
    d = str(tmp_path_factory.mktemp("medallion_star"))
    _make_csvs(d)
    _make_dim_csvs(d)
    wh = os.path.join(d, "warehouse")
    bz = medallion.ingest_bronze(spark, os.path.join(d, "viajes_*.csv.gz"), wh)
    b_zones = medallion.ingest_bronze_table(
        spark, os.path.join(d, "zones.csv.gz"), wh, "bronze_ine_zones", medallion.ZONES_COLS)
    b_cal = medallion.ingest_bronze_table(
        spark, os.path.join(d, "calendario.csv.gz"), wh,
        "bronze_calendario_laboral", medallion.CAL_COLS)
    b_rel = medallion.ingest_bronze_table(
        spark, os.path.join(d, "relacion.csv.gz"), wh,
        "bronze_ine_relacion", medallion.REL_COLS)
    b_per = medallion.ingest_bronze_table(
        spark, os.path.join(d, "personas.csv.gz"), wh,
        "bronze_mitma_personas", medallion.PERSONAS_COLS)
    dims = medallion.build_silver_dims(spark, b_zones, b_cal, b_rel, wh)
    silver = medallion.transform_silver(spark, bz, wh, dims=dims)
    personas = medallion.transform_silver_personas(spark, b_per, dims, wh)
    gold = medallion.gold_tables(spark, silver, dims=dims, gravity_min_trips=0.0)
    return d, dims, silver, personas, gold


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


def test_star_dims(spark, star):
    d, dims, _, _, _ = star
    z = {r["zone_id"]: r for r in dims["silver_dim_zonas"].scan(spark).collect()}
    assert len(z) == 8  # 5 distritos + 2 municipios + 1 gau; empty id dropped
    assert z["Z03"]["zone_name"] == "Zona 3" and z["Z03"]["provincia_code"] == "Z0"
    cal = {str(r["fecha"]): r for r in dims["silver_dim_calendario"].scan(spark).collect()}
    assert len(cal) == 3  # provincial row excluded
    assert cal["2022-03-02"]["es_fin_de_semana"] is True
    assert cal["2022-03-03"]["es_festivo_nacional"] is True
    jer = dims["silver_dim_zona_jerarquia"].scan(spark).collect()
    assert len(jer) == 5  # orphan Z99 row dropped by the 3-way join
    assert sorted(r["jerarquia_id"] for r in jer) == [1, 2, 3, 4, 5]
    at = {r["zone_id"]: r for r in dims["silver_dim_zona_atributos"].scan(spark).collect()}
    assert abs(at["Z01"]["centroid_lat"] - 40.1) < 1e-9


def test_star_fact_personas_oracle(spark, star):
    d, _, _, personas, _ = star
    con = duckdb.connect()
    oracle = con.execute(f"""
        WITH zones AS (
            SELECT id FROM read_csv('{d}/zones.csv.gz', delim='|', header=true, all_varchar=true)
            WHERE id IS NOT NULL AND id != '' GROUP BY id
        ), cal AS (
            SELECT DISTINCT strptime(fecha,'%Y%m%d')::DATE AS fecha
            FROM read_csv('{d}/calendario.csv.gz', delim='|', header=true, all_varchar=true)
            WHERE zona_provincia IS NULL
        )
        SELECT strptime(p.fecha,'%Y%m%d')::DATE AS fecha, p.zona_pernoctacion,
               SUM(TRY_CAST(p.personas AS DOUBLE)) AS personas
        FROM read_csv('{d}/personas.csv.gz', delim='|', header=true, all_varchar=true) p
        JOIN zones z ON p.zona_pernoctacion = z.id
        JOIN cal c ON strptime(p.fecha,'%Y%m%d')::DATE = c.fecha
        WHERE TRY_CAST(p.personas AS DOUBLE) > 0
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    got = (
        personas.scan(spark)
        .groupBy("fecha", F.col("zona_pernoctacion_id").alias("zona_pernoctacion"))
        .agg(F.sum("personas").alias("personas"))
        .orderBy("fecha", "zona_pernoctacion")
        .toPandas()
    )
    assert len(got) == len(oracle) == 10
    assert (got["personas"].round(6).values == oracle["personas"].round(6).values).all()


def test_star_gold_top_zones_and_day_type(spark, star):
    d, _, silver, _, gold = star
    top = gold["gold_top_zones"].collect()
    assert 0 < len(top) <= 20
    assert top[0]["rank"] == 1 and top[0]["zone_name"].startswith("Zona")
    # ranks strictly ordered by total_trips desc
    trips = [r["total_trips"] for r in sorted(top, key=lambda r: r["rank"])]
    assert trips == sorted(trips, reverse=True)
    # day-type categories come from the calendar dim
    dt = {r["day_type"]: r["total_viajes"] for r in gold["gold_mobility_by_day_type"].collect()}
    assert set(dt) == {"laborable", "fin_de_semana"}  # no trips on the festivo
    total = silver.scan(spark).agg(F.sum("viajes")).collect()[0][0]
    assert abs(sum(dt.values()) - total) < 1e-9


def test_star_gravity_model_oracle(spark, star):
    """Gravity model vs DuckDB computing the reference's exact algebra
    (gold.sql:139-249) from the engine's own silver tables."""
    d, dims, silver, _, gold = star
    got = gold["gold_gravity_model"].toPandas()
    assert len(got) > 0
    con = duckdb.connect()
    sv = silver.scan(spark).toPandas()
    zn = dims["silver_dim_zonas"].scan(spark).toPandas()
    at = dims["silver_dim_zona_atributos"].scan(spark).toPandas()
    con.register("sv", sv); con.register("zn", zn); con.register("at", at)
    oracle = con.execute("""
        WITH base AS (
            SELECT v.origen_zone_id, v.destino_zone_id,
                   SUM(v.viajes) AS observed_trips,
                   GREATEST(0.5, 111.32 * SQRT(POW(ao.centroid_lat - ad.centroid_lat, 2)
                       + POW((ao.centroid_lon - ad.centroid_lon)
                             * COS(RADIANS((ao.centroid_lat + ad.centroid_lat)/2)), 2))) AS distance_km
            FROM sv v
            JOIN zn zo ON v.origen_zone_id = zo.zone_id
            JOIN zn zd ON v.destino_zone_id = zd.zone_id
            LEFT JOIN at ao ON v.origen_zone_id = ao.zone_id
            LEFT JOIN at ad ON v.destino_zone_id = ad.zone_id
            GROUP BY 1, 2, ao.centroid_lat, ao.centroid_lon, ad.centroid_lat, ad.centroid_lon
            HAVING SUM(v.viajes) > 0.0
        ), prod AS (SELECT origen_zone_id AS z, SUM(observed_trips) AS pi FROM base GROUP BY 1),
        attr AS (SELECT destino_zone_id AS z, SUM(observed_trips) AS ej FROM base GROUP BY 1),
        gterm AS (
            SELECT b.*, p.pi * a.ej / POW(b.distance_km, 2) AS gravity_factor
            FROM base b JOIN prod p ON b.origen_zone_id = p.z
                        JOIN attr a ON b.destino_zone_id = a.z
        ), k AS (SELECT SUM(observed_trips) / SUM(gravity_factor) AS kf FROM gterm)
        SELECT origen_zone_id, destino_zone_id, observed_trips,
               gravity_factor * kf AS theoretical_trips, distance_km
        FROM gterm, k ORDER BY 1, 2
    """).df()
    g = got.sort_values(["origen_zone_id", "destino_zone_id"]).reset_index(drop=True)
    assert len(g) == len(oracle)
    for c in ("observed_trips", "theoretical_trips", "distance_km"):
        assert (g[c].round(6).values == oracle[c].round(6).values).all()
    # calibration property: sum(theoretical) == sum(observed)
    assert abs(g["theoretical_trips"].sum() - g["observed_trips"].sum()) < 1e-6


def test_star_silver_semi_join_discipline(spark, star):
    """The INNER JOIN discipline: silver only carries zone ids present
    in dim_zonas and dates present in dim_calendario."""
    d, dims, silver, _, _ = star
    s = silver.scan(spark)
    zones = dims["silver_dim_zonas"].scan(spark).select("zone_id")
    orphans = (
        s.select(F.col("origen_zone_id").alias("zone_id"))
        .union(s.select(F.col("destino_zone_id").alias("zone_id")))
        .join(zones, "zone_id", "left_anti").count()
    )
    assert orphans == 0


def test_replace_table_guards_large_tables(spark, tmp_path, monkeypatch):
    """_replace_table collects the replaced file list on the driver —
    valid for metadata-sized dims only; a many-file table must be
    rejected loudly instead of silently materializing its manifest."""
    import pytest as _pt

    from mobility_lakehouse_project_spark import synth
    from mobility_lakehouse_project_spark.plans import medallion

    loc = str(tmp_path / "bigdim")
    df = synth.images_df(spark, 120, partitions=2)
    medallion._replace_table(df, loc, n_files=6)  # create: fine
    monkeypatch.setattr(medallion, "_REPLACE_MAX_FILES", 0)
    with _pt.raises(ValueError, match="dimension-table sink"):
        medallion._replace_table(df, loc, n_files=6)
