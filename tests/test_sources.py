"""Bronze CSV ingest source tests (S1/S2/S3 + TRY_CAST promotion)."""

import gzip
import os

from mobility_lakehouse_project_spark.sources import csv_bronze


def _write_gz_csv(path: str, text: str) -> None:
    with gzip.open(path, "wt") as f:
        f.write(text)


def test_stringly_read_and_promote(spark, tmp_path):
    p = str(tmp_path / "viajes_20220301.csv.gz")
    _write_gz_csv(
        p,
        "fecha|periodo|origen|destino|viajes|viajes_km\n"
        "20220301|03|A01|B02|12.5|99.1\n"
        "20220301|27|A01|B03|notanumber|5\n"  # bad value -> NULL, row kept
        "20220302|04|A02|B02|3|7.7\n",
    )
    cols = ["fecha", "periodo", "origen", "destino", "viajes", "viajes_km"]
    df = csv_bronze.read_csv_stringly(spark, p, cols)
    assert df is not None
    rows = df.collect()
    assert len(rows) == 3
    assert all(r["ingestion_file"].endswith(".csv.gz") for r in rows)
    assert all(isinstance(r["viajes"], (str, type(None))) for r in rows)  # stringly

    typed = csv_bronze.promote_typed(
        df,
        casts={"viajes": "double", "viajes_km": "double"},
        date_cols={"fecha": "yyyyMMdd"},
    )
    out = {(str(r["fecha"]), r["periodo"]): r for r in typed.collect()}
    assert out[("2022-03-01", "03")]["viajes"] == 12.5
    assert out[("2022-03-01", "27")]["viajes"] is None  # TRY_CAST semantics
    gate = csv_bronze.quality_gate_nulls(typed, ["fecha", "origen", "viajes"])
    assert gate["total"] == 3
    assert gate["null_viajes"] == 1 and not gate["ok"]


def test_missing_glob_returns_none(spark, tmp_path):
    df = csv_bronze.read_csv_stringly(
        spark, str(tmp_path / "nope_*.csv.gz"), ["a", "b"]
    )
    assert df is None
