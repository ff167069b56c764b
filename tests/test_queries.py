"""Smoke + spot-oracle tests for the relational layer.

The driver oracle-hashes a rotating 50-query window of the full
103-query registry (tools/check_oracles.py is the local mirror that
sweeps all 103); here we keep a fast representative subset green
under plain pytest."""

import duckdb
import pytest

from mobility_lakehouse_project_spark.plans.relational import ORACLE_SQL, QUERIES

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

SPOT = ["a1_groupby_sums", "gold_od_matrix_top", "j6_anti", "w_sessionize", "ann_cosine_topk"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def test_all_queries_have_oracles(spark):
    """Since round 2 EVERY query has a DuckDB oracle twin — including
    the LSH/SimHash/ANN/multimodal operators (exact-verified or
    bit-portable forms; see their docstrings)."""
    missing = [n for n in QUERIES if n not in ORACLE_SQL]
    assert missing == [], f"queries without oracle: {missing}"
    assert set(ORACLE_SQL) <= set(QUERIES)


@pytest.mark.parametrize("name", SPOT)
def test_spot_query_matches_oracle(spark, duck, name):
    import numpy as np

    sdf = QUERIES[name](spark, SF).toPandas()
    odf = duck.execute(ORACLE_SQL[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    a = sdf[sorted(sdf.columns)].copy()
    b = odf[sorted(odf.columns)].copy()
    for df in (a, b):
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
            elif np.issubdtype(df[c].dtype, np.floating):
                df[c] = df[c].round(6).astype("float64")
            elif np.issubdtype(df[c].dtype, np.integer):
                df[c] = df[c].astype("int64")
            else:
                df[c] = df[c].astype(str)
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    assert a.equals(b), f"value mismatch in {name}"


def test_entry_contract(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() >= 0
    assert set(mod.oracle_sql()).issubset(set(mod.queries()))


def test_driver_window_rotation_covers_everything():
    """The external driver hash-checks only the FIRST 50 registry
    entries per round. Round-5 invariant: the union of the round-4
    snapshot (CORRECTNESS_r04.json) and the current first-50 window
    must cover every query that existed when the window was rotated —
    reordering or inserting registry entries above position 50 can
    silently drop driver coverage, which this pins."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..",
                        "CORRECTNESS_r04.json")
    r04 = set(json.load(open(path)))
    names = list(QUERIES)
    covered = set(names[:50]) | r04
    # queries added after the rotation are exempt (local-oracle only,
    # listed explicitly so an addition here is a conscious decision)
    post_rotation = {"a_time_ohlc", "sql_update_from",
                     "w_range_moving_avg"}
    uncovered = set(names) - covered - post_rotation
    assert uncovered == set(), (
        f"queries outside both driver windows: {sorted(uncovered)}")
