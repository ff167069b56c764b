"""Star-join materialized views: fact x dim aggregates with
change-proportional refresh.

Reference analog: every gold table joins the trips fact to the zones
dim before aggregating (/root/reference/src/sql/gold.sql) and is
rebuilt from scratch per DAG run — here the same star aggregate is
maintained incrementally from the FACT changelog, with the affected
dim attributes translated into a fact-scan range hint (the
dynamic-file-pruning idiom).  Every test asserts the invariant that
matters: after ANY refresh mode, MV content == a from-scratch
recompute of the join definition.
"""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.tableformat import Catalog
from mobility_lakehouse_project_spark.operators.matview import (
    create_materialized_view,
    materialized_view_sql,
    refresh_materialized_view,
)
from mobility_lakehouse_project_spark.operators.delete import delete_where, update_where
from mobility_lakehouse_project_spark.sql import execute_sql


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def _fact_df(spark, lo=0, hi=100, zone_mod=10):
    return spark.createDataFrame(
        [(i, i % zone_mod, 16 * (1 + i % 3)) for i in range(lo, hi)],
        "image_id long, zone_id int, w int",
    )


def _dim_df(spark):
    # boroughs b0 = zones 0..4, b1 = zones 5..9
    return spark.createDataFrame(
        [(z, f"zone{z}", f"b{z // 5}") for z in range(10)],
        "zone_id int, zone_name string, borough string",
    )


JOINS = [{"table": "silver.zones", "on": ["zone_id", "zone_id"]}]
AGGS = {"n": "count(*)", "sum_w": "sum(w)"}


def _mk(spark, cat, how="inner", group_by=("borough",)):
    cat.create_table_as("silver.trips", _fact_df(spark), n_files=4)
    cat.create_table_as("silver.zones", _dim_df(spark), n_files=1)
    joins = [dict(JOINS[0], how=how)]
    return create_materialized_view(
        spark, cat, "gold.by_borough", "silver.trips",
        group_by=list(group_by), aggs=AGGS, joins=joins)


def _expected(spark, cat, how="inner", keys=("borough",)):
    fact = cat.load_table("silver.trips").scan(spark)
    dim = cat.load_table("silver.zones").scan(spark)
    return (fact.join(dim, ["zone_id"], how)
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sum_w")))


def _assert_matches(spark, cat, how="inner", keys=("borough",)):
    k = repr
    got = sorted(
        cat.load_table("gold.by_borough").scan(spark).collect(), key=k)
    exp = sorted(_expected(spark, cat, how, keys).collect(), key=k)
    assert got == exp


def test_star_create_matches_join_recompute(spark, cat):
    res = _mk(spark, cat)
    assert res["rows"] == 2  # b0, b1
    _assert_matches(spark, cat)
    sql = materialized_view_sql(cat, "gold.by_borough")
    assert "JOIN silver_zones ON zone_id = zone_id" in sql
    assert "GROUP BY borough" in sql


def test_star_incremental_merge_with_dim_translated_hint(spark, cat):
    _mk(spark, cat)
    fact = cat.load_table("silver.trips")
    # touch only borough b0 (zones 0..4)
    fact.append(_fact_df(spark, 200, 240, zone_mod=5))
    res = refresh_materialized_view(spark, cat, "gold.by_borough",
                                    mode="incremental")
    assert res["mode"] == "incremental-merge"
    assert res["affected_groups"] == 1
    # borough is a plain DIM attribute: the affected dim rows' join-key
    # min/max becomes a FACT-scan range hint (dynamic file pruning)
    assert res["key_range_hint"] == {"zone_id": (0, 4)}
    _assert_matches(spark, cat)
    assert refresh_materialized_view(
        spark, cat, "gold.by_borough")["mode"] == "noop"


def test_star_vanished_group_via_mor_delete(spark, cat):
    _mk(spark, cat)
    fact = cat.load_table("silver.trips")
    # wipe all of borough b1 (zones 5..9) with a changelog-derivable
    # MOR delete
    delete_where(fact, spark, "zone_id >= 5", mode="mor")
    res = refresh_materialized_view(spark, cat, "gold.by_borough",
                                    mode="incremental")
    assert res["mode"] == "incremental-merge"
    assert res["vanished_groups"] == 1
    got = {r["borough"] for r in
           cat.load_table("gold.by_borough").scan(spark).collect()}
    assert got == {"b0"}
    _assert_matches(spark, cat)


def test_star_left_join_null_group_takes_rewrite_path(spark, cat):
    _mk(spark, cat, how="left")
    _assert_matches(spark, cat, how="left")
    fact = cat.load_table("silver.trips")
    # zone 99 has no dim row: LEFT JOIN puts those rows in the NULL
    # borough group, which MERGE cannot key on
    fact.append(_fact_df(spark, 300, 306, zone_mod=1)
                .withColumn("zone_id", F.lit(99)))
    res = refresh_materialized_view(spark, cat, "gold.by_borough",
                                    mode="incremental")
    assert res["mode"] == "incremental-rewrite"
    mv = cat.load_table("gold.by_borough").scan(spark)
    assert mv.filter(F.col("borough").isNull()).collect()[0]["n"] == 6
    _assert_matches(spark, cat, how="left")


def test_star_dim_change_forces_full_refresh(spark, cat):
    _mk(spark, cat)
    dim = cat.load_table("silver.zones")
    # move zone 7 from b1 to b0: any group's membership can change
    update_where(dim, spark, "zone_id = 7", {"borough": "'b0'"})
    with pytest.raises(ValueError, match="dimension table changed"):
        refresh_materialized_view(spark, cat, "gold.by_borough",
                                  mode="incremental")
    res = refresh_materialized_view(spark, cat, "gold.by_borough")
    assert res["mode"] == "full"
    assert "dimension" in res["reason"]
    _assert_matches(spark, cat)
    # dim snapshots re-pinned: next refresh is a noop
    assert refresh_materialized_view(
        spark, cat, "gold.by_borough")["mode"] == "noop"


def test_star_fact_and_dim_key_group(spark, cat):
    # group keys drawn from BOTH sides: fact zone_id + dim borough
    _mk(spark, cat, group_by=("borough", "zone_id"))
    fact = cat.load_table("silver.trips")
    fact.append(_fact_df(spark, 400, 420, zone_mod=2))  # zones 0, 1
    res = refresh_materialized_view(spark, cat, "gold.by_borough",
                                    mode="incremental")
    assert res["mode"] == "incremental-merge"
    assert res["affected_groups"] == 2
    # fact-col hint and dim-translated hint INTERSECT on zone_id:
    # affected zone_ids are {0, 1} from the fact side, and borough b0's
    # dim rows span zones 0..4 — the tighter fact bound wins
    assert res["key_range_hint"] == {"zone_id": (0, 1)}
    _assert_matches(spark, cat, keys=("borough", "zone_id"))


def test_star_join_validation(spark, cat):
    cat.create_table_as("silver.trips", _fact_df(spark), n_files=2)
    cat.create_table_as("silver.zones", _dim_df(spark), n_files=1)
    # colliding non-key column name
    cat.create_table_as(
        "silver.badzones",
        _dim_df(spark).withColumnRenamed("zone_name", "w"), n_files=1)
    with pytest.raises(ValueError, match="duplicate column"):
        create_materialized_view(
            spark, cat, "gold.bad", "silver.trips",
            group_by=["borough"], aggs=AGGS,
            joins=[{"table": "silver.badzones",
                    "on": ["zone_id", "zone_id"]}])
    with pytest.raises(ValueError, match="one side must be a column"):
        create_materialized_view(
            spark, cat, "gold.bad", "silver.trips",
            group_by=["borough"], aggs=AGGS,
            joins=[{"table": "silver.zones", "on": ["nope", "nah"]}])
    with pytest.raises(ValueError, match="inner|left"):
        create_materialized_view(
            spark, cat, "gold.bad", "silver.trips",
            group_by=["borough"], aggs=AGGS,
            joins=[{"table": "silver.zones",
                    "on": ["zone_id", "zone_id"], "how": "full"}])


def test_star_mv_sql_ddl_end_to_end(spark, cat):
    cat.create_table_as("silver.trips", _fact_df(spark), n_files=4)
    cat.create_table_as(
        "silver.zones",
        _dim_df(spark).withColumnRenamed("zone_id", "zid"), n_files=1)
    execute_sql(
        spark,
        "CREATE MATERIALIZED VIEW gold.by_borough AS "
        "SELECT borough, count(*) AS n, sum(w) AS sum_w "
        "FROM silver.trips JOIN silver.zones ON zone_id = zid "
        "WHERE w >= 16 GROUP BY borough",
        catalog=cat)
    fact = cat.load_table("silver.trips")
    dim = cat.load_table("silver.zones")
    exp = sorted(
        fact.scan(spark)
        .join(dim.scan(spark), F.col("zone_id") == F.col("zid"), "inner")
        .filter("w >= 16").groupBy("borough")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sum_w"))
        .collect(), key=repr)
    got = sorted(
        cat.load_table("gold.by_borough").scan(spark).collect(), key=repr)
    assert got == exp
    # incremental refresh through SQL, driven by a fact-side INSERT
    execute_sql(spark,
                "INSERT INTO silver.trips SELECT 500, 3, 32",
                catalog=cat)
    res = execute_sql(spark,
                      "REFRESH MATERIALIZED VIEW gold.by_borough",
                      catalog=cat)
    assert res["mode"] == "incremental-merge"
    # unparseable FROM shapes still fail loudly
    from mobility_lakehouse_project_spark.sql import LakehouseSqlError
    with pytest.raises(LakehouseSqlError, match="cannot parse"):
        execute_sql(
            spark,
            "CREATE MATERIALIZED VIEW gold.x AS SELECT borough, "
            "count(*) AS n FROM silver.trips, silver.zones "
            "GROUP BY borough", catalog=cat)
    with pytest.raises(LakehouseSqlError, match="RIGHT/FULL/CROSS"):
        execute_sql(
            spark,
            "CREATE MATERIALIZED VIEW gold.x AS SELECT borough, "
            "count(*) AS n FROM silver.trips RIGHT JOIN silver.zones "
            "ON zone_id = zid GROUP BY borough", catalog=cat)
