"""Warehouse catalog: namespaced tables under one root (HadoopCatalog
flavor — the directory tree is the catalog). The reference's multi-DB
ATTACH federation (src/ingest_bronze.py, bronze./silver. addressing)
maps to Catalog names + register_all SQL views."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.tableformat import Catalog
from mobility_lakehouse_project_spark.tableformat.table import SORT_ORDER_PROP


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "warehouse"))


def _df(spark, n=100):
    return spark.createDataFrame(
        [(i, (i * 37) % 256, f"cap{i}") for i in range(n)],
        "image_id long, phash long, caption string",
    )


def test_create_load_list_namespaces(spark, cat):
    df = _df(spark)
    cat.create_table("bronze.images", df.schema).append(df, n_files=2)
    cat.create_table("silver.images", df.schema)
    cat.create_table("plain", df.schema)  # default namespace
    assert cat.list_namespaces() == ["bronze", "default", "silver"]
    assert cat.list_tables() == [
        "bronze.images", "default.plain", "silver.images"]
    assert cat.list_tables("bronze") == ["bronze.images"]
    assert cat.load_table("bronze.images").scan(spark).count() == 100
    assert cat.table_exists("plain") and not cat.table_exists("nope.x")


def test_name_validation_and_missing(spark, cat):
    for bad in ["a.b.c", "ns.1tbl", "bad-name", ""]:
        with pytest.raises(ValueError):
            cat.create_table(bad, _df(spark).schema)
    with pytest.raises(ValueError, match="no table"):
        cat.load_table("ghost.tbl")
    cat.create_table("ns.t", _df(spark).schema)
    with pytest.raises(FileExistsError):
        cat.create_table("ns.t", _df(spark).schema)


def test_drop_requires_purge_when_data_present(spark, cat):
    df = _df(spark)
    cat.create_table("ns.t", df.schema).append(df)
    with pytest.raises(ValueError, match="purge"):
        cat.drop_table("ns.t")
    cat.drop_table("ns.t", purge=True)
    assert not cat.table_exists("ns.t")
    cat.create_table("ns.empty", df.schema)
    cat.drop_table("ns.empty")  # no data -> no purge needed
    assert cat.list_tables("ns") == []


def test_register_all_cross_table_sql(spark, cat):
    df = _df(spark)
    cat.create_table("bronze.images", df.schema).append(df)
    cat.create_table("silver.stats", df.schema).append(df.limit(40))
    views = cat.register_all(spark, metadata=True)
    assert views == ["bronze_images", "silver_stats"]
    got = spark.sql(
        "SELECT count(*) AS n FROM bronze_images b "
        "LEFT SEMI JOIN silver_stats s ON b.image_id = s.image_id"
    ).collect()[0]["n"]
    assert got == 40
    assert spark.sql(
        "SELECT count(*) AS n FROM bronze_images_files").collect()[0]["n"] > 0


def test_maintain_all_per_table_policy(spark, cat):
    df = _df(spark, 2000).withColumn("w", F.col("phash") % 64 + 16) \
        .withColumn("h", F.col("phash") % 32 + 16)
    clustered = cat.create_table(
        "ns.clustered", df.schema,
        properties={SORT_ORDER_PROP: "zorder(phash,w,h)"})
    clustered.append(df, n_files=6)
    plain = cat.create_table("ns.plain", df.schema)
    plain.append(df, n_files=6)
    rep = cat.maintain_all(spark, target_file_size=1 << 20, keep_snapshots=5)
    assert rep["ns.clustered"]["cluster"]["files_out"] > 0
    assert "cluster" not in rep["ns.plain"]
    assert rep["ns.plain"]["compact"]["files_in"] > 0


def test_maintain_all_isolates_failures(spark, cat, monkeypatch):
    df = _df(spark)
    cat.create_table("ns.a", df.schema).append(df)
    cat.create_table("ns.b", df.schema).append(df)
    import mobility_lakehouse_project_spark.tableformat.catalog as catmod

    real = catmod.Catalog.load_table

    def boom(self, name):
        if name == "ns.a":
            raise RuntimeError("corrupt table")
        return real(self, name)

    monkeypatch.setattr(catmod.Catalog, "load_table", boom)
    rep = cat.maintain_all(spark, target_file_size=1 << 20)
    assert "RuntimeError" in rep["ns.a"]["error"]
    assert "compact" in rep["ns.b"]


def test_create_table_as(spark, cat):
    df = _df(spark, 30)
    t = cat.create_table_as("silver.ctas", df, n_files=2)
    assert t.scan(spark).count() == 30
    assert cat.list_tables("silver") == ["silver.ctas"]


def test_maintenance_policy_from_properties(spark, cat):
    """Per-table maintenance policy declared as table properties; an
    explicit argument still wins over the property."""
    df = _df(spark, 500)
    t = cat.create_table(
        "ns.pol", df.schema,
        properties={"maintenance.keep-snapshots": "2",
                    "maintenance.target-file-size-mb": "1"})
    for _ in range(6):
        t.append(df, n_files=2)
    from mobility_lakehouse_project_spark.plans.maintenance import (
        run_maintenance,
    )

    run_maintenance(t, spark, orphan_grace_s=0.0)
    assert len(t.snapshots_list()) <= 3  # 2 kept + the compact commit
    for _ in range(5):
        t.append(df, n_files=2)
    run_maintenance(t, spark, keep_snapshots=5, orphan_grace_s=0.0)
    assert len(t.snapshots_list()) >= 5  # explicit arg beat the property

    t.update_properties({"maintenance.cluster-mode": "bogus"})
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cluster-mode"):
        run_maintenance(t, spark)


def test_age_based_expiry(spark, cat):
    """expire_snapshots(older_than_ms): snapshots newer than the
    cutoff survive beyond keep_last; keep_last stays the floor when
    everything is older than the cutoff."""
    import time as _time

    df = _df(spark, 50)
    t = cat.create_table("ns.age", df.schema)
    for _ in range(6):
        t.append(df)
    r = t.expire_snapshots(keep_last=2, older_than_ms=0)
    assert r["expired"] == 0          # nothing is older than epoch 0
    future = int(_time.time() * 1000) + 10_000
    r = t.expire_snapshots(keep_last=2, older_than_ms=future)
    assert r["expired"] == 4          # all older than cutoff -> floor of 2
    assert len(t.snapshots_list()) == 3  # 2 + expiry commit
    assert t.scan(spark).count() == 300


def test_age_policy_property_in_maintenance(spark, cat):
    from mobility_lakehouse_project_spark.plans.maintenance import (
        run_maintenance,
    )

    df = _df(spark, 50)
    t = cat.create_table(
        "ns.agepol", df.schema,
        properties={"maintenance.max-snapshot-age-ms": "9999999999"})
    for _ in range(8):
        t.append(df)
    rep = run_maintenance(t, spark, keep_snapshots=2, orphan_grace_s=0.0)
    # ~116-day age window: every snapshot is younger -> none expire
    assert rep["expire_snapshots"]["expired"] == 0


def test_register_all_refuses_view_collisions(spark, cat):
    df = _df(spark, 5)
    cat.create_table("a_b.c", df.schema)
    cat.create_table("a.b_c", df.schema)
    with pytest.raises(ValueError, match="collides"):
        cat.register_all(spark)
    with pytest.raises(ValueError, match="bad namespace"):
        cat.list_tables("..")


def test_rename_table_moves_and_scans(spark, tmp_path):
    """rename_table is one directory rename (manifest paths are
    table-relative): the moved table scans identically, the old name is
    gone, and an occupied destination refuses."""
    from mobility_lakehouse_project_spark.tableformat.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    df = spark.createDataFrame([(i, f"t{i}") for i in range(50)],
                               "id long, tag string")
    cat.create_table_as("bronze.src", df)
    t2 = cat.rename_table("bronze.src", "silver.dst")
    assert t2.scan(spark).count() == 50
    assert not cat.table_exists("bronze.src")
    assert cat.table_exists("silver.dst")
    assert "dst" in " ".join(cat.list_tables("silver"))
    with pytest.raises(ValueError, match="already exists"):
        cat.create_table_as("silver.other", df)
        cat.rename_table("silver.other", "silver.dst")


# ---------------- catalog views (Iceberg view analog) ----------------


def test_view_lifecycle_and_lazy_replan(spark, cat):
    from mobility_lakehouse_project_spark.sql import execute_sql

    df = _df(spark)
    cat.create_table("gold.imgs", df.schema).append(df, n_files=2)
    execute_sql(spark,
                "CREATE VIEW gold.big AS "
                "SELECT image_id, phash FROM gold_imgs WHERE phash >= 128",
                catalog=cat)
    assert cat.list_views() == ["gold.big"]
    n1 = execute_sql(spark, "SELECT COUNT(*) AS n FROM gold_big",
                     catalog=cat).collect()[0]["n"]
    assert n1 == df.filter("phash >= 128").count()
    # LAZY: new rows appended after view creation are visible —
    # the stored SQL re-plans against current table state
    extra = spark.createDataFrame([(1000, 200, "x"), (1001, 10, "y")],
                                  df.schema)
    cat.load_table("gold.imgs").append(extra, n_files=1)
    n2 = execute_sql(spark, "SELECT COUNT(*) AS n FROM gold_big",
                     catalog=cat).collect()[0]["n"]
    assert n2 == n1 + 1
    # SHOW / DROP
    rows = execute_sql(spark, "SHOW VIEWS", catalog=cat).collect()
    assert [(r["namespace"], r["viewName"]) for r in rows] == [
        ("gold", "big")]
    execute_sql(spark, "DROP VIEW gold.big", catalog=cat)
    assert cat.list_views() == []
    out = execute_sql(spark, "DROP VIEW IF EXISTS gold.big", catalog=cat)
    assert out["skipped"] is True


def test_view_over_view_and_replace_versions(spark, cat):
    from mobility_lakehouse_project_spark.sql import execute_sql

    df = _df(spark)
    cat.create_table("b.t", df.schema).append(df, n_files=1)
    cat.create_view("b.v1", "SELECT image_id, phash FROM b_t")
    cat.create_view("b.v2",
                    "SELECT COUNT(*) AS n FROM b_v1 WHERE phash < 50")
    # a read over the OUTER view transitively registers the inner one
    n = execute_sql(spark, "SELECT n FROM b_v2",
                    catalog=cat).collect()[0]["n"]
    assert n == df.filter("phash < 50").count()
    # replace keeps version history, current = last
    with pytest.raises(ValueError, match="already exists"):
        cat.create_view("b.v1", "SELECT image_id FROM b_t")
    cat.create_view("b.v1", "SELECT image_id, phash, caption FROM b_t",
                    replace=True)
    meta = cat.view_meta("b.v1")
    assert len(meta["versions"]) == 2
    assert cat.load_view("b.v1") == "SELECT image_id, phash, caption FROM b_t"
    # register_all registers tables then views (dependency fixpoint)
    names = cat.register_all(spark)
    assert set(names) >= {"b_t", "b_v1", "b_v2"}
    assert spark.sql("SELECT COUNT(*) AS n FROM b_v1").collect()[0]["n"] == 100


def test_view_name_kind_guards_and_bad_body(spark, cat):
    from mobility_lakehouse_project_spark.sql import (
        LakehouseSqlError,
        execute_sql,
    )

    df = _df(spark)
    cat.create_table("ns.t", df.schema).append(df, n_files=1)
    # a view cannot shadow a table, nor a table a view
    with pytest.raises(ValueError, match="is a table"):
        cat.create_view("ns.t", "SELECT 1")
    cat.create_view("ns.v", "SELECT image_id FROM ns_t")
    with pytest.raises(ValueError, match="is a view"):
        cat.create_table("ns.v", df.schema)
    # CREATE VIEW validates the body at definition time
    with pytest.raises(LakehouseSqlError, match="does not analyze"):
        execute_sql(spark,
                    "CREATE VIEW ns.bad AS SELECT nope FROM ns_t",
                    catalog=cat)
    assert not cat.view_exists("ns.bad")
