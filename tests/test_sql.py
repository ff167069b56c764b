"""SQL front-end: the reference's SQL-string entry point
(dags/Queries_dag.py:54-95, src/sql/*.sql) over the Spark engine —
reads delegate to spark.sql, writes/DDL/maintenance dispatch to the
native operators with auto-derived pruning hints."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.sql import (
    LakehouseSqlError,
    derive_hints,
    execute_sql,
    execute_sql_script,
)
from mobility_lakehouse_project_spark.tableformat import Catalog


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def _seed(spark, cat, n=50):
    df = spark.createDataFrame(
        [(i, (i * 37) % 97, f"cap{i}") for i in range(n)],
        "image_id long, phash long, caption string",
    )
    cat.create_table("silver.images", df.schema).append(df, n_files=4)
    return cat.load_table("silver.images")


def test_select_over_catalog_views_with_args(spark, cat):
    _seed(spark, cat)
    df = execute_sql(
        spark,
        "SELECT count(*) AS n FROM silver_images WHERE image_id < :k",
        catalog=cat, args={"k": 10})
    assert df.collect()[0]["n"] == 10


def test_select_over_tables_mapping(spark, cat):
    t = _seed(spark, cat)
    df = execute_sql(
        spark, "SELECT max(image_id) AS m FROM img", tables={"img": t})
    assert df.collect()[0]["m"] == 49


def test_string_literal_masking_keeps_keywords_inert(spark, cat):
    t = _seed(spark, cat)
    df = execute_sql(
        spark,
        "SELECT count(*) AS n FROM img WHERE caption != 'WHERE -- DELETE'",
        tables={"img": t})
    assert df.collect()[0]["n"] == 50


def test_insert_values_positional_and_column_list(spark, cat):
    t = _seed(spark, cat)
    out = execute_sql(
        spark, "INSERT INTO silver.images VALUES (100, 5, 'x')",
        catalog=cat)
    assert out["operation"] == "insert"
    out = execute_sql(
        spark,
        "INSERT INTO silver.images (image_id, caption) SELECT 200, 'y'",
        catalog=cat)
    rows = {r["image_id"]: r for r in t.scan(spark).collect()}
    assert len(rows) == 52 and rows[100]["phash"] == 5
    assert rows[200]["phash"] is None and rows[200]["caption"] == "y"


def test_insert_wrong_arity_rejected(spark, cat):
    _seed(spark, cat)
    with pytest.raises(LakehouseSqlError, match="positional"):
        execute_sql(spark, "INSERT INTO silver.images SELECT 1, 2",
                    catalog=cat)


def test_insert_overwrite_replaces_partition(spark, cat):
    df = spark.createDataFrame(
        [(i, i % 2, f"c{i}") for i in range(20)],
        "id long, p long, c string")
    cat.create_table("g.t", df.schema, partition_col="p").append(df)
    execute_sql(
        spark,
        "INSERT OVERWRITE g.t SELECT 999 AS id, 1 AS p, 'new' AS c",
        catalog=cat)
    got = cat.load_table("g.t").scan(spark)
    assert got.filter("p = 1").count() == 1
    assert got.filter("p = 0").count() == 10


def test_delete_where_and_derived_hints(spark, cat):
    t = _seed(spark, cat)
    out = execute_sql(
        spark, "DELETE FROM silver.images WHERE image_id < :k",
        catalog=cat, args={"k": 5})
    assert out["operation"] == "delete" and out["rows_deleted"] == 5
    assert t.scan(spark).count() == 45
    # hint derivation: conjuncts compile to int_ranges / point_eq
    ranges, eq = derive_hints(
        t, "phash = 5 AND image_id BETWEEN 3 AND 9 AND caption = 'a''b'")
    assert ranges == {"phash": (5, 5), "image_id": (3, 9),
                      "caption": ("a'b", "a'b")}
    assert eq == {"phash": 5, "caption": "a'b"}
    ranges, eq = derive_hints(t, "image_id IN (4, 8, 15)")
    assert ranges == {"image_id": (4, 15)}
    assert eq == {"image_id": [4, 8, 15]}
    # OR is not a conjunction: derivation disabled (over-approx rule)
    assert derive_hints(t, "phash = 5 OR image_id = 1") == ({}, {})
    # non-literal comparisons are ignored, literal flips are handled
    ranges, _ = derive_hints(t, "10 >= image_id AND phash = caption")
    assert ranges == {"image_id": (None, 10)}


def test_delete_mor_option(spark, cat):
    t = _seed(spark, cat)
    out = execute_sql(
        spark,
        "DELETE FROM silver.images WHERE phash > 50 OPTIONS(mode = 'mor')",
        catalog=cat)
    assert out["operation"] == "delete"
    assert t.scan(spark).filter("phash > 50").count() == 0


def test_delete_eq_mode_blind_key_erasure(spark, cat):
    """mode='eq': the key predicate becomes equality-delete files with
    ZERO table read; sequence scoping means a later re-insert of the
    same key survives (only prior versions die)."""
    t = _seed(spark, cat)
    out = execute_sql(
        spark,
        "DELETE FROM silver.images WHERE image_id IN (3, 5) "
        "OPTIONS(mode = 'eq')",
        catalog=cat)
    assert out["mode"] == "eq" and out["delete_keys"] == 2
    assert t.scan(spark).filter("image_id IN (3, 5)").count() == 0
    assert t.scan(spark).count() == 48
    execute_sql(spark,
                "INSERT INTO silver.images VALUES (3, 9, 'reborn')",
                catalog=cat)
    rows = t.scan(spark).filter("image_id = 3").collect()
    assert len(rows) == 1 and rows[0]["caption"] == "reborn"
    # cross-product of AND-ed equalities
    out = execute_sql(
        spark,
        "DELETE FROM silver.images WHERE image_id = 3 AND caption = "
        "'reborn' OPTIONS(mode='eq')",
        catalog=cat)
    assert out["delete_keys"] == 1 and out["cols"] == ["caption",
                                                       "image_id"]
    assert t.scan(spark).filter("image_id = 3").count() == 0
    with pytest.raises(LakehouseSqlError, match="key-equality"):
        execute_sql(
            spark,
            "DELETE FROM silver.images WHERE image_id < 5 "
            "OPTIONS(mode='eq')",
            catalog=cat)
    # a mistyped literal must NOT silently cast and delete a row the
    # SQL predicate does not match (2.5 -> 2 would erase image_id=2)
    with pytest.raises(LakehouseSqlError, match="does not match column"):
        execute_sql(
            spark,
            "DELETE FROM silver.images WHERE image_id = 2.5 "
            "OPTIONS(mode='eq')",
            catalog=cat)
    with pytest.raises(LakehouseSqlError, match="does not match column"):
        execute_sql(
            spark,
            "DELETE FROM silver.images WHERE image_id = 'abc' "
            "OPTIONS(mode='eq')",
            catalog=cat)
    assert t.scan(spark).filter("image_id = 2").count() == 1
    # duplicate IN values dedup; comments are inert; names fold case
    out = execute_sql(
        spark,
        "DELETE FROM silver.images WHERE Image_ID IN (10, 10) "
        "-- erase user\n OPTIONS(mode='eq')",
        catalog=cat)
    assert out["delete_keys"] == 1
    assert t.scan(spark).filter("image_id = 10").count() == 0
    # options that cannot apply to the blind path are rejected loudly
    with pytest.raises(LakehouseSqlError, match="no effect"):
        execute_sql(
            spark,
            "DELETE FROM silver.images WHERE image_id = 4 "
            "OPTIONS(mode='eq', chunk_files=10)",
            catalog=cat)


def test_delete_eq_mixed_numeric_in_list_on_double(spark, cat):
    """A mixed int/float IN list on a double column must execute (both
    are exact literals for a double key), not crash on DataFrame type
    inference merging LongType with DoubleType."""
    df = spark.createDataFrame(
        [(i, float(i) / 2) for i in range(10)],
        "image_id long, score double")
    cat.create_table("silver.scored", df.schema).append(df, n_files=1)
    t = cat.load_table("silver.scored")
    out = execute_sql(
        spark,
        "DELETE FROM silver.scored WHERE score IN (1, 2.5) "
        "OPTIONS(mode='eq')",
        catalog=cat)
    assert out["delete_keys"] == 2
    assert t.scan(spark).filter("score IN (1.0, 2.5)").count() == 0
    assert t.scan(spark).count() == 8


def test_update_with_expression(spark, cat):
    t = _seed(spark, cat)
    out = execute_sql(
        spark,
        "UPDATE silver.images SET caption = upper(caption), "
        "phash = phash + 1000 WHERE image_id < 3",
        catalog=cat)
    assert out["operation"] == "update"
    rows = {r["image_id"]: r for r in t.scan(spark).collect()}
    assert rows[0]["caption"] == "CAP0" and rows[0]["phash"] == 1000
    assert rows[3]["caption"] == "cap3"


def test_merge_upsert_cow_and_mor(spark, cat):
    t = _seed(spark, cat)
    sql = """
      MERGE INTO silver.images AS t
      USING (SELECT 1 AS image_id, 777 AS phash, 'upd' AS caption
             UNION ALL
             SELECT 1000, 1, 'new') AS s
      ON t.image_id = s.image_id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
    """
    out = execute_sql(spark, sql, catalog=cat)
    assert out["operation"] == "merge"
    rows = {r["image_id"]: r for r in t.scan(spark).collect()}
    assert len(rows) == 51
    assert rows[1]["caption"] == "upd" and rows[1000]["caption"] == "new"
    out = execute_sql(spark, sql + " OPTIONS(mode = 'mor')", catalog=cat)
    assert t.scan(spark).count() == 51  # idempotent upsert


def test_merge_matched_delete_and_subset_update(spark, cat):
    t = _seed(spark, cat)
    execute_sql(
        spark,
        "MERGE INTO silver.images USING "
        "(SELECT 5 AS image_id) s ON silver.images.image_id = s.image_id "
        "WHEN MATCHED THEN DELETE",
        catalog=cat)
    assert t.scan(spark).filter("image_id = 5").count() == 0
    execute_sql(
        spark,
        "MERGE INTO silver.images t USING "
        "(SELECT 6 AS image_id, 0 AS phash, 'z' AS caption) s "
        "ON t.image_id = s.image_id "
        "WHEN MATCHED THEN UPDATE SET t.caption = s.caption",
        catalog=cat)
    rows = {r["image_id"]: r for r in t.scan(spark).collect()}
    assert rows[6]["caption"] == "z"
    assert rows[6]["phash"] == (6 * 37) % 97  # subset update kept phash


def test_merge_rejects_conditional_when_and_theta_on(spark, cat):
    _seed(spark, cat)
    with pytest.raises(LakehouseSqlError, match="references the target"):
        execute_sql(
            spark,
            "MERGE INTO silver.images t USING (SELECT 1 AS image_id) s "
            "ON t.image_id = s.image_id "
            "WHEN MATCHED AND t.phash > 3 THEN DELETE",
            catalog=cat)
    with pytest.raises(LakehouseSqlError, match="conditional clause"):
        execute_sql(
            spark,
            "MERGE INTO silver.images t USING (SELECT 1 AS image_id) s "
            "ON t.image_id = s.image_id "
            "WHEN NOT MATCHED AND s.image_id > 3 THEN INSERT *",
            catalog=cat)
    with pytest.raises(LakehouseSqlError, match="equality"):
        execute_sql(
            spark,
            "MERGE INTO silver.images t USING (SELECT 1 AS image_id) s "
            "ON t.image_id < s.image_id WHEN MATCHED THEN DELETE",
            catalog=cat)


def test_ctas_partitioned_then_drop(spark, cat):
    _seed(spark, cat)
    out = execute_sql(
        spark,
        "CREATE TABLE silver.small PARTITIONED BY (phash) AS "
        "SELECT image_id, phash % 2 AS phash, caption "
        "FROM silver_images WHERE image_id < 10",
        catalog=cat)
    assert out["operation"] == "create_table"
    t = cat.load_table("silver.small")
    assert t.scan(spark).count() == 10
    out = execute_sql(
        spark, "CREATE TABLE IF NOT EXISTS silver.small AS SELECT 1 AS a",
        catalog=cat)
    assert out["skipped"] is True
    out = execute_sql(spark, "DROP TABLE silver.small PURGE", catalog=cat)
    assert out["operation"] == "drop_table"
    assert not cat.table_exists("silver.small")
    out = execute_sql(spark, "DROP TABLE IF EXISTS silver.small",
                      catalog=cat)
    assert out["skipped"] is True


def test_optimize_compact_and_zorder(spark, cat):
    t = _seed(spark, cat, n=200)
    out = execute_sql(spark, "OPTIMIZE silver.images", catalog=cat)
    assert out["operation"] == "optimize_compact"
    out = execute_sql(
        spark,
        "OPTIMIZE silver.images ZORDER BY (phash, image_id)",
        catalog=cat)
    assert out["operation"] == "optimize_cluster"
    assert t.scan(spark).count() == 200


def test_vacuum_and_call_procedures(spark, cat):
    t = _seed(spark, cat)
    execute_sql(spark, "OPTIMIZE silver.images", catalog=cat)
    out = execute_sql(
        spark, "CALL create_tag('silver.images', name => 'v1')",
        catalog=cat)
    assert out["operation"] == "call:create_tag"
    out = execute_sql(
        spark, "CALL expire_snapshots('silver.images', keep_last => 1)",
        catalog=cat)
    assert out["operation"] == "call:expire_snapshots"
    out = execute_sql(spark, "VACUUM silver.images RETAIN 0 HOURS",
                      catalog=cat)
    assert out["operation"] == "vacuum"
    assert t.scan(spark, ref="v1").count() == 50  # tag survives expiry
    with pytest.raises(LakehouseSqlError, match="unknown procedure"):
        execute_sql(spark, "CALL nuke('silver.images')", catalog=cat)
    out = execute_sql(
        spark,
        "CALL analyze('silver.images', columns => array('phash'))",
        catalog=cat)
    assert out["operation"] == "call:analyze"
    out = execute_sql(spark, "CALL truncate('silver.images')", catalog=cat)
    assert out["operation"] == "call:truncate"
    assert t.scan(spark).count() == 0


def test_alter_table_statements(spark, cat):
    t = _seed(spark, cat)
    out = execute_sql(
        spark,
        "ALTER TABLE silver.images SET TBLPROPERTIES "
        "('write.sort-order' = 'zorder(phash, image_id)')",
        catalog=cat)
    assert out["operation"] == "set_tblproperties"
    assert t.properties()["write.sort-order"] == "zorder(phash, image_id)"
    execute_sql(spark, "ALTER TABLE silver.images ADD COLUMNS (w int)",
                catalog=cat)
    execute_sql(spark,
                "ALTER TABLE silver.images ALTER COLUMN w TYPE bigint",
                catalog=cat)
    execute_sql(spark,
                "ALTER TABLE silver.images RENAME COLUMN w TO width",
                catalog=cat)
    assert dict(
        (f.name, f.dataType.typeName()) for f in t.schema().fields
    )["width"] == "long"
    execute_sql(spark, "ALTER TABLE silver.images DROP COLUMN width",
                catalog=cat)
    assert "width" not in [f.name for f in t.schema().fields]


def test_hints_reject_compound_and_mistyped_literals(spark, cat):
    """Review regressions: hint derivation must refuse anything whose
    pruning semantics could diverge from Spark's predicate — compound
    string expressions ('a' || 'b' is NOT the literal \"a' || 'b\"),
    numeric literals against string columns (Spark's = coerces,
    '012345' = 12345 is TRUE, but str-hash pruning would skip it),
    and unknown backslash escapes."""
    t = _seed(spark, cat)
    ranges, eq = derive_hints(t, "caption = 'a' || 'b'")
    assert eq == {} and ranges == {}
    ranges, eq = derive_hints(t, "caption = 12345")
    assert eq == {} and ranges == {}
    ranges, eq = derive_hints(t, "image_id = '7'")
    assert eq == {} and ranges == {}
    ranges, eq = derive_hints(t, r"caption = 'don\'t'")
    assert eq == {"caption": "don't"}
    ranges, eq = derive_hints(t, r"caption = '\x41'")  # unknown escape
    assert eq == {}
    # a backslash-escaped quote must not invert masking for the rest
    # of the statement (the OPTIONS clause would silently vanish)
    out = execute_sql(
        spark,
        r"DELETE FROM silver.images WHERE caption = 'don\'t' "
        "OPTIONS(mode = 'mor')",
        catalog=cat)
    assert out["operation"] == "delete" and out["rows_deleted"] == 0


def test_merge_duplicate_clause_rejected(spark, cat):
    _seed(spark, cat)
    with pytest.raises(LakehouseSqlError, match="duplicate WHEN MATCHED"):
        execute_sql(
            spark,
            "MERGE INTO silver.images t USING (SELECT 1 AS image_id) s "
            "ON t.image_id = s.image_id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN MATCHED THEN DELETE",
            catalog=cat)


def test_merge_by_source_only_with_keys_only_source(spark, cat):
    t = _seed(spark, cat)
    execute_sql(
        spark,
        "MERGE INTO silver.images t USING "
        "(SELECT image_id FROM silver_images WHERE image_id < 10) s "
        "ON t.image_id = s.image_id "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE OPTIONS(mode = 'mor')",
        catalog=cat)
    assert t.scan(spark).count() == 10  # full-sync prune to the keep-list


def test_insert_overwrite_table_keyword(spark, cat):
    t = _seed(spark, cat)
    execute_sql(
        spark,
        "INSERT INTO TABLE silver.images VALUES (500, 1, 'kw')",
        catalog=cat)
    assert t.scan(spark).filter("image_id = 500").count() == 1


def test_trailing_text_rejected(spark, cat):
    _seed(spark, cat)
    with pytest.raises(LakehouseSqlError, match="trailing text after ADD"):
        execute_sql(
            spark,
            "ALTER TABLE silver.images ADD COLUMNS (w int) COMMENT 'x'",
            catalog=cat)
    with pytest.raises(LakehouseSqlError, match="trailing text after Z"):
        execute_sql(
            spark,
            "OPTIMIZE silver.images ZORDER BY (phash) SHUFFLE",
            catalog=cat)


def test_reads_register_only_referenced_views(spark, cat):
    """A statement over a wide warehouse must not pay one scan-plan job
    per table: only views whose name appears in the statement text are
    registered."""
    df = spark.createDataFrame([(1, 2, "a")],
                               "image_id long, phash long, caption string")
    cat.create_table("regsel.used", df.schema).append(df)
    cat.create_table("regsel.unused", df.schema).append(df)
    n = execute_sql(spark, "SELECT count(*) AS n FROM regsel_used",
                    catalog=cat).collect()[0]["n"]
    assert n == 1
    assert not spark.catalog.tableExists("regsel_unused")


def test_show_describe_and_metadata_views(spark, cat):
    t = _seed(spark, cat)
    execute_sql(
        spark,
        "ALTER TABLE silver.images SET TBLPROPERTIES ('owner' = 'me')",
        catalog=cat)
    rows = execute_sql(spark, "SHOW TABLES", catalog=cat).collect()
    assert [(r["namespace"], r["tableName"]) for r in rows] == [
        ("silver", "images")]
    props = {r["key"]: r["value"] for r in execute_sql(
        spark, "SHOW TBLPROPERTIES silver.images", catalog=cat).collect()}
    assert props["owner"] == "me"
    parts = execute_sql(spark, "SHOW PARTITIONS silver.images",
                        catalog=cat)
    assert parts.count() >= 1
    desc = execute_sql(spark, "DESCRIBE EXTENDED silver.images",
                       catalog=cat).collect()
    names = [r["col_name"] for r in desc]
    assert names[:3] == ["image_id", "phash", "caption"]
    assert "# location" in names and "# property:owner" in names
    # inspection views register on demand when the statement names them
    n_snaps = execute_sql(
        spark,
        "SELECT count(*) AS n FROM silver_images_snapshots",
        catalog=cat).collect()[0]["n"]
    assert n_snaps >= 1  # the seed append's snapshot
    n = execute_sql(
        spark,
        "SELECT count(*) AS n FROM img_files",
        tables={"img": t}).collect()[0]["n"]
    assert n >= 1


def test_string_range_hints_prune_files(spark, cat):
    """String-stats range pruning end to end: a date-string retention
    DELETE through the SQL front-end must touch only the files whose
    [str_min, str_max] window overlaps the predicate's BETWEEN range —
    the reference's `fecha = ds` day-wise idiom, generalized."""
    df = spark.createDataFrame(
        [(i, f"2024-01-{1 + i // 25:02d}", f"c{i}") for i in range(250)],
        "id long, dt string, c string",
    )
    t = cat.create_table("ret.events", df.schema)
    # dt-sorted across 10 files: every file carries a tight dt window
    for day in range(10):
        t.append(df.filter(F.col("dt") == f"2024-01-{1 + day:02d}"),
                 n_files=1)
    ranges, eq = derive_hints(t, "dt BETWEEN '2024-01-03' AND '2024-01-04'")
    assert ranges == {"dt": ("2024-01-03", "2024-01-04")}
    ranges, _ = derive_hints(t, "dt >= '2024-01-08' AND dt < '2024-01-09'")
    assert ranges == {"dt": ("2024-01-08", "2024-01-09")}
    out = execute_sql(
        spark,
        "DELETE FROM ret.events "
        "WHERE dt BETWEEN '2024-01-03' AND '2024-01-04'",
        catalog=cat)
    assert out["rows_deleted"] == 50
    assert out["candidate_files"] < out["total_files"]
    assert t.scan(spark).count() == 200
    assert t.scan(spark).filter("dt = '2024-01-03'").count() == 0


def test_time_travel_read_syntax(spark, cat):
    t = _seed(spark, cat)  # 50 rows
    v1 = t.current_snapshot().snapshot_id
    t.create_tag("before_more")
    execute_sql(spark,
                "INSERT INTO silver.images VALUES (900, 1, 'late')",
                catalog=cat)
    ts_ms = t.current_snapshot().timestamp_ms
    q = "SELECT count(*) AS n FROM silver_images VERSION AS OF {}"
    assert execute_sql(spark, q.format(v1),
                       catalog=cat).collect()[0]["n"] == 50
    assert execute_sql(spark, q.format("'before_more'"),
                       catalog=cat).collect()[0]["n"] == 50
    n_now = execute_sql(
        spark,
        f"SELECT count(*) AS n FROM silver_images TIMESTAMP AS OF {ts_ms}",
        catalog=cat).collect()[0]["n"]
    assert n_now == 51
    # pinned and current views compose in one statement
    both = execute_sql(
        spark,
        f"SELECT (SELECT count(*) FROM silver_images) - "
        f"(SELECT count(*) FROM silver_images VERSION AS OF {v1}) AS d",
        catalog=cat).collect()[0]["d"]
    assert both == 1
    with pytest.raises(LakehouseSqlError, match="unknown table"):
        execute_sql(spark, "SELECT * FROM nope VERSION AS OF 1",
                    catalog=cat)
    # quoted epoch-ms (the documented form) resolves like the bare int
    assert execute_sql(
        spark,
        f"SELECT count(*) AS n FROM silver_images TIMESTAMP AS OF "
        f"'{ts_ms}'", catalog=cat).collect()[0]["n"] == 51
    # refs that sanitize identically must not collide in one statement
    t.create_tag("v-1")
    execute_sql(spark,
                "INSERT INTO silver.images VALUES (901, 1, 'x')",
                catalog=cat)
    t.create_tag("v_1")
    d = execute_sql(
        spark,
        "SELECT (SELECT count(*) FROM silver_images VERSION AS OF 'v_1')"
        " - (SELECT count(*) FROM silver_images VERSION AS OF 'v-1') "
        "AS d", catalog=cat).collect()[0]["d"]
    assert d == 1
    # time travel composes inside CTAS query fragments too
    execute_sql(
        spark,
        f"CREATE TABLE silver.backup AS SELECT * FROM silver_images "
        f"VERSION AS OF {v1}", catalog=cat)
    assert cat.load_table("silver.backup").scan(spark).count() == 50


def test_create_table_schema_and_truncate(spark, cat):
    out = execute_sql(
        spark,
        "CREATE TABLE feeds.raw (id BIGINT, dt STRING, payload BINARY) "
        "PARTITIONED BY (dt) OPTIONS('write.parquet.compression-codec' "
        "= 'uncompressed')",
        catalog=cat)
    assert out["operation"] == "create_table"
    t = cat.load_table("feeds.raw")
    assert [f.name for f in t.schema().fields] == ["id", "dt", "payload"]
    assert t.properties()["write.parquet.compression-codec"] == \
        "uncompressed"
    execute_sql(spark,
                "INSERT INTO feeds.raw SELECT 1, '2024-01-01', CAST(NULL "
                "AS BINARY)", catalog=cat)
    assert t.scan(spark).count() == 1
    out = execute_sql(spark, "TRUNCATE TABLE feeds.raw", catalog=cat)
    assert out["operation"] == "truncate"
    assert t.scan(spark).count() == 0
    # metadata-only: the full-file fast path rewrites nothing
    assert out.get("files_rewritten", 0) == 0
    with pytest.raises(LakehouseSqlError, match="not both"):
        execute_sql(spark,
                    "CREATE TABLE feeds.x (a INT) AS SELECT 1 AS a",
                    catalog=cat)


def test_oversized_string_stats_never_misprune(spark, cat, tmp_path):
    """parquet-cpp writes max=\"\" for a >4KB string value (an
    understated bound) and omits stats entirely when all values are
    oversized; a file imported via add_files must not let either shape
    into the manifest where a string-range DELETE would prune the file
    and silently keep the matching row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    big = "z" * 5000
    src = str(tmp_path / "foreign.parquet")
    pq.write_table(
        pa.table({"id": [1, 2, 3], "s": ["a", "b", big]}), src)
    t = cat.create_table(
        "imp.docs",
        spark.createDataFrame([], "id long, s string").schema)
    t.add_files(spark, src)
    entry = t.files(spark).collect()[0]
    assert entry["str_mins"].get("s") is None  # poisoned, not "b"
    out = execute_sql(
        spark, "DELETE FROM imp.docs WHERE s >= 'x'", catalog=cat)
    assert out["rows_deleted"] == 1  # the oversized row IS found
    assert t.scan(spark).count() == 2


def test_script_and_errors(spark, cat):
    _seed(spark, cat)
    results = execute_sql_script(
        spark,
        """
        DELETE FROM silver.images WHERE image_id = 0;
        -- a comment between statements; the next one is a read
        SELECT count(*) AS n FROM silver_images;
        """,
        catalog=cat)
    assert len(results) == 2
    assert results[0]["operation"] == "delete"
    assert results[1].collect()[0]["n"] == 49
    with pytest.raises(LakehouseSqlError, match="unbound SQL parameter"):
        execute_sql(spark, "SELECT :missing", catalog=cat)
    with pytest.raises(LakehouseSqlError, match="unsupported statement"):
        execute_sql(spark, "GRANT ALL TO me", catalog=cat)
    with pytest.raises(LakehouseSqlError, match="unsupported OPTIONS"):
        execute_sql(
            spark, "DELETE FROM silver.images WHERE true OPTIONS(bogus=1)",
            catalog=cat)


def test_updated_since_read_syntax(spark, cat):
    t = _seed(spark, cat)  # 50 rows at seq s1
    s1 = t.current_snapshot().sequence
    execute_sql(spark,
                "UPDATE silver.images SET caption = 'v2' "
                "WHERE image_id % 10 = 0", catalog=cat)
    execute_sql(spark,
                "INSERT INTO silver.images VALUES (900, 1, 'late')",
                catalog=cat)
    rows = execute_sql(
        spark,
        f"SELECT image_id, caption FROM silver_images UPDATED SINCE {s1} "
        "ORDER BY image_id", catalog=cat).collect()
    got = {r["image_id"]: r["caption"] for r in rows}
    assert got == {**{i: "v2" for i in range(0, 50, 10)}, 900: "late"}
    # head-sequence increment is empty; composes with aggregates
    head = t.current_snapshot().sequence
    n = execute_sql(
        spark,
        f"SELECT count(*) AS n FROM silver_images UPDATED SINCE {head}",
        catalog=cat).collect()[0]["n"]
    assert n == 0
    with pytest.raises(LakehouseSqlError, match="unknown table"):
        execute_sql(spark, "SELECT * FROM nope UPDATED SINCE 1",
                    catalog=cat)


# ---------------------------------------------------------------------------
# BEGIN TRANSACTION ... COMMIT (script-level multi-table atomicity)
# ---------------------------------------------------------------------------

def _mk_gold(spark, cat):
    df = spark.createDataFrame(
        [(0, 0)], "phash long, n long")
    cat.create_table("gold.stats", df.schema)


def test_sql_txn_commit_publishes_all(spark, cat):
    _seed(spark, cat)
    _mk_gold(spark, cat)
    results = execute_sql_script(
        spark,
        """
        BEGIN TRANSACTION;
        INSERT INTO silver.images VALUES (1000, 1, 'a'), (1001, 2, 'b');
        INSERT INTO gold.stats
            SELECT phash, count(*) AS n FROM silver_images GROUP BY phash;
        COMMIT;
        """,
        catalog=cat)
    ops = [r["operation"] for r in results]
    assert ops == ["begin", "insert_staged", "insert_staged", "commit"]
    assert set(results[-1]["snapshot_ids"]) == {
        "silver.images", "gold.stats"}
    assert cat.load_table("silver.images").scan(spark).count() == 52
    # the SELECT inside the txn read the PRE-txn snapshot (50 rows)
    assert cat.load_table("gold.stats").scan(spark).agg(
        F.sum("n")).collect()[0][0] == 50


def test_sql_txn_rollback_discards(spark, cat):
    _seed(spark, cat)
    results = execute_sql_script(
        spark,
        """
        BEGIN;
        INSERT INTO silver.images VALUES (1000, 1, 'a');
        ROLLBACK;
        """,
        catalog=cat)
    assert results[-1]["operation"] == "rollback"
    assert cat.load_table("silver.images").scan(spark).count() == 50


def test_sql_txn_failed_statement_aborts(spark, cat):
    _seed(spark, cat)
    with pytest.raises(LakehouseSqlError, match="only INSERT INTO"):
        execute_sql_script(
            spark,
            """
            BEGIN TRANSACTION;
            INSERT INTO silver.images VALUES (1000, 1, 'a');
            DELETE FROM silver.images WHERE image_id = 0;
            COMMIT;
            """,
            catalog=cat)
    assert cat.load_table("silver.images").scan(spark).count() == 50


def test_sql_txn_guards(spark, cat):
    t = _seed(spark, cat)
    with pytest.raises(LakehouseSqlError, match="no COMMIT"):
        execute_sql_script(
            spark,
            "BEGIN; INSERT INTO silver.images VALUES (1, 1, 'x');",
            catalog=cat)
    assert t.scan(spark).count() == 50
    with pytest.raises(LakehouseSqlError, match="nested"):
        execute_sql_script(spark, "BEGIN; BEGIN; COMMIT;", catalog=cat)
    with pytest.raises(LakehouseSqlError, match="outside BEGIN"):
        execute_sql_script(spark, "COMMIT;", catalog=cat)
    with pytest.raises(LakehouseSqlError, match="script-level"):
        execute_sql(spark, "BEGIN TRANSACTION", catalog=cat)
    with pytest.raises(LakehouseSqlError, match="not transactional"):
        execute_sql_script(
            spark,
            "BEGIN; INSERT OVERWRITE silver.images "
            "SELECT * FROM silver_images; COMMIT;",
            catalog=cat)
    with pytest.raises(LakehouseSqlError, match="catalog tables only"):
        execute_sql_script(
            spark,
            "BEGIN; INSERT INTO img VALUES (1, 1, 'x'); COMMIT;",
            catalog=cat, tables={"img": t})


def test_create_materialized_view_sql_lifecycle(spark, cat):
    _seed(spark, cat)
    out = execute_sql(
        spark,
        "CREATE MATERIALIZED VIEW gold.by_bucket AS "
        "SELECT phash % 10 AS bucket, count(*) AS n, "
        "       sum(image_id) AS sum_id, count(DISTINCT caption) AS nd "
        "FROM silver.images WHERE image_id < 40 GROUP BY phash % 10",
        catalog=cat)
    assert out["operation"] == "create_materialized_view"
    df = execute_sql(spark, "SELECT * FROM gold_by_bucket ORDER BY bucket",
                     catalog=cat)
    exp = execute_sql(
        spark,
        "SELECT phash % 10 AS bucket, count(*) AS n, sum(image_id) AS "
        "sum_id, count(DISTINCT caption) AS nd FROM silver_images "
        "WHERE image_id < 40 GROUP BY bucket ORDER BY bucket",
        catalog=cat)
    assert df.collect() == exp.collect()

    # source change + incremental refresh through SQL
    execute_sql(spark, "INSERT INTO silver.images VALUES (1000, 3, 'z')",
                catalog=cat)
    res = execute_sql(
        spark, "REFRESH MATERIALIZED VIEW gold.by_bucket INCREMENTAL",
        catalog=cat)
    assert res["mode"] == "incremental-merge"
    assert res["affected_groups"] == 1
    # 1000 is filtered by the WHERE — the group recomputes unchanged
    assert execute_sql(
        spark, "SELECT sum(n) AS tot FROM gold_by_bucket",
        catalog=cat).collect()[0]["tot"] == 40

    res = execute_sql(spark, "REFRESH MATERIALIZED VIEW gold.by_bucket",
                      catalog=cat)
    assert res["mode"] == "noop"

    # OR REPLACE swaps the definition
    execute_sql(
        spark,
        "CREATE OR REPLACE MATERIALIZED VIEW gold.by_bucket AS "
        "SELECT caption, count(*) AS n FROM silver.images GROUP BY caption",
        catalog=cat)
    assert "caption" in execute_sql(
        spark, "SELECT * FROM gold_by_bucket", catalog=cat).columns

    out = execute_sql(spark, "DROP MATERIALIZED VIEW gold.by_bucket",
                      catalog=cat)
    assert out["operation"] == "drop_materialized_view"
    assert not cat.table_exists("gold.by_bucket")
    out = execute_sql(
        spark, "DROP MATERIALIZED VIEW IF EXISTS gold.by_bucket",
        catalog=cat)
    assert out["skipped"] is True


def test_materialized_view_sql_guards(spark, cat):
    _seed(spark, cat)
    with pytest.raises(LakehouseSqlError, match="ONE catalog table"):
        execute_sql(
            spark,
            "CREATE MATERIALIZED VIEW g.x AS SELECT caption, count(*) AS n "
            "FROM (SELECT * FROM silver.images) GROUP BY caption",
            catalog=cat)
    with pytest.raises(LakehouseSqlError, match="cannot parse at"):
        execute_sql(
            spark,
            "CREATE MATERIALIZED VIEW g.x AS SELECT a.caption, count(*) AS n"
            " FROM silver.images a JOIN silver.images b GROUP BY a.caption",
            catalog=cat)
    with pytest.raises(LakehouseSqlError, match="needs an\n?.*AS alias"):
        execute_sql(
            spark,
            "CREATE MATERIALIZED VIEW g.x AS SELECT caption, count(*) "
            "FROM silver.images GROUP BY caption",
            catalog=cat)
    with pytest.raises(LakehouseSqlError, match="GROUP BY key"):
        execute_sql(
            spark,
            "CREATE MATERIALIZED VIEW g.x AS SELECT count(*) AS n "
            "FROM silver.images GROUP BY caption",
            catalog=cat)
    with pytest.raises(LakehouseSqlError, match="GROUP BY .* block"):
        execute_sql(
            spark,
            "CREATE MATERIALIZED VIEW g.x AS SELECT caption, count(*) AS n "
            "FROM silver.images",
            catalog=cat)
    # string literal containing keywords must stay inert in the parse
    execute_sql(
        spark,
        "CREATE MATERIALIZED VIEW g.ok AS SELECT caption, "
        "count_if(caption != 'JOIN GROUP BY') AS n "
        "FROM silver.images GROUP BY caption",
        catalog=cat)
    assert cat.table_exists("g.ok")
    # DROP MATERIALIZED VIEW refuses plain tables; DROP VIEW refuses MVs
    with pytest.raises(LakehouseSqlError, match="plain table"):
        execute_sql(spark, "DROP MATERIALIZED VIEW silver.images",
                    catalog=cat)
    with pytest.raises(LakehouseSqlError, match="no materialized view"):
        execute_sql(spark, "DROP MATERIALIZED VIEW g.ghost", catalog=cat)


def test_delete_rebase_retries_option(spark, cat):
    """OPTIONS(rebase_retries = 0) reaches the operator: with rebasing
    disabled a concurrent append in the plan-to-commit window surfaces
    (default: it would rebase — test_rebase_rowlevel.py)."""
    from mobility_lakehouse_project_spark.tableformat.table import (
        ConcurrentCommitError,
    )

    t = _seed(spark, cat)
    racer = spark.createDataFrame(
        [(1000 + i, i, f"r{i}") for i in range(5)],
        "image_id long, phash long, caption string")
    orig = t.write_data_files
    fired = {"n": 0}

    def wrapper(*a, **k):
        entries = orig(*a, **k)
        if fired["n"] == 0:
            fired["n"] = 1
            cat.load_table("silver.images").append(racer, n_files=1)
        return entries

    t.write_data_files = wrapper
    try:
        with pytest.raises(ConcurrentCommitError):
            execute_sql(
                spark,
                "DELETE FROM silver.images WHERE image_id < 10 "
                "OPTIONS(rebase_retries = 0)",
                catalog=cat, tables={"silver.images": t})
    finally:
        del t.write_data_files
    out = execute_sql(spark, "DELETE FROM silver.images WHERE image_id < 10",
                      catalog=cat, tables={"silver.images": t})
    assert out["rows_deleted"] == 10
    assert t.scan(spark).count() == 50 - 10 + 5


# ---------------------------------------------------------------------------
# IN (SELECT ...) subquery predicates in DELETE/UPDATE


def _seed_subq(spark, cat):
    df = spark.createDataFrame(
        [(i, i % 5, f"s{i % 3}") for i in range(100)],
        "k int, g int, s string")
    cat.create_table("sub.t", df.schema).append(df, n_files=4)
    keys = spark.createDataFrame([(1,), (2,), (3,), (None,)], "g int")
    cat.create_table("sub.keys", keys.schema).append(keys, n_files=1)
    return cat.load_table("sub.t")


def test_delete_in_subquery_literal_plan(spark, cat):
    t = _seed_subq(spark, cat)
    out = execute_sql(
        spark,
        "DELETE FROM sub.t WHERE k IN "
        "(SELECT g * 10 FROM sub_keys WHERE g IS NOT NULL)",
        catalog=cat)
    assert out["rows_deleted"] == 3  # k in (10, 20, 30)
    assert t.scan(spark).count() == 97
    # residual conjunct composes with the subquery conjunct
    out = execute_sql(
        spark,
        "DELETE FROM sub.t WHERE g IN (SELECT g FROM sub_keys WHERE g = 1)"
        " AND s = 's0'",
        catalog=cat)
    assert out["rows_deleted"] == 7  # g==1 AND s=='s0' survivors of step 1


def test_delete_not_in_subquery_ansi_null(spark, cat):
    t = _seed_subq(spark, cat)
    # NOT IN over a set containing NULL matches nothing (ANSI 3VL)
    out = execute_sql(
        spark, "DELETE FROM sub.t WHERE g NOT IN (SELECT g FROM sub_keys)",
        catalog=cat)
    assert out["rows_deleted"] == 0 and "short_circuit" in out
    assert t.scan(spark).count() == 100
    # without the NULL, the anti-set deletes g in {0, 4}
    out = execute_sql(
        spark,
        "DELETE FROM sub.t WHERE g NOT IN "
        "(SELECT g FROM sub_keys WHERE g IS NOT NULL)",
        catalog=cat)
    assert out["rows_deleted"] == 40
    assert t.scan(spark).count() == 60


def test_update_in_subquery(spark, cat):
    t = _seed_subq(spark, cat)
    out = execute_sql(
        spark,
        "UPDATE sub.t SET s = 'X' WHERE g IN "
        "(SELECT g FROM sub_keys WHERE g = 2)",
        catalog=cat)
    assert out["rows_updated"] == 20
    assert t.scan(spark).filter("s = 'X'").count() == 20


def test_delete_in_subquery_overflow_plans_merge(spark, cat):
    t = _seed_subq(spark, cat)
    out = execute_sql(
        spark,
        "DELETE FROM sub.t WHERE g IN "
        "(SELECT g FROM sub_keys WHERE g IS NOT NULL) "
        "OPTIONS(subquery_limit=1)",
        catalog=cat)
    assert out["planned_as"] == "semi-join-merge"
    assert t.scan(spark).count() == 40  # g in {1,2,3} gone
    # UPDATE and NOT IN cannot take the merge path: clear error
    with pytest.raises(LakehouseSqlError, match="subquery_limit"):
        execute_sql(
            spark,
            "UPDATE sub.t SET s='Y' WHERE g IN "
            "(SELECT g FROM sub_keys WHERE g IS NOT NULL) "
            "OPTIONS(subquery_limit=1)",
            catalog=cat)


def test_delete_in_subquery_eq_mode(spark, cat):
    t = _seed_subq(spark, cat)
    out = execute_sql(
        spark,
        "DELETE FROM sub.t WHERE k IN "
        "(SELECT CAST(g * 10 AS INT) FROM sub_keys WHERE g IS NOT NULL) "
        "OPTIONS(mode='eq')",
        catalog=cat)
    assert out["mode"] == "eq" and out["delete_keys"] == 3
    assert t.scan(spark).count() == 97
    # type agreement is enforced (no silent cast)
    with pytest.raises(LakehouseSqlError, match="type"):
        execute_sql(
            spark,
            "DELETE FROM sub.t WHERE k IN "
            "(SELECT CAST(g AS BIGINT) FROM sub_keys) OPTIONS(mode='eq')",
            catalog=cat)


def test_subquery_shape_guards(spark, cat):
    _seed_subq(spark, cat)
    with pytest.raises(LakehouseSqlError, match="OR"):
        execute_sql(
            spark,
            "DELETE FROM sub.t WHERE g IN (SELECT g FROM sub_keys) "
            "OR s = 's0'",
            catalog=cat)
    with pytest.raises(LakehouseSqlError, match="EXISTS"):
        execute_sql(
            spark,
            "DELETE FROM sub.t WHERE EXISTS (SELECT 1 FROM sub_keys)",
            catalog=cat)
    with pytest.raises(LakehouseSqlError, match="one column"):
        execute_sql(
            spark,
            "DELETE FROM sub.t WHERE g IN (SELECT g, g FROM sub_keys)",
            catalog=cat)
    with pytest.raises(LakehouseSqlError, match="at most one"):
        execute_sql(
            spark,
            "DELETE FROM sub.t WHERE g IN (SELECT g FROM sub_keys) AND "
            "k IN (SELECT g FROM sub_keys)",
            catalog=cat)


def test_empty_in_subquery_short_circuits(spark, cat):
    t = _seed_subq(spark, cat)
    out = execute_sql(
        spark,
        "DELETE FROM sub.t WHERE g IN (SELECT g FROM sub_keys WHERE g > 99)",
        catalog=cat)
    assert out["rows_deleted"] == 0 and "short_circuit" in out
    # NOT IN () is TRUE for every row
    out = execute_sql(
        spark,
        "DELETE FROM sub.t WHERE g NOT IN "
        "(SELECT g FROM sub_keys WHERE g > 99)",
        catalog=cat)
    assert out["rows_deleted"] == 100
    assert t.scan(spark).count() == 0


# ---------------------------------------------------------------------------
# [NOT] EXISTS decorrelation in DELETE/UPDATE (sql.py::_decorrelate_exists)


def _seed_exists(spark, cat):
    df = spark.createDataFrame(
        [(1, 10, "A"), (2, 20, "B"), (3, None, "A"), (4, 40, "C"),
         (5, 50, "B")], "k int, ck int, st string")
    cat.create_table("ex.t", df.schema).append(df, n_files=2)
    src = spark.createDataFrame(
        [(10, "x"), (40, "y"), (None, "z")], "sk int, tag string")
    cat.create_table("ex.s", src.schema).append(src, n_files=1)
    return cat.load_table("ex.t")


def test_delete_exists_decorrelates(spark, cat):
    t = _seed_exists(spark, cat)
    out = execute_sql(
        spark,
        "DELETE FROM ex.t WHERE EXISTS "
        "(SELECT 1 FROM ex_s WHERE ex_s.sk = t.ck)",
        catalog=cat)
    assert out["rows_deleted"] == 2  # ck in {10, 40}; NULL sk never matches
    assert sorted(r.k for r in t.scan(spark).collect()) == [2, 3, 5]


def test_delete_not_exists_matches_outer_nulls(spark, cat):
    t = _seed_exists(spark, cat)
    # NOT EXISTS deletes unmatched rows INCLUDING the NULL-ck row —
    # the exact ANSI difference from NOT IN (which would keep it, and
    # which short-circuits entirely on the NULL inner key)
    out = execute_sql(
        spark,
        "DELETE FROM ex.t WHERE NOT EXISTS "
        "(SELECT 1 FROM ex_s WHERE ex_s.sk = t.ck)",
        catalog=cat)
    assert out["rows_deleted"] == 3  # k=2 (20), k=3 (NULL), k=5 (50)
    assert sorted(r.k for r in t.scan(spark).collect()) == [1, 4]


def test_update_exists_with_inner_and_residual_conjuncts(spark, cat):
    t = _seed_exists(spark, cat)
    out = execute_sql(
        spark,
        "UPDATE ex.t SET ck = ck + 100 WHERE EXISTS "
        "(SELECT 1 FROM ex_s WHERE ex_s.sk = t.ck AND ex_s.tag = 'x') "
        "AND st = 'A'",
        catalog=cat)
    assert out["rows_updated"] == 1
    got = {r.k: r.ck for r in t.scan(spark).collect()}
    assert got == {1: 110, 2: 20, 3: None, 4: 40, 5: 50}


def test_exists_shape_guards(spark, cat):
    _seed_exists(spark, cat)
    cases = [
        # no WHERE at all (uncorrelated EXISTS is a constant)
        ("DELETE FROM ex.t WHERE EXISTS (SELECT 1 FROM ex_s)",
         "correlation equality"),
        # joins in FROM are out of scope
        ("DELETE FROM ex.t WHERE EXISTS "
         "(SELECT 1 FROM ex_s a JOIN ex_s b ON 1=1 WHERE a.sk = t.ck)",
         "one source"),
        # two correlation equalities
        ("DELETE FROM ex.t WHERE EXISTS "
         "(SELECT 1 FROM ex_s WHERE ex_s.sk = t.ck AND ex_s.sk = t.k)",
         "one correlation"),
        # correlation under OR
        ("DELETE FROM ex.t WHERE EXISTS "
         "(SELECT 1 FROM ex_s WHERE ex_s.sk = t.ck OR ex_s.tag = 'x')",
         "AND conjunction"),
        # outer reference inside a non-equality inner conjunct
        ("DELETE FROM ex.t WHERE EXISTS "
         "(SELECT 1 FROM ex_s WHERE ex_s.sk = t.ck AND t.st > 'A')",
         "not a correlation equality"),
    ]
    for q, msg in cases:
        with pytest.raises(LakehouseSqlError, match=msg):
            execute_sql(spark, q, catalog=cat)


def test_exists_empty_inner_set(spark, cat):
    t = _seed_exists(spark, cat)
    out = execute_sql(
        spark,
        "DELETE FROM ex.t WHERE EXISTS "
        "(SELECT 1 FROM ex_s WHERE ex_s.sk = t.ck AND ex_s.tag = 'none')",
        catalog=cat)
    assert out["rows_deleted"] == 0 and "short_circuit" in out
    # NOT EXISTS over an empty inner set is TRUE for every row
    out = execute_sql(
        spark,
        "DELETE FROM ex.t WHERE NOT EXISTS "
        "(SELECT 1 FROM ex_s WHERE ex_s.sk = t.ck AND ex_s.tag = 'none')",
        catalog=cat)
    assert out["rows_deleted"] == 5
    assert t.scan(spark).count() == 0


# ---------------------------------------------------------------------------
# CALL create_changelog_view (sql.py::_call_changelog_view)


def test_create_changelog_view_sql(spark, cat):
    df = spark.createDataFrame(
        [(i, "F" if i % 3 == 0 else "O") for i in range(30)],
        "k int, st string")
    t = cat.create_table("cdcv.t", df.schema)
    t.append(df, n_files=2)
    pin = t.current_snapshot().snapshot_id
    execute_sql(spark, "DELETE FROM cdcv.t WHERE st = 'F' OPTIONS(mode='mor')",
                catalog=cat)
    # default view name derives from the table directory
    out = execute_sql(spark, "CALL create_changelog_view('cdcv.t')",
                      catalog=cat)
    assert out["view"] == "t_changes"
    rows = {r["_change_type"]: r["n"] for r in spark.sql(
        "SELECT _change_type, COUNT(*) n FROM t_changes "
        "GROUP BY _change_type").collect()}
    assert rows == {"insert": 30, "delete": 10}
    # pinned from_snapshot_id scopes the feed to later commits only
    out = execute_sql(
        spark,
        f"CALL create_changelog_view('cdcv.t', name => 'late_changes', "
        f"from_snapshot_id => {pin})",
        catalog=cat)
    assert out["view"] == "late_changes"
    rows = {r["_change_type"]: r["n"] for r in spark.sql(
        "SELECT _change_type, COUNT(*) n FROM late_changes "
        "GROUP BY _change_type").collect()}
    assert rows == {"delete": 10}
    # the view is pinned: a later append does not leak into it
    t.append(spark.createDataFrame([(100, "O")], "k int, st string"))
    assert spark.sql("SELECT COUNT(*) n FROM t_changes").first().n == 40
    with pytest.raises(LakehouseSqlError, match="bad changelog view name"):
        execute_sql(spark,
                    "CALL create_changelog_view('cdcv.t', name => 'a b')",
                    catalog=cat)


# ---------------------------------------------------------------------------
# MERGE ... WHEN NOT MATCHED BY SOURCE THEN UPDATE SET


def test_merge_by_source_update_sql(spark, cat):
    df = spark.createDataFrame(
        [(i, f"old{i}", "live") for i in range(20)],
        "id long, val string, st string")
    t = cat.create_table("bs.t", df.schema)
    t.append(df, n_files=2)
    src = spark.createDataFrame(
        [(i,) for i in range(15)], "id long")
    src.createOrReplaceTempView("feed")
    out = execute_sql(
        spark,
        "MERGE INTO bs.t AS t USING (SELECT id FROM feed) AS s ON t.id = s.id "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.st = 'stale', "
        "t.val = concat(t.val, '!') OPTIONS(mode='mor')",
        catalog=cat)
    assert out["rows_out"] == 5
    rows = {r["id"]: (r["val"], r["st"]) for r in t.scan(spark).collect()}
    assert rows[3] == ("old3", "live")
    assert rows[17] == ("old17!", "stale")
    # guards: source references and duplicate assignments rejected
    with pytest.raises(LakehouseSqlError, match="cannot reference"):
        execute_sql(
            spark,
            "MERGE INTO bs.t AS t USING (SELECT id FROM feed) AS s "
            "ON t.id = s.id "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.st = s.id",
            catalog=cat)
    with pytest.raises(LakehouseSqlError, match="assigned twice"):
        execute_sql(
            spark,
            "MERGE INTO bs.t AS t USING (SELECT id FROM feed) AS s "
            "ON t.id = s.id "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET st = 'a', st = 'b'",
            catalog=cat)


def test_update_from_named_source(spark, cat):
    """Postgres join-update over a second catalog table, planned as a
    MERGE: matched rows take the source expression, unmatched target
    rows are untouched, unmatched source rows do nothing."""
    t = _seed(spark, cat)
    fixes = spark.createDataFrame(
        [(1, "fixed-one"), (3, "fixed-three"), (999, "no-target")],
        "image_id long, new_cap string")
    cat.create_table("silver.fixes", fixes.schema).append(fixes, n_files=1)
    out = execute_sql(
        spark,
        "UPDATE silver.images SET caption = upper(s.new_cap) "
        "FROM silver.fixes AS s WHERE silver.images.image_id = s.image_id",
        catalog=cat)
    assert out["operation"] == "update"
    rows = {r["image_id"]: r for r in t.scan(spark).collect()}
    assert len(rows) == 50  # no insert of the unmatched source row
    assert rows[1]["caption"] == "FIXED-ONE"
    assert rows[3]["caption"] == "FIXED-THREE"
    assert rows[2]["caption"] == "cap2"
    assert rows[1]["phash"] == 37  # unassigned columns keep their values


def test_update_from_subquery_with_source_filter(spark, cat):
    t = _seed(spark, cat)
    out = execute_sql(
        spark,
        "UPDATE silver.images SET phash = s.p2 FROM "
        "(SELECT image_id AS iid, phash * 2 AS p2, caption FROM silver_images) AS s "
        "WHERE image_id = s.iid AND s.caption = 'cap5'",
        catalog=cat)
    assert out["operation"] == "update"
    rows = {r["image_id"]: r for r in t.scan(spark).collect()}
    assert rows[5]["phash"] == ((5 * 37) % 97) * 2
    assert rows[6]["phash"] == (6 * 37) % 97


def test_update_from_dedupes_source_per_key(spark, cat):
    t = _seed(spark, cat)
    execute_sql(
        spark,
        "UPDATE silver.images SET caption = s.c FROM "
        "(SELECT 2 AS k, 'dup-a' AS c UNION ALL SELECT 2, 'dup-a') AS s "
        "WHERE silver.images.image_id = s.k",
        catalog=cat)
    rows = {r["image_id"]: r for r in t.scan(spark).collect()}
    assert len(rows) == 50 and rows[2]["caption"] == "dup-a"


def test_update_from_guards(spark, cat):
    _seed(spark, cat)
    with pytest.raises(LakehouseSqlError, match="key equality"):
        execute_sql(spark,
                    "UPDATE silver.images SET caption = s.c FROM "
                    "(SELECT 'x' AS c) AS s WHERE s.c = 'x'",
                    catalog=cat)
    with pytest.raises(LakehouseSqlError, match="references the target"):
        execute_sql(spark,
                    "UPDATE silver.images SET caption = concat(images.caption, s.c) "
                    "FROM (SELECT 1 AS k, 'x' AS c) AS s "
                    "WHERE silver.images.image_id = s.k",
                    catalog=cat)
    with pytest.raises(LakehouseSqlError, match="references the target"):
        execute_sql(spark,
                    "UPDATE silver.images SET caption = s.c "
                    "FROM (SELECT 1 AS k, 'x' AS c) AS s "
                    "WHERE silver.images.image_id = s.k AND images.phash > 10",
                    catalog=cat)
    with pytest.raises(LakehouseSqlError, match="join key"):
        execute_sql(spark,
                    "UPDATE silver.images SET image_id = s.k "
                    "FROM (SELECT 1 AS k) AS s "
                    "WHERE silver.images.image_id = s.k",
                    catalog=cat)
    with pytest.raises(LakehouseSqlError, match="needs an alias"):
        execute_sql(spark,
                    "UPDATE silver.images SET caption = c FROM "
                    "(SELECT 1 AS k, 'x' AS c) "
                    "WHERE silver.images.image_id = k",
                    catalog=cat)
