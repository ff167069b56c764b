"""MERGE INTO variant semantics: insert-only, composite keys,
column-subset UPDATE, WHEN MATCHED DELETE — the reference's full MERGE
surface (dags/Bronze_Ingest_Dag.py:124-184)."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.operators import merge
from mobility_lakehouse_project_spark.tableformat import LakehouseTable

N = 800


@pytest.fixture()
def base_table(spark, tmp_table_dir):
    df = synth.images_df(spark, N, partitions=4)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=8)
    return t


def test_insert_only_merge_no_rewrite(spark, base_table):
    """WHEN NOT MATCHED INSERT only: existing rows byte-identical (no
    file is rewritten), new keys appended, duplicate keys ignored."""
    t = base_table
    pre_files = {r["file_path"] for r in t.files(spark).select("file_path").collect()}
    # source: 100 existing keys (would-be updates -> must be IGNORED)
    # + 150 brand-new keys
    src = synth.images_df(spark, 250, seed=99, partitions=2, id_offset=N - 100)
    res = merge.merge_into(t, spark, src, when_matched=None)
    assert res["files_rewritten"] == 0
    post_files = {r["file_path"] for r in t.files(spark).select("file_path").collect()}
    assert pre_files <= post_files  # nothing removed or rewritten
    assert t.scan(spark).count() == N + 150
    # the 100 overlapping keys kept their ORIGINAL captions
    orig = synth.images_df(spark, N, partitions=4).select("image_id", "caption")
    got = t.scan(spark, columns=["image_id", "caption"])
    diff = got.alias("g").join(orig.alias("o"), "image_id").filter(
        F.col("g.caption") != F.col("o.caption")
    ).count()
    assert diff == 0


def test_composite_key_merge(spark, tmp_table_dir):
    """ON t.fecha = s.fecha AND t.zona = s.zona (composite key) —
    matched rows updated, new composite keys inserted."""
    rows = [(f"2024-01-{d:02d}", z, float(d * 10 + z), "old")
            for d in range(1, 11) for z in range(5)]
    df = spark.createDataFrame(rows, "fecha string, zona int, total double, tag string")
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col=None)
    t.append(df, n_files=4)
    src = spark.createDataFrame(
        [("2024-01-01", 0, 999.0, "new"), ("2024-01-02", 3, 888.0, "new"),
         ("2024-01-31", 9, 777.0, "new")],
        "fecha string, zona int, total double, tag string",
    )
    res = merge.merge_into(t, spark, src, key=["fecha", "zona"], target_file_size=1 << 20)
    assert res["snapshot"] is not None
    got = {(r["fecha"], r["zona"]): (r["total"], r["tag"]) for r in t.scan(spark).collect()}
    assert len(got) == 51
    assert got[("2024-01-01", 0)] == (999.0, "new")
    assert got[("2024-01-02", 3)] == (888.0, "new")
    assert got[("2024-01-31", 9)] == (777.0, "new")
    assert got[("2024-01-05", 2)] == (52.0, "old")  # untouched


def test_column_subset_update(spark, base_table):
    """UPDATE SET caption = s.caption: only the listed column changes;
    bytes/phash keep the target's values even though the source
    carries different ones."""
    t = base_table
    pre = {r["image_id"]: (bytes(r["bytes"]), r["phash"])
           for r in t.scan(spark).filter(F.col("image_id") < "img000000000050").collect()}
    src = synth.images_df(spark, 50, seed=7, partitions=2)  # ids 0..49, new content
    res = merge.merge_into(
        t, spark, src, update_cols=["caption"], when_not_matched=None,
        target_file_size=1 << 20,
    )
    assert res["files_rewritten"] > 0
    post = {r["image_id"]: (bytes(r["bytes"]), r["phash"], r["caption"])
            for r in t.scan(spark).filter(F.col("image_id") < "img000000000050").collect()}
    src_caps = {r["image_id"]: r["caption"] for r in src.collect()}
    assert t.scan(spark).count() == N  # no inserts
    for iid, (b, p) in pre.items():
        assert post[iid][0] == b and post[iid][1] == p  # payload untouched
        assert post[iid][2] == src_caps[iid]            # caption updated


def test_when_matched_delete(spark, base_table):
    """WHEN MATCHED DELETE: matched keys removed; optionally inserts."""
    t = base_table
    src = synth.images_df(spark, 120, seed=5, partitions=2, id_offset=N - 100)
    res = merge.merge_into(t, spark, src, when_matched="delete", when_not_matched=None)
    assert res["files_rewritten"] > 0
    assert t.scan(spark).count() == N - 100
    remaining = {r["image_id"] for r in t.scan(spark, columns=["image_id"]).collect()}
    assert f"img{N-100:012d}" not in remaining
    assert f"img{N-101:012d}" in remaining


def test_merge_rejects_bad_args(spark, base_table):
    src = synth.images_df(spark, 10, partitions=1)
    with pytest.raises(ValueError):
        merge.merge_into(base_table, spark, src, when_matched="upsert")
    with pytest.raises(ValueError):
        merge.merge_into(base_table, spark, src, when_matched=None, when_not_matched=None)
    with pytest.raises(ValueError):
        merge.merge_into(base_table, spark, src, update_cols=["image_id"])


def test_insert_heavy_merge_splits_output_files(spark, base_table):
    """Insert-dominated upsert: output sizing must account for the
    insert volume, not only touched bytes."""
    t = base_table
    src = synth.images_df(spark, 2400, partitions=4, id_offset=N - 20)
    res = merge.merge_into(t, spark, src, target_file_size=512 * 1024)
    assert t.scan(spark).count() == N + 2380
    assert res["files_written"] >= 3


def test_merge_preserves_null_key_target_rows(spark, tmp_table_dir):
    """A target row whose merge key is NULL never joins (== is
    null-rejecting) but MUST survive a rewrite of its file untouched —
    classifying join sides by key nullity would null out every column."""
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (None, "nullkey", 30.0)],
        "id long, tag string, v double",
    )
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col=None)
    t.append(df, n_files=1)  # one file: the merge must rewrite it
    src = spark.createDataFrame([(1, "a2", 11.0)], "id long, tag string, v double")
    merge.merge_into(t, spark, src, key="id", target_file_size=1 << 20)
    rows = {r["tag"]: (r["id"], r["v"]) for r in t.scan(spark).collect()}
    assert rows["nullkey"] == (None, 30.0)  # preserved byte-for-byte
    assert rows["a2"] == (1, 11.0)
    assert rows["b"] == (2, 20.0)
    assert len(rows) == 3


def test_insert_only_sizing_uses_actual_insert_count(spark, tmp_table_dir):
    """Match-heavy insert-only merge must not fragment: 1 actual insert
    -> 1 new file, regardless of source size."""
    base = synth.images_df(spark, 400, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, base.schema, partition_col="bucket")
    t.append(base, n_files=4)
    # 400 duplicates + 1 genuinely new key, tiny target size
    src = synth.images_df(spark, 401, partitions=2)
    res = merge.merge_into(t, spark, src, when_matched=None,
                           target_file_size=8 * 1024)
    assert res["rows_out"] == 1
    assert res["files_written"] <= 2  # sized by n_new, not n_src


def test_rewrite_merge_conflict_surfaces_not_duplicates(spark, tmp_table_dir):
    """ADVICE r2: a concurrent append of a matching key into a partition
    OUTSIDE the merge's affected set must surface as
    ConcurrentCommitError (forcing a replan), never compose on retry
    into duplicate keys. The replanned merge then sees the key as
    MATCHED and updates in place — exactly one row survives."""
    from mobility_lakehouse_project_spark.tableformat.table import (
        ConcurrentCommitError,
    )

    df = synth.images_df(spark, 200, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    # source inserts brand-new key K into bucket 0
    src = synth.images_df(spark, 1, seed=7, id_offset=10_000).withColumn(
        "bucket", F.lit(0)
    )
    key = src.select("image_id").collect()[0][0]
    # racer: the SAME key K appended into bucket 1 between the merge's
    # planning scans and its commit
    racer = src.withColumn("bucket", F.lit(1)).withColumn(
        "caption", F.lit("racer caption")
    )
    orig = t.commit_replace
    fired = {"done": False}

    def racing_commit(*a, **k):
        if not fired["done"]:
            fired["done"] = True
            t.append(racer, n_files=1)
        return orig(*a, **k)

    t.commit_replace = racing_commit
    try:
        with pytest.raises(ConcurrentCommitError):
            merge.merge_into(t, spark, src)  # full upsert path
        # replan: re-run the merge against the advanced snapshot
        res = merge.merge_into(t, spark, src)
    finally:
        del t.commit_replace  # restore the bound method
    assert res["snapshot"] is not None
    rows = t.scan(spark).filter(F.col("image_id") == key)
    assert rows.count() == 1  # no duplicate key
    assert rows.select("caption").collect()[0][0] != "racer caption"  # updated
    assert t.scan(spark).count() == 201


def test_insert_only_merge_conflict_surfaces(spark, tmp_table_dir):
    """Same window for the insert-only fast path: a commit landing
    between the anti-join and the append fails the merge (the
    not-matched premise may have been broken)."""
    from mobility_lakehouse_project_spark.tableformat.table import (
        ConcurrentCommitError,
    )

    df = synth.images_df(spark, 100, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=2)
    src = synth.images_df(spark, 1, seed=9, id_offset=5_000)
    racer = src.withColumn("caption", F.lit("racer"))
    orig = t.commit_append
    fired = {"done": False}

    def racing_commit(*a, **k):
        if not fired["done"]:
            fired["done"] = True
            t.append(racer, n_files=1)
        return orig(*a, **k)

    t.commit_append = racing_commit
    try:
        with pytest.raises(ConcurrentCommitError):
            merge.merge_into(t, spark, src, when_matched=None)
    finally:
        del t.commit_append
    # replan: the racer's row is now matched -> ignored by insert-only
    res = merge.merge_into(t, spark, src, when_matched=None)
    assert res["files_written"] == 0
    assert t.scan(spark).filter(F.col("image_id") == src.collect()[0][0]).count() == 1


def test_merge_table_path_with_space(spark, tmp_path):
    """ADVICE r2: input_file_name() returns percent-encoded URIs; a
    table path containing a space must still resolve every touched file
    (before the unquote fix, matched rows were silently kept stale)."""
    loc = str(tmp_path / "my table dir" / "tbl")
    df = synth.images_df(spark, 120, partitions=2)
    t = LakehouseTable.create(loc, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    # update the captions of 20 existing keys
    src = synth.images_df(spark, 20, seed=123).withColumn(
        "caption", F.concat(F.lit("updated "), F.col("image_id"))
    )
    res = merge.merge_into(t, spark, src)
    assert res["files_rewritten"] > 0
    got = t.scan(spark).filter(F.col("caption").startswith("updated ")).count()
    assert got == 20
    assert t.scan(spark).count() == 120


def test_merge_bootstrap_race_surfaces(spark, tmp_table_dir):
    """ADVICE r3: a concurrent writer inserting keys between the
    empty-table check and the bootstrap commit must surface as
    ConcurrentCommitError (the bootstrap's premise — 'no rows exist' —
    is broken; composing via retry would create duplicate keys).
    Re-running merge_into replans as a real upsert."""
    from mobility_lakehouse_project_spark.tableformat.table import (
        ConcurrentCommitError,
    )

    df = synth.images_df(spark, 20)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    racer = synth.images_df(spark, 10, seed=5)  # ids overlap df's
    orig = t.write_data_files
    fired = {"done": False}

    def racing(*a, **k):
        entries = orig(*a, **k)
        if not fired["done"]:
            fired["done"] = True
            LakehouseTable(tmp_table_dir).append(racer, n_files=1)
        return entries

    t.write_data_files = racing
    try:
        with pytest.raises(ConcurrentCommitError):
            merge.merge_into(t, spark, df)
    finally:
        del t.write_data_files
    res = merge.merge_into(t, spark, df)  # replan: now a real upsert
    assert res["snapshot"] is not None
    got = t.scan(spark)
    assert got.count() == 20
    assert got.select("image_id").distinct().count() == 20  # no dup keys


def test_merge_schema_evolution_adds_column(spark, tmp_table_dir):
    """evolve_schema=True: a source-only column is added to the target;
    pre-existing untouched rows read NULL, matched rows pick up the
    source value, inserts carry it."""
    df = spark.createDataFrame(
        [(i, f"c{i}") for i in range(20)], "id long, caption string")
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col=None)
    t.append(df, n_files=2)
    src = spark.createDataFrame(
        [(5, "c5-new", "es"), (25, "c25", "en")],
        "id long, caption string, lang string")
    merge.merge_into(t, spark, src, key="id")  # no evolution: extra col dropped
    assert [f.name for f in t.schema().fields] == ["id", "caption"]
    res = merge.merge_into(t, spark, src, key="id", evolve_schema=True)
    assert res["snapshot"] is not None
    assert [f.name for f in t.schema().fields] == ["id", "caption", "lang"]
    got = {r["id"]: (r["caption"], r["lang"]) for r in t.scan(spark).collect()}
    assert got[5] == ("c5-new", "es")
    assert got[25] == ("c25", "en")
    assert got[3] == ("c3", None)  # untouched old file reads NULL
    assert len(got) == 21
    summ = t.current_snapshot().summary
    assert summ["schema-evolved"]["added"] == ["lang"]


def test_merge_schema_evolution_widens(spark, tmp_table_dir):
    """evolve_schema=True widens int->bigint when the source is wider;
    a NARROWER source type needs no schema change (write-side cast)."""
    df = spark.createDataFrame([(i, i * 10) for i in range(10)],
                               "id long, score int")
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col=None)
    t.append(df, n_files=1)
    src = spark.createDataFrame([(3, 5_000_000_000), (11, 7)],
                                "id long, score bigint")
    merge.merge_into(t, spark, src, key="id", evolve_schema=True)
    assert t.schema()["score"].dataType.simpleString() == "bigint"
    got = {r["id"]: r["score"] for r in t.scan(spark).collect()}
    assert got[3] == 5_000_000_000 and got[11] == 7 and got[0] == 0
    # narrower source (int into bigint): cast on write, schema unchanged
    src2 = spark.createDataFrame([(12, 42)], "id int, score int")
    merge.merge_into(t, spark, src2, key="id", evolve_schema=True)
    assert t.schema()["id"].dataType.simpleString() == "bigint"
    assert t.scan(spark).filter("id = 12").collect()[0]["score"] == 42


def test_append_conform_rejects_and_casts(spark, tmp_table_dir):
    """append() enforces the table schema: missing/extra columns raise;
    reordered columns and narrower types are normalized via ANSI cast."""
    df = spark.createDataFrame([(1, "a")], "id long, caption string")
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col=None)
    with pytest.raises(ValueError, match="missing"):
        t.append(spark.createDataFrame([(1,)], "id long"))
    with pytest.raises(ValueError, match="unexpected"):
        t.append(spark.createDataFrame([(1, "a", 2)],
                                       "id long, caption string, x int"))
    t.append(spark.createDataFrame([("b", 2)], "caption string, id int"))
    assert {(r["id"], r["caption"]) for r in t.scan(spark).collect()} == {(2, "b")}


def test_merge_evolution_case_variant_column_not_duplicated(spark, tmp_table_dir):
    """Spark resolves columns case-insensitively: a source 'Caption'
    against a target 'caption' is the same column, never a new one."""
    df = spark.createDataFrame([(1, "a")], "id long, caption string")
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col=None)
    t.append(df)
    src = spark.createDataFrame([(2, "b")], "id long, Caption string")
    merge.merge_into(t, spark, src, key="id", evolve_schema=True)
    assert [f.name for f in t.schema().fields] == ["id", "caption"]
    assert t.scan(spark).count() == 2


# ---------------- validated rebase (conflicting-append validation) ----


def _racing(t, fire):
    """Wrap t.write_data_files so `fire()` runs once after the merge's
    output is written — i.e. inside the plan-to-commit window."""
    orig = t.write_data_files
    state = {"done": False}

    def wrapper(*a, **k):
        entries = orig(*a, **k)
        if not state["done"]:
            state["done"] = True
            fire()
        return entries

    t.write_data_files = wrapper


def test_merge_rebases_over_disjoint_concurrent_append(spark, tmp_table_dir):
    """A concurrent append of keys DISJOINT from the merge source lands
    between plan and commit: the merge validates and REBASES — the blob
    rewrite is committed on the new parent in the same merge_into call
    (no replan), the appended rows survive untouched, and the history
    shows the merge's overwrite on top of the racer's append."""
    df = synth.images_df(spark, 120, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    racer = synth.images_df(spark, 15, id_offset=1000)  # disjoint keys

    def fire():
        LakehouseTable(tmp_table_dir).append(racer, n_files=1)

    _racing(t, fire)
    src = synth.images_df(spark, 20, seed=9).withColumn(
        "caption", F.concat(F.lit("updated "), F.col("image_id")))
    try:
        res = merge.merge_into(t, spark, src)
    finally:
        del t.write_data_files
    assert res["files_rewritten"] > 0
    got = t.scan(spark)
    assert got.count() == 120 + 15
    assert got.filter(F.col("caption").startswith("updated ")).count() == 20
    # racer rows intact (never part of the rewrite)
    racer_ids = {r["image_id"] for r in racer.select("image_id").collect()}
    kept = got.filter(got.image_id.isin(list(racer_ids))).count()
    assert kept == 15
    # history: head is the merge's overwrite, its parent the racer append
    snaps = t.snapshots_list()
    head = t.current_snapshot()
    assert head.operation == "overwrite"
    parent = {s.snapshot_id: s for s in snaps}[head.parent_id]
    assert parent.operation == "append"
    assert parent.summary.get("op") != "merge"


def test_merge_conflicting_concurrent_append_replans(spark, tmp_table_dir):
    """A concurrent append whose keys MATCH the merge source must still
    surface (rebasing would duplicate keys); re-running merge_into
    replans and converges with zero duplicate keys."""
    from mobility_lakehouse_project_spark.tableformat.table import (
        ConcurrentCommitError,
    )

    df = synth.images_df(spark, 120, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    # source: updates keys 110-119, inserts keys 120-139
    src = synth.images_df(spark, 30, seed=9, id_offset=110).withColumn(
        "caption", F.concat(F.lit("updated "), F.col("image_id")))
    racer = synth.images_df(spark, 5, seed=5, id_offset=130)  # inside src's insert range

    def fire():
        LakehouseTable(tmp_table_dir).append(racer, n_files=1)

    _racing(t, fire)
    try:
        with pytest.raises(ConcurrentCommitError):
            merge.merge_into(t, spark, src)
    finally:
        del t.write_data_files
    res = merge.merge_into(t, spark, src)  # replan sees racer rows as target
    assert res["snapshot"] is not None
    got = t.scan(spark)
    assert got.count() == 140  # keys 0-139, each exactly once
    assert got.select("image_id").distinct().count() == 140
    # racer's 5 keys were MATCHED on the replan -> carry source captions
    assert got.filter(F.col("caption").startswith("updated ")).count() == 30


def test_merge_insert_only_rebases(spark, tmp_table_dir):
    """Insert-only fast path: a disjoint concurrent append rebases the
    pinned commit_append instead of replanning."""
    df = synth.images_df(spark, 100, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    racer = synth.images_df(spark, 7, id_offset=5000)

    def fire():
        LakehouseTable(tmp_table_dir).append(racer, n_files=1)

    _racing(t, fire)
    src = synth.images_df(spark, 20, id_offset=200)
    try:
        res = merge.merge_into(t, spark, src, when_matched=None)
    finally:
        del t.write_data_files
    assert res["files_rewritten"] == 0
    assert t.scan(spark).count() == 100 + 7 + 20
    assert t.scan(spark).select("image_id").distinct().count() == 127


def test_merge_rebase_rejects_concurrent_maintenance(spark, tmp_table_dir):
    """A concurrent NON-append commit (row-level DELETE -> overwrite)
    is never rebased over: the plan's touched files may be gone."""
    from mobility_lakehouse_project_spark.operators import delete as del_op
    from mobility_lakehouse_project_spark.tableformat.table import (
        ConcurrentCommitError,
    )

    df = synth.images_df(spark, 120, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=4)

    def fire():
        del_op.delete_where(
            LakehouseTable(tmp_table_dir), spark,
            F.col("image_id") == "img000000000050")  # outside src's 0-19

    _racing(t, fire)
    src = synth.images_df(spark, 20, seed=9).withColumn(
        "caption", F.concat(F.lit("updated "), F.col("image_id")))
    try:
        with pytest.raises(ConcurrentCommitError):
            merge.merge_into(t, spark, src)
    finally:
        del t.write_data_files
    res = merge.merge_into(t, spark, src)  # replan converges
    assert res["snapshot"] is not None
    assert t.scan(spark).count() == 119


def test_merge_mor_rebases_over_disjoint_concurrent_append(
        spark, tmp_table_dir):
    """MOR upsert: the one-commit delete-files+append rebases over a
    disjoint concurrent append; deletes still hit exactly the matched
    positions and the racer's rows survive."""
    df = synth.images_df(spark, 100, partitions=2)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    racer = synth.images_df(spark, 9, id_offset=3000)

    def fire():
        LakehouseTable(tmp_table_dir).append(racer, n_files=1)

    _racing(t, fire)
    src = synth.images_df(spark, 10, seed=9).withColumn(
        "caption", F.concat(F.lit("updated "), F.col("image_id")))
    try:
        res = merge.merge_into(t, spark, src, mode="mor")
    finally:
        del t.write_data_files
    assert res["delete_files_written"] > 0
    got = t.scan(spark)
    assert got.count() == 100 + 9
    assert got.select("image_id").distinct().count() == 109
    assert got.filter(F.col("caption").startswith("updated ")).count() == 10


def test_insert_only_rebase_after_cas_loss_restamps_entries(
        spark, tmp_table_dir, monkeypatch):
    """The racer lands INSIDE the commit window (after the merge's
    commit_append stamped its entries and allocated row ids, before
    its CAS): the rebase re-invokes commit_append with the same entry
    dicts, which must restamp the snapshot id and re-allocate the
    first_row_id range — otherwise the files would carry a
    never-committed snapshot id (sequence resolves to 0: equality
    deletes misapply, incremental reads skip the rows) and row ids
    duplicated with the racer's allocation."""
    from mobility_lakehouse_project_spark.tableformat.table import (
        LakehouseTable as LT,
    )

    df = synth.images_df(spark, 100, partitions=2)
    t = LT.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    racer = synth.images_df(spark, 10, id_offset=7000)
    orig_commit = LT._commit
    state = {"raced": False}

    def racing_commit(self, base_meta, new_snapshot, expected_parent,
                      branch="main", **kw):
        if not state["raced"] and \
                new_snapshot.summary.get("op") == "merge-insert-only":
            state["raced"] = True
            LT(tmp_table_dir).append(racer, n_files=1)
        return orig_commit(self, base_meta, new_snapshot, expected_parent,
                           branch, **kw)

    monkeypatch.setattr(LT, "_commit", racing_commit)
    src = synth.images_df(spark, 20, id_offset=300)
    res = merge.merge_into(t, spark, src, when_matched=None)
    assert state["raced"]
    assert res["files_written"] > 0
    # every committed file's snapshot id is a real snapshot (no dead
    # stamp from the losing attempt)
    snap_ids = {s.snapshot_id for s in t.snapshots_list()}
    bad = [r for r in t.files(spark).select("added_snapshot_id").collect()
           if r[0] not in snap_ids]
    assert not bad, bad
    # row ids unique across the whole table (no range duplicated with
    # the racer's allocation)
    got = t.scan(spark, with_row_id=True)
    assert got.count() == 130
    assert got.select("_row_id").distinct().count() == 130


def test_mor_merge_rebase_after_cas_loss_restamps_entries(
        spark, tmp_table_dir, monkeypatch):
    """Same CAS-window race through commit_delete_files (MOR upsert):
    the rebase re-invocation must restamp delete+data entries and
    leave no orphan manifest from the losing attempt."""
    import os

    from mobility_lakehouse_project_spark.tableformat.table import (
        LakehouseTable as LT,
    )

    df = synth.images_df(spark, 100, partitions=2)
    t = LT.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=4)
    racer = synth.images_df(spark, 8, id_offset=8000)
    orig_commit = LT._commit
    state = {"raced": False}

    def racing_commit(self, base_meta, new_snapshot, expected_parent,
                      branch="main", **kw):
        if not state["raced"] and \
                new_snapshot.summary.get("op") == "merge-mor":
            state["raced"] = True
            LT(tmp_table_dir).append(racer, n_files=1)
        return orig_commit(self, base_meta, new_snapshot, expected_parent,
                           branch, **kw)

    monkeypatch.setattr(LT, "_commit", racing_commit)
    src = synth.images_df(spark, 10, seed=9).withColumn(
        "caption", F.concat(F.lit("updated "), F.col("image_id")))
    res = merge.merge_into(t, spark, src, mode="mor")
    assert state["raced"]
    assert res["delete_files_written"] > 0
    got = t.scan(spark)
    assert got.count() == 108
    assert got.filter(F.col("caption").startswith("updated ")).count() == 10
    snap_ids = {s.snapshot_id for s in t.snapshots_list()}
    bad = [r for r in t.files(spark).select("added_snapshot_id").collect()
           if r[0] not in snap_ids]
    assert not bad, bad
    # row ids unique table-wide
    rid = t.scan(spark, with_row_id=True)
    assert rid.select("_row_id").distinct().count() == 108
    # the losing attempt's manifests were removed (referenced set ==
    # on-disk set)
    referenced = set()
    for s in t.snapshots_list():
        referenced |= set(s.manifests) | set(s.delete_manifests)
    on_disk = {f for f in os.listdir(t.meta_dir)
               if f.startswith("manifest-")}
    assert on_disk <= referenced, sorted(on_disk - referenced)[:5]
