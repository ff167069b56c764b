"""URI-safe location handling (tableformat/paths.py): an s3a:// table
location must survive construction un-mangled and relativization must
be scheme-robust — the landmine a first S3 deployment would hit."""

from mobility_lakehouse_project_spark.tableformat import LakehouseTable
from mobility_lakehouse_project_spark.tableformat.paths import (
    join_path,
    normalize_location,
    relativize,
    relativize_reported,
)


def test_uri_location_not_mangled():
    t = LakehouseTable("s3a://bucket/warehouse/images/")
    assert t.location == "s3a://bucket/warehouse/images"
    assert t.meta_dir == "s3a://bucket/warehouse/images/metadata"
    assert t.data_dir == "s3a://bucket/warehouse/images/data"


def test_relativize_scheme_mismatches():
    # Spark's input_file_name reports file:// URIs for local tables
    assert relativize("file:///wh/t/data/f.parquet", "/wh/t") == "data/f.parquet"
    assert relativize("/wh/t/data/f.parquet", "/wh/t") == "data/f.parquet"
    assert relativize("s3a://b/t/data/f.parquet", "s3a://b/t") == "data/f.parquet"
    assert relativize("s3a://b/t/data/f.parquet", "s3a://b/t/") == "data/f.parquet"
    # not under base -> unchanged (caller decides)
    assert relativize("/elsewhere/f.parquet", "/wh/t") == "/elsewhere/f.parquet"
    # a path that merely CONTAINS the base name must not mis-relativize
    assert relativize("/wh/t2/data/f.parquet", "/wh/t") == "/wh/t2/data/f.parquet"


def test_relativize_reported_decodes_both_sides():
    """ADVICE r3: a location that ITSELF carries percent-encoding (a
    properly-encoded file: URI with a space) must still resolve the
    percent-encoded URIs input_file_name reports — both sides compare
    in decoded form."""
    rep = "file:///wh/uri%20tbl/data/f.parquet"
    assert relativize_reported(rep, "file:///wh/uri%20tbl") == "data/f.parquet"
    assert relativize_reported(rep, "file:///wh/uri tbl") == "data/f.parquet"
    assert relativize_reported(rep, "/wh/uri tbl") == "data/f.parquet"
    assert relativize_reported(
        "s3a://b/t%20x/data/f.parquet", "s3a://b/t%20x"
    ) == "data/f.parquet"


def test_join_and_normalize():
    assert join_path("s3a://b/t", "metadata", "v1.json") == "s3a://b/t/metadata/v1.json"
    assert normalize_location("s3a://b/t/") == "s3a://b/t"
    assert normalize_location("rel/dir").startswith("/")


def test_relativize_never_matches_mid_path_or_single_slash_scheme():
    # base appearing mid-path must NOT relativize
    assert relativize("/x/a/b/f.parquet", "/a/b") == "/x/a/b/f.parquet"
    # Spark's single-slash file:/abs form
    assert relativize("file:/wh/t/data/f.parquet", "/wh/t") == "data/f.parquet"


def test_file_scheme_location_end_to_end(spark, tmp_path):
    """VERDICT r2 #5: drive a full table lifecycle (create, append,
    compact, MERGE, scan) at a non-plain location — a ``file://`` URI
    with a percent-encodable character — proving relativize /
    input_file_name / to_local handling beyond unit level."""
    from pyspark.sql import functions as F

    from mobility_lakehouse_project_spark import synth
    from mobility_lakehouse_project_spark.operators import compaction, merge

    loc = f"file://{tmp_path}/uri tbl"
    df = synth.images_df(spark, 200, partitions=2)
    t = LakehouseTable.create(loc, df.schema, partition_col="bucket")
    assert t.location.startswith("file://")
    t.append(df, n_files=8)
    t.append(synth.images_df(spark, 200, id_offset=200, partitions=2), n_files=8)
    assert t.scan(spark).count() == 400
    m = compaction.compact(t, spark, target_file_size=1 << 20, n_chunks=1)
    assert m["files_in"] > m["files_out"] > 0
    # MERGE exercises input_file_name -> unquote -> relativize against
    # the URI base (percent-encoded space in every reported path)
    src = synth.images_df(spark, 20, seed=3).withColumn(
        "caption", F.lit("merged caption")
    )
    res = merge.merge_into(t, spark, src)
    assert res["files_rewritten"] > 0
    assert t.scan(spark).filter(F.col("caption") == "merged caption").count() == 20
    assert t.scan(spark).count() == 400


def test_csv_probe_uri_branch(spark, tmp_path):
    """The '://'-in-path probe branch of read_csv_stringly: URI globs
    skip the local existence probe and go straight to spark.read."""
    import gzip

    from mobility_lakehouse_project_spark.sources.csv_bronze import read_csv_stringly

    p = tmp_path / "day=1"
    p.mkdir()
    with gzip.open(p / "part.csv.gz", "wt") as f:
        f.write("a|b\n1|x\n2|y\n")
    # plain path, exists -> read
    df = read_csv_stringly(spark, str(p / "*.csv.gz"), ["a", "b"])
    assert df is not None and df.count() == 2
    # plain path, missing -> None (skip-day probe)
    assert read_csv_stringly(spark, str(tmp_path / "day=2" / "*.csv.gz"), ["a", "b"]) is None
    # URI path -> probe SKIPPED, handed to spark.read (which resolves it)
    df = read_csv_stringly(spark, f"file://{p}/*.csv.gz", ["a", "b"])
    assert df is not None and df.count() == 2
    rows = df.select("ingestion_file").distinct().collect()
    assert all("part.csv.gz" in r[0] for r in rows)
