"""URI-safe location handling (tableformat/paths.py): an s3a:// table
location must survive construction un-mangled and relativization must
be scheme-robust — the landmine a first S3 deployment would hit."""

from mobility_lakehouse_project_spark.tableformat import LakehouseTable
from mobility_lakehouse_project_spark.tableformat.paths import (
    join_path,
    normalize_location,
    relativize,
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


def test_join_and_normalize():
    assert join_path("s3a://b/t", "metadata", "v1.json") == "s3a://b/t/metadata/v1.json"
    assert normalize_location("s3a://b/t/") == "s3a://b/t"
    assert normalize_location("rel/dir").startswith("/")


def test_relativize_never_matches_mid_path_or_single_slash_scheme():
    # base appearing mid-path must NOT relativize
    assert relativize("/x/a/b/f.parquet", "/a/b") == "/x/a/b/f.parquet"
    # Spark's single-slash file:/abs form
    assert relativize("file:/wh/t/data/f.parquet", "/wh/t") == "data/f.parquet"
