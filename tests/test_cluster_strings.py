"""String columns as cluster dims: the order-preserving 7-byte-prefix
int64 image (sfc.str_prefix_expr / str_prefix_int) lets Z-order and
Hilbert layouts include image_id / fmt / caption, and manifest
str_mins/str_maxs then prune string-range scans — the image_id point-
lookup and dt-retention-window shapes at 10^12 rows."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.functions import sfc
from mobility_lakehouse_project_spark.operators import clustering
from mobility_lakehouse_project_spark.tableformat import LakehouseTable


def test_str_prefix_twins_agree_and_preserve_order(spark):
    vals = ["", "a", "ab", "abcdefgh", "img000000000042", "img999999999999",
            "zz", "ábc", "abc\x00d", "abcdefg"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r["s"]: r["p"] for r in
           df.select("s", sfc.str_prefix_expr("s").alias("p")).collect()}
    for v in vals:
        assert got[v] == sfc.str_prefix_int(v), v
    # order preservation on the prefix image (ties allowed beyond 7 bytes)
    svals = sorted(vals)
    pvals = [sfc.str_prefix_int(v) for v in svals]
    assert pvals == sorted(pvals)
    # NULL maps to 0 (sorts first, like the empty string)
    assert df.select(sfc.str_prefix_expr("s").alias("p")).union(
        spark.createDataFrame([(None,)], "s string")
        .select(sfc.str_prefix_expr("s").alias("p"))
    ).filter(F.col("p").isNull()).count() == 0


@pytest.mark.parametrize("curve,cols", [
    ("zorder", ("image_id",)),
    ("zorder", ("phash", "image_id")),
    ("hilbert", ("image_id", "w")),
])
def test_cluster_with_string_dim_preserves_content(spark, tmp_table_dir, curve, cols):
    df = synth.images_df(spark, 600, partitions=4)
    t = LakehouseTable.create(tmp_table_dir + curve + cols[0],
                              df.schema, partition_col="bucket")
    t.append(df, n_files=8)
    def _chk():
        return t.scan(spark).agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(image_id, caption, fmt))").alias("h"),
            F.expr("bit_xor(phash)").alias("p")).collect()[0]

    chk = _chk()
    m = clustering.cluster(t, spark, curve=curve, cols=cols,
                           target_file_size=64 * 1024, n_chunks=1)
    assert m["files_in"] > 0
    chk2 = _chk()
    assert (chk["n"], chk["h"], chk["p"]) == (chk2["n"], chk2["h"], chk2["p"])


def test_cluster_by_image_id_improves_string_range_pruning(spark, tmp_table_dir):
    df = synth.images_df(spark, 3000, partitions=8)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=24)  # hash-scattered: every file spans most ids

    def frac(lo, hi):
        tot = t.files(spark).count()
        kept = t.plan_files(spark, int_ranges={"image_id": (lo, hi)}).count()
        return kept / max(tot, 1)

    lo, hi = "img000000000100", "img000000000399"  # 10% of ids
    pre = frac(lo, hi)
    clustering.cluster(t, spark, curve="zorder", cols=("image_id",),
                       target_file_size=12 * 1024, n_chunks=1)
    post = frac(lo, hi)
    assert post < pre, (pre, post)
    assert post < 0.55
    # exactness of the pruned scan
    n = (t.scan(spark, int_ranges={"image_id": (lo, hi)})
         .filter(F.col("image_id").between(lo, hi)).count())
    assert n == 300


def test_numpy_catalyst_prefix_round_trip_random(spark):
    rng = np.random.default_rng(7)
    vals = ["".join(chr(97 + c) for c in rng.integers(0, 26, size=k))
            for k in rng.integers(0, 12, size=50)]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select("s", sfc.str_prefix_expr("s").alias("p")).collect()
    for r in rows:
        assert r["p"] == sfc.str_prefix_int(r["s"])
