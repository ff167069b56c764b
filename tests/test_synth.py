"""Synth determinism + FIXTURES.md F1 distribution properties."""

from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth


def test_deterministic_across_partitionings(spark):
    a = synth.images_df(spark, 500, partitions=2).orderBy("image_id").collect()
    b = synth.images_df(spark, 500, partitions=7).orderBy("image_id").collect()
    assert a == b


def test_phash_hot_skew_present(spark):
    df = synth.images_df(spark, 4000, partitions=8)
    hot = df.filter(F.col("phash").isin(*synth.HOT_PHASHES)).count()
    assert 100 < hot < 400  # ~5% of 4000


def test_fmt_skew(spark):
    df = synth.images_df(spark, 2000, partitions=4)
    frac = df.filter(F.col("fmt") == "jpeg").count() / 2000
    assert 0.7 < frac < 0.9


def test_bytes_decode_matches_pixels(spark):
    import numpy as np

    from mobility_lakehouse_project_spark.functions import imagecodec as ic

    rows = synth.images_df(spark, 50, partitions=1).collect()
    for r in rows:
        px = ic.decode(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
        ref = ic.synth_pixels(int(r["image_id"][3:]), r["w"], r["h"])
        if r["fmt"] == "jpeg":
            assert ic.psnr(ref, px) >= 40.0
        else:
            assert np.array_equal(px, ref)


def test_merge_source_overlap(spark):
    base = synth.images_df(spark, 1000, partitions=2).select("image_id")
    src = synth.merge_source_df(spark, 1000, 200, overlap=0.1)
    overlap = src.join(base, "image_id", "left_semi").count()
    assert overlap == 20
    assert src.select("image_id").distinct().count() == 200
