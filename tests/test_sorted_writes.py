"""Write-time layout contract: a declared write.sort-order sorts every
append's files internally (tight row-group stats, better encoding),
and write.distribution-mode=range additionally range-clusters the
write so new files carry near-disjoint stat ranges FROM INGEST — the
Iceberg write.distribution-mode contract, no maintenance pass needed
before pruning works."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark import synth
from mobility_lakehouse_project_spark.tableformat import LakehouseTable


def _mk(spark, loc, props):
    df = synth.images_df(spark, 1500, partitions=8)
    t = LakehouseTable.create(loc, df.schema, partition_col="bucket",
                              properties=props)
    t.append(df, n_files=24)
    return t


def _kept_fraction(spark, t, lo, hi):
    tot = t.files(spark).count()
    kept = t.plan_files(spark, int_ranges={"phash": (lo, hi)}).count()
    return kept / max(tot, 1)


def test_range_distribution_prunes_from_ingest(spark, tmp_path):
    base = _mk(spark, str(tmp_path / "plain"), {})
    ranged = _mk(spark, str(tmp_path / "ranged"), {
        "write.sort-order": "sort(phash)",
        "write.distribution-mode": "range",
    })
    lo, hi = -2**62, -2**60  # a slice of the uniform phash domain
    f_plain = _kept_fraction(spark, base, lo, hi)
    f_ranged = _kept_fraction(spark, ranged, lo, hi)
    assert f_ranged < f_plain, (f_plain, f_ranged)
    assert f_ranged < 0.6
    # identical content either way
    a = base.scan(spark).agg(F.expr("bit_xor(phash)").alias("x")).collect()[0]
    b = ranged.scan(spark).agg(F.expr("bit_xor(phash)").alias("x")).collect()[0]
    assert a["x"] == b["x"]


def test_declared_sort_order_sorts_files_internally(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "sorted"), {
        "write.sort-order": "sort(phash)",
    })
    # every physical file is internally ordered by phash: the scan of
    # each file with a monotonically-increasing id never sees phash
    # decrease within the same input file
    df = (t.scan(spark)
          .withColumn("_f", F.col("_metadata.file_path"))
          .select("_f", "phash"))
    pdf = df.toPandas()
    for _, grp in pdf.groupby("_f"):
        vals = grp["phash"].to_numpy()
        assert (vals[:-1] <= vals[1:]).all()


def test_explicit_sort_cols_still_win(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "explicit"), {
        "write.sort-order": "sort(phash)",
    })
    # an explicit append sort override is honored (no exception, files
    # ordered by w), proving the property is only the default
    t.append(synth.images_df(spark, 200, id_offset=1500, partitions=2),
             n_files=2, sort_cols=["w"])
    assert t.scan(spark).count() == 1700
