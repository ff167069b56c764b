"""Persisted inverted-index (postings) table: build, partition-pruned
probe, and scoring parity with the computed BM25 oracle query."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.operators import textsearch
from mobility_lakehouse_project_spark.plans import relational

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def postings(spark, tmp_path_factory):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
    )
    loc = str(tmp_path_factory.mktemp("ts") / "postings")
    t = textsearch.build_postings_table(spark, docs, loc, n_buckets=32)
    return t


def test_probe_prunes_partitions(spark, postings):
    topk, stats = textsearch.keyword_topk(
        spark, postings, ["table", "window"], k=10)
    assert topk.count() == 10
    assert stats["partitions_probed"] <= 2
    assert stats["pruned_fraction"] > 0.5  # k/N of the index touched
    assert stats["files_planned"] < stats["files_total"]


def test_parity_with_computed_bm25(spark, postings):
    """The persisted probe must score EXACTLY like the computed
    txt_bm25_rank query (same constants, same rounding)."""
    topk, _ = textsearch.keyword_topk(
        spark, postings, list(relational._BM25_TERMS), k=10)
    got = [(r["doc_id"], r["score"], r["n_terms"]) for r in topk.collect()]
    want = [(r["doc_id"], r["score"], r["n_terms"])
            for r in relational.txt_bm25_rank(spark, SF).collect()]
    assert got == want


def test_single_term_probe(spark, postings):
    topk, stats = textsearch.keyword_topk(spark, postings, ["customer"], k=5)
    rows = topk.collect()
    assert 0 < len(rows) <= 5
    assert all(r["n_terms"] == 1 for r in rows)
    assert stats["partitions_probed"] == 1
    # every hit really contains the term
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hit_ids = [r["doc_id"] for r in rows]
    assert (docs.filter(F.col("doc_id").isin(hit_ids))
            .filter(~F.col("text").contains("customer")).count() == 0)


def test_not_a_postings_table_refused(spark, tmp_table_dir):
    from mobility_lakehouse_project_spark import synth
    from mobility_lakehouse_project_spark.tableformat import LakehouseTable

    df = synth.images_df(spark, 10, partitions=1)
    t = LakehouseTable.create(tmp_table_dir, df.schema, partition_col="bucket")
    t.append(df, n_files=1)
    with pytest.raises(ValueError, match="postings"):
        textsearch.keyword_topk(spark, t, ["x"])
