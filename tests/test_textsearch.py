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


def test_incremental_refresh_parity(spark, tmp_path):
    """Append docs to the source table, refresh the index off the
    changelog, and require EXACT probe parity (scores, constants)
    with a full rebuild over the whole corpus."""
    from mobility_lakehouse_project_spark.tableformat import LakehouseTable

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
    )
    first = docs.filter(F.col("doc_id") % 5 != 0)
    rest = docs.filter(F.col("doc_id") % 5 == 0)
    src = LakehouseTable.create(str(tmp_path / "docs"), first.schema)
    src.append(first, n_files=4)
    idx = textsearch.build_postings_table(
        spark, None, str(tmp_path / "idx"), n_buckets=32, source=src)
    out = textsearch.refresh_postings_table(spark, idx, src)
    assert out["new_docs"] == 0 and "skipped" in out

    src.append(rest, n_files=2)
    out = textsearch.refresh_postings_table(spark, idx, src)
    assert out["new_docs"] == rest.count()
    assert out["postings_rows"] > 0

    full = textsearch.build_postings_table(
        spark, docs, str(tmp_path / "idx_full"), n_buckets=32)
    terms = list(relational._BM25_TERMS)
    got, _ = textsearch.keyword_topk(spark, idx, terms, k=20)
    want, _ = textsearch.keyword_topk(spark, full, terms, k=20)
    assert [tuple(r) for r in got.collect()] == \
        [tuple(r) for r in want.collect()]
    # corpus constants advanced exactly
    s_inc = textsearch._build_summary(idx)
    s_full = textsearch._build_summary(full)
    assert int(float(s_inc["n-docs"])) == int(float(s_full["n-docs"]))
    assert abs(float(s_inc["avgdl"]) - float(s_full["avgdl"])) < 1e-9

    # a second refresh with no source change is a no-op
    out = textsearch.refresh_postings_table(spark, idx, src)
    assert out["new_docs"] == 0


def test_incremental_refresh_guards(spark, tmp_path):
    from mobility_lakehouse_project_spark.operators.delete import delete_where
    from mobility_lakehouse_project_spark.tableformat import LakehouseTable

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text").limit(50)
    )
    src = LakehouseTable.create(str(tmp_path / "docs"), docs.schema)
    src.append(docs, n_files=2)
    # DataFrame-built index has no cursor -> clear error
    plain = textsearch.build_postings_table(
        spark, src.scan(spark), str(tmp_path / "plain"), n_buckets=8)
    with pytest.raises(ValueError, match="source-snapshot"):
        textsearch.refresh_postings_table(spark, plain, src)
    # a source delete poisons the changelog -> refresh refuses
    idx = textsearch.build_postings_table(
        spark, None, str(tmp_path / "idx"), n_buckets=8, source=src)
    delete_where(src, spark, F.col("doc_id") < 5, mode="mor")
    with pytest.raises(ValueError, match="append-only"):
        textsearch.refresh_postings_table(spark, idx, src)
