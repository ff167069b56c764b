"""Persisted full-text search index — an inverted (postings) table in
the lakehouse format, partitioned by token bucket, probed with
partition-pruned scans.

The scale shape mirrors the persisted ANN tables
(`operators/similarity.py::build_lsh_clustered_table`): the expensive
structure (token -> (doc, tf) postings) is built ONCE as a clustered
lakehouse table whose partition key is the hidden `bucket[N]` transform
of the token, and every query resolves its terms' partitions through
the SAME Catalyst expression the writer used
(`LakehouseTable.partition_values_of` — xxhash64 has no stable Python
twin, so the probe asks Catalyst) and scans only those partitions. At
corpus scale a k-term query touches ~k/N of the index regardless of
corpus size; everything else — TF aggregation at build, BM25 scoring at
probe — is plain DataFrame algebra. Corpus-level constants (doc count,
average doc length) are pinned in the build commit summary so probe
scoring can never drift from the build.

Scoring is the same BM25 (k1=1.2, b=0.75) as the computed
`plans/relational.py::txt_bm25_rank` oracle query; parity between the
two forms is pinned by tests/test_textsearch.py.

(Reference analog: none — the reference greps with SQL LIKE,
dags/Queries_dag.py; a training-data pipeline needs corpus-scale
keyword lookup for curation and decontamination triage.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tableformat import LakehouseTable

BM25_K1 = 1.2
BM25_B = 0.75


def _postings(docs: DataFrame) -> DataFrame:
    toks = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    dlen = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    return (
        toks.groupBy("tok", "doc_id").agg(F.count("*").alias("tf"))
        .join(dlen, "doc_id")
        .select("tok", "doc_id", "tf", "dl")
    )


def build_postings_table(
    spark: SparkSession,
    docs: DataFrame | None,
    location: str,
    n_buckets: int = 64,
    source: LakehouseTable | None = None,
) -> LakehouseTable:
    """Build the inverted index as a `bucket[n_buckets]`-partitioned
    lakehouse table of (tok, doc_id, tf, dl). One explode+aggregate
    pass over the corpus, one partition-shaped write; corpus constants
    (doc count, TOTAL token count — the exact avgdl numerator — and the
    consumed source snapshot when ``source`` is a lakehouse table) ride
    the commit summary, which is what lets
    :func:`refresh_postings_table` later extend the index from the
    source changelog without a rebuild."""
    if source is not None:
        if docs is not None:
            raise ValueError("pass docs= or source=, not both")
        docs = source.scan(spark)
    post = _postings(docs)
    schema = T.StructType([
        T.StructField("tok", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.LongType()),
        T.StructField("dl", T.LongType()),
    ])
    t = LakehouseTable.create(
        location, schema, partition_col="tok",
        partition_transform=f"bucket[{n_buckets}]",
    )
    n_docs = docs.count()
    sum_dl = (
        docs.select(
            F.size(F.filter(F.split("text", " "),
                            lambda x: x != "")).alias("dl"))
        .agg(F.sum("dl")).first()[0]
    ) or 0
    summary = {"index": "postings", "n-docs": n_docs,
               "avgdl": sum_dl / max(n_docs, 1), "sum-dl": int(sum_dl),
               "n-buckets": n_buckets,
               "bm25-k1": BM25_K1, "bm25-b": BM25_B}
    if source is not None:
        cur = source.current_snapshot()
        summary["source-snapshot"] = cur.snapshot_id if cur else 0
    t.commit_append(
        t.write_data_files(post.select([f.name for f in schema.fields]),
                           n_files=min(n_buckets, 32)),
        summary=summary,
    )
    return t


def refresh_postings_table(
    spark: SparkSession,
    index: LakehouseTable,
    source: LakehouseTable,
) -> dict:
    """Extend the inverted index with the source's appends since the
    snapshot the index last consumed — O(new documents), never a
    corpus rebuild (the matview idiom, operators/matview.py, applied
    to the postings table).

    The source changelog between the recorded ``source-snapshot`` and
    the current head must be append-only (postings rows of a deleted
    or updated document cannot be retracted by appending; a changelog
    with delete/update events raises and the honest answer is a
    rebuild). New documents' postings are one explode+aggregate over
    ONLY the new rows, written into the same bucket partitions the
    build used; the BM25 corpus constants (n-docs, sum-dl -> avgdl)
    are advanced exactly in the refresh commit's summary, so a probe
    after the refresh scores identically to a probe over a full
    rebuild — pinned by tests/test_textsearch.py parity tests.

    Returns {"new_docs", "postings_rows", "n_docs", "avgdl",
    "snapshot"}; a no-change source returns {"new_docs": 0} without
    committing."""
    from ..streaming.changelog import changelog_df

    summ = _build_summary(index)
    if "source-snapshot" not in summ:
        raise ValueError(
            "postings index was built from a plain DataFrame (no "
            "source-snapshot cursor); rebuild with "
            "build_postings_table(source=<table>) to enable "
            "incremental refresh")
    cursor = int(float(summ["source-snapshot"]))
    cur = source.current_snapshot()
    if cur is None or cur.snapshot_id == cursor:
        return {"new_docs": 0, "postings_rows": 0, "skipped": "no change"}
    changes = changelog_df(source, spark,
                           from_snapshot_id=cursor or None)
    kinds = {r[0] for r in
             changes.select("_change_type").distinct().collect()}
    if kinds - {"insert"}:
        raise ValueError(
            f"source changelog since snapshot {cursor} contains "
            f"{sorted(kinds - {'insert'})} events — incremental "
            "postings refresh is append-only; rebuild the index")
    new_docs = changes.select("doc_id", "text")
    post = _postings(new_docs)
    n_new = new_docs.count()
    if n_new == 0:
        return {"new_docs": 0, "postings_rows": 0, "skipped": "no change"}
    sum_dl_new = (
        new_docs.select(
            F.size(F.filter(F.split("text", " "),
                            lambda x: x != "")).alias("dl"))
        .agg(F.sum("dl")).first()[0]
    ) or 0
    n_docs = int(float(summ["n-docs"])) + n_new
    # legacy build summaries carry avgdl only: reconstruct the exact
    # numerator from it (float avgdl * n is exact for the sizes the
    # legacy path wrote; new builds store the integer)
    prior_sum = summ.get(
        "sum-dl",
        round(float(summ["avgdl"]) * int(float(summ["n-docs"]))))
    sum_dl = int(float(prior_sum)) + int(sum_dl_new)
    entries = index.write_data_files(
        post.select("tok", "doc_id", "tf", "dl"),
        n_files=min(int(float(summ["n-buckets"])), 32))
    snap = index.commit_append(
        entries,
        summary={"index": "postings", "n-docs": n_docs,
                 "avgdl": sum_dl / max(n_docs, 1), "sum-dl": sum_dl,
                 "n-buckets": int(float(summ["n-buckets"])),
                 "bm25-k1": BM25_K1, "bm25-b": BM25_B,
                 "source-snapshot": cur.snapshot_id,
                 "refresh": "incremental"},
    )
    n_post = sum(e["record_count"] for e in entries)
    return {"new_docs": n_new, "postings_rows": n_post,
            "n_docs": n_docs, "avgdl": sum_dl / max(n_docs, 1),
            "snapshot": snap.snapshot_id}


def _build_summary(table: LakehouseTable) -> dict:
    for s in sorted(table.snapshots_list(), key=lambda s: s.sequence,
                    reverse=True):
        if s.summary.get("index") == "postings":
            return s.summary
    raise ValueError("not a postings table (no build summary found)")


def keyword_topk(
    spark: SparkSession,
    table: LakehouseTable,
    terms: list[str],
    k: int = 10,
) -> tuple[DataFrame, dict]:
    """BM25 top-k over the persisted index: resolve the terms' bucket
    partitions through the writer's own Catalyst transform, scan ONLY
    those partitions, score, rank. Returns (top-k DataFrame with
    columns (doc_id, score, n_terms), probe stats incl. the measured
    pruned_fraction)."""
    summ = _build_summary(table)
    n_docs, avgdl = float(summ["n-docs"]), float(summ["avgdl"])
    pids = set(table.partition_values_of(spark, list(terms)))
    total_files = table.files(spark).count()
    planned = table.plan_files(spark, partition_values=pids).count()
    post = (
        table.scan(spark, partition_values=pids)
        .filter(F.col("tok").isin(*terms))
    )
    df_ = post.groupBy("tok").agg(F.count("*").alias("df"))
    idf = df_.select(
        "tok",
        F.log((F.lit(n_docs) - F.col("df") + 0.5)
              / (F.col("df") + 0.5) + 1.0).alias("idf"),
    )
    topk = (
        post.join(F.broadcast(idf), "tok")
        .withColumn(
            "contrib",
            F.col("idf") * F.col("tf") * (BM25_K1 + 1.0)
            / (F.col("tf") + BM25_K1
               * (1.0 - BM25_B + BM25_B * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 4).alias("score"),
             F.count("*").alias("n_terms"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    stats = {
        "partitions_probed": len(pids),
        "files_planned": planned,
        "files_total": total_files,
        "pruned_fraction": round(1.0 - planned / max(total_files, 1), 4),
    }
    return topk, stats
