"""Post-maintenance verification gates.

Replays the reference's QA ladder (SURVEY.md §5 — row-count smoke,
null-integrity, orphan anti-join, conservation totals:
src/ingest_bronze.py:138-155, scripts/check_bronze.py:183-196,
src/process_silver.py:98-108) against the engine's own invariant set
(input_hint): after ANY maintenance rewrite,

  * per-partition row counts identical pre/post,
  * captions byte-identical per image_id,
  * decoded pixels identical (lossless) or PSNR >= 40 dB (lossy
    re-encode path),
  * zero nulls in key columns, zero duplicate image_ids.

"Pre" is read by snapshot time travel — the old snapshot's manifests
still resolve until expire_snapshots GCs them, so verification never
needs a saved copy of the data. The pixel gate decodes BOTH versions
inside one Arrow-batched pandas UDF (no per-row Python in the plan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import imagecodec
from ..tableformat import LakehouseTable

PSNR_GATE_DB = 40.0


@F.pandas_udf(T.DoubleType())
def psnr_pair(
    bytes_a: pd.Series, bytes_b: pd.Series,
    w: pd.Series, h: pd.Series,
    fmt_a: pd.Series, fmt_b: pd.Series,
) -> pd.Series:
    """PSNR between two encodings of the same image (inf -> 999.0)."""
    out = np.empty(len(bytes_a))
    for i in range(len(bytes_a)):
        pa_ = imagecodec.decode(bytes_a.iloc[i], int(w.iloc[i]), int(h.iloc[i]), fmt_a.iloc[i])
        pb_ = imagecodec.decode(bytes_b.iloc[i], int(w.iloc[i]), int(h.iloc[i]), fmt_b.iloc[i])
        v = imagecodec.psnr(pa_, pb_)
        out[i] = 999.0 if v == float("inf") else v
    return pd.Series(out)


def partition_counts(df: DataFrame, pcol: str) -> DataFrame:
    return df.groupBy(pcol).agg(F.count("*").alias("n"))


def verify_maintenance(
    table: LakehouseTable,
    spark: SparkSession,
    pre_snapshot_id: int,
    post_snapshot_id: int | None = None,
    key: str = "image_id",
    sample_fraction: float = 1.0,
) -> dict:
    """Full gate suite comparing two snapshots of the same logical data
    (i.e. after compact/cluster/rewrite-manifests — NOT after MERGE,
    which changes the data on purpose). Raises AssertionError with a
    gate name on failure; returns the gate report dict."""
    pre = table.scan(spark, snapshot_id=pre_snapshot_id)
    post = table.scan(spark, snapshot_id=post_snapshot_id)
    pcol = table._partition_col()
    if pcol is None:
        pcol = "_part"
        pre = pre.withColumn(pcol, F.lit(0))
        post = post.withColumn(pcol, F.lit(0))
    report: dict = {}

    # Gate 1: per-partition row counts conserved
    pc = partition_counts(pre, pcol).alias("a")
    qc = partition_counts(post, pcol).alias("b")
    diff = (
        pc.join(qc, F.col(f"a.{pcol}") == F.col(f"b.{pcol}"), "full_outer")
        .filter(
            F.col("a.n").isNull() | F.col("b.n").isNull() | (F.col("a.n") != F.col("b.n"))
        )
        .count()
    )
    report["partition_count_mismatches"] = diff
    assert diff == 0, "GATE partition-row-counts: mismatch"

    # Gate 2: zero nulls in key columns; zero duplicate keys
    nulls = post.filter(
        F.col(key).isNull() | F.col("caption").isNull() | F.col("bytes").isNull()
    ).count()
    report["null_violations"] = nulls
    assert nulls == 0, "GATE null-integrity: nulls in key columns"
    dups = post.groupBy(key).count().filter(F.col("count") > 1).count()
    report["duplicate_keys"] = dups
    assert dups == 0, "GATE unique-key: duplicate image_ids"

    # Gate 3: orphan check — every post row's key exists in pre (anti-join)
    orphans = post.select(key).join(pre.select(key), key, "left_anti").count()
    report["orphans"] = orphans
    assert orphans == 0, "GATE orphans: post rows missing from pre"

    # Gate 4: caption byte-equality + pixel PSNR, one join, Arrow-batched
    a = pre
    b = post
    if sample_fraction < 1.0:
        # deterministic sample: hash the key, no RNG
        keep = F.pmod(F.xxhash64(key), F.lit(10_000)) < int(sample_fraction * 10_000)
        a = a.filter(keep)
    j = (
        a.alias("a")
        .join(b.alias("b"), F.col(f"a.{key}") == F.col(f"b.{key}"), "inner")
        .select(
            F.col(f"a.{key}").alias(key),
            (F.col("a.caption") == F.col("b.caption")).alias("caption_ok"),
            psnr_pair(
                F.col("a.bytes"), F.col("b.bytes"),
                F.col("a.w"), F.col("a.h"),
                F.col("a.fmt"), F.col("b.fmt"),
            ).alias("psnr"),
        )
    )
    bad = j.filter(~F.col("caption_ok") | (F.col("psnr") < PSNR_GATE_DB)).count()
    report["payload_violations"] = bad
    assert bad == 0, "GATE payload: caption mismatch or PSNR < 40dB"
    report["ok"] = True
    return report
