"""SparkSession factory tuned for the engine.

The reference pins its engine config per environment (threads, memory
limit, spill dir — dags/Gold_Chunked_Dag.py:23-33); we centralize the
Spark equivalents here so every entry point (tests, bench, driver) gets
the same AQE/Arrow/shuffle posture.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mobility_lakehouse_project_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all cores. Shuffle
    partitions default to the core count — on a real cluster this is
    sized to ~2-3x total executor cores and then AQE coalesces; the
    principle (explicit sizing + AQE) is identical.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python Data Source (sources/lakehouse_source.py): let Catalyst
        # push WHERE conjuncts into the source's manifest/stats pruning
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Image rows carry a binary `bytes` column; cap Arrow batches so a
        # vectorized UDF batch of large rows stays well under executor memory.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # zstd + no dictionary: dictionary encoding attempts on unique
        # multi-KB image blobs burn CPU for zero ratio (measured 2x
        # slower writes); zstd outruns snappy on this payload.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.hadoop.parquet.enable.dictionary", "false")
        # Parquet page CRCs cost ~25x on UNCOMPRESSED blob pages
        # (measured, tools/profile_parquet_write.py: 1.3 GB flat write
        # 22.6 s with checksums vs 0.94 s without; the CRC runs over
        # the raw page buffer, so for incompressible image payloads it
        # is pure per-byte overhead). Spark never verifies page CRCs on
        # read by default; durability here rides on the FS + snapshot
        # commits, as in any object-store deployment.
        .config("spark.hadoop.parquet.page.write-checksum.enabled", "false")
        # Shuffle compression is pure overhead for this engine's large
        # shuffles: every corpus-sized exchange carries the already-
        # compressed image payload (guide §2.3 "no universal answer —
        # measure": tools/profile_scan_shuffle.py, 2.6 GB blob shuffle:
        # lz4 3.11 s / zstd 3.41 s / uncompressed 1.81 s). Metadata
        # shuffles are small either way. Holds at cluster scale for the
        # same reason — blob bytes stay incompressible on the wire;
        # override via SPARK_GRAFT_EXTRA_JSON for text-heavy loads.
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        # Blob-heavy tables: default 128MB scan splits + 4MB open cost
        # collapse a chunk of mid-size files into 2-3 tasks; size splits
        # so rewrites use the full core count.
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(32 * 1024 * 1024))
        # Dynamic-partition writes default to a sort-based writer (a
        # full per-task sort of blob rows, measured 3x slower); our
        # write tasks touch 1-2 partition dirs, so concurrent writers
        # never spill.
        .config("spark.sql.maxConcurrentOutputFileWriters", "40")
        # File listing: beyond 32 paths Spark launches a distributed
        # listing job (hundreds of near-empty tasks per table scan —
        # pure fixed cost on a local FS). List on the driver instead;
        # on real object stores this knob would stay low.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "100000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    # diagnostics hook (tools/stage_profile.py): JSON conf overrides via
    # env — lets a wrapper enable e.g. eventLog inside subprocess legs
    # without changing their code path
    env_json = os.environ.get("SPARK_GRAFT_EXTRA_JSON")
    if env_json:
        import json

        for k, v in json.loads(env_json).items():
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
