"""Similarity search over the embeddings table (array<float>).

 * brute-force cosine top-k — the exact baseline, fully JVM-side
   (zip_with/aggregate higher-order functions; oracle-checked as
   plans/relational.py ann_cosine_topk).
 * random-hyperplane LSH (Charikar 2002) — the scale path: H
   deterministic hyperplanes -> sign bits -> bucket key; queries probe
   only their bucket (and optionally neighboring buckets by flipping
   bits). Hyperplanes are derived from splitmix64 so every executor
   regenerates them identically — no fit/broadcast state.
 * IVF-style coarse quantizer — k centroids trained by a few Lloyd
   iterations expressed as DataFrame aggregations; vectors assigned to
   nearest centroid; queries probe nprobe cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    """Deterministic pseudo-gaussian hyperplanes via Box-Muller over
    splitmix64 streams (no RNG state; regenerable anywhere)."""
    n = dim * n_planes
    idx = np.arange(n, dtype=np.uint64) + np.uint64(seed * 1_000_003)
    z = idx + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    u1 = ((z >> np.uint64(11)).astype(np.float64) + 0.5) / float(1 << 53)
    z2 = z * np.uint64(0x9E3779B97F4A7C15)
    u2 = ((z2 >> np.uint64(11)).astype(np.float64) + 0.5) / float(1 << 53)
    g = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    return g.reshape(n_planes, dim)


def rademacher_signs(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    """+-1 hyperplanes (Rademacher projections — the 1-bit quantization
    of Achlioptas 2001 / Charikar 2002 sign-LSH). Derived from the same
    splitmix64 stream as _hyperplanes, so deterministic everywhere; the
    +-1 entries are exactly representable, which lets the identical
    plane matrix be embedded as literals in BOTH a Catalyst plan and an
    ANSI-SQL oracle (plans/relational.py ann_lsh_bucketed)."""
    return np.where(_hyperplanes(dim, n_planes, seed) > 0, 1.0, -1.0)


def rademacher_bucket_col(vec_col: str, signs: np.ndarray, quantize: bool = False):
    """Pure-Catalyst LSH bucket id: for each +-1 plane, a zip_with dot
    product (left-fold over the array — deterministic summation order)
    and a sign bit; bucket = sum(2^i * bit_i). No UDF: the whole
    expression stays inside whole-stage codegen.

    ``quantize`` rounds each element to an integer (x*1024) before the
    dot: integer sums in doubles are EXACT and order-independent, which
    is what lets a SQL oracle reproduce the bucket bit-for-bit
    (plans/relational.py ann_lsh_bucketed / ann_lsh_clustered)."""
    bits = []
    for i, plane in enumerate(signs):
        lit = F.array(*[F.lit(float(x)) for x in plane])
        if quantize:
            elem = lambda x, y: F.round(x.cast("double") * 1024) * y  # noqa: E731
        else:
            elem = lambda x, y: x.cast("double") * y  # noqa: E731
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit, elem),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        bits.append(F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def quantize_vec(vec) -> list[float]:
    """Driver-side twin of the ``quantize`` element transform:
    round-half-away-from-zero (Spark/DuckDB ROUND semantics, NOT
    Python's banker's rounding) of x*1024."""
    import math

    return [math.copysign(math.floor(abs(float(x)) * 1024 + 0.5), x) for x in vec]


def rademacher_bucket_of(vec, signs: np.ndarray) -> int:
    """Driver-side twin of rademacher_bucket_col for a single query
    vector — left-fold accumulation in element order so the double
    arithmetic is bit-identical to the Catalyst fold."""
    bucket = 0
    for i, plane in enumerate(signs):
        acc = 0.0
        for x, s in zip(vec, plane):
            acc = acc + float(x) * float(s)
        if acc > 0:
            bucket += 1 << i
    return bucket


def rademacher_margins_of(vec, signs: np.ndarray) -> list[float]:
    """Per-plane signed dot products of one query vector — left-fold in
    element order (bit-identical to the Catalyst fold). The bucket is
    the sign pattern; |margin| orders multi-probe bit flips."""
    out = []
    for plane in signs:
        acc = 0.0
        for x, s in zip(vec, plane):
            acc = acc + float(x) * float(s)
        out.append(acc)
    return out


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``df`` against one query vector — fully
    JVM-side (zip_with/aggregate higher-order functions, no UDF)."""
    q = np.array(query_vec, dtype=np.float64)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    dot = F.aggregate(
        F.zip_with(vec_col, qlit, lambda x, y: x.cast("double") * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm_v = F.sqrt(F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    qnorm = float(np.sqrt((q * q).sum()))
    sim = dot / (norm_v * F.lit(qnorm))
    return (
        df.select(F.col(id_col), F.round(sim, 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def build_lsh_clustered_table(
    spark: SparkSession,
    embeddings: DataFrame,
    location: str,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    n_files: int | None = None,
    quantize: bool = False,
):
    """Persist an embeddings DataFrame as a lakehouse table PARTITIONED
    by its LSH bucket — the scale path promised by ann_lsh_topk's
    docstring made physical: at 10^12 vectors the probe becomes a
    manifest-pruned scan of n_probes/2^n_planes of the files instead of
    a full scan + filter. The bucket column is pure Catalyst
    (rademacher_bucket_col — whole-stage codegen, no Python), and the
    probe recomputes the query's bucket driver-side from the same
    deterministic plane matrix."""
    from ..tableformat import LakehouseTable

    first = embeddings.select(vec_col).first()
    signs = rademacher_signs(len(first[0]), n_planes, seed)
    bucketed = embeddings.withColumn(
        "_bucket", rademacher_bucket_col(vec_col, signs, quantize).cast("int")
    )
    t = LakehouseTable.create(location, bucketed.schema, partition_col="_bucket")
    entries = t.write_data_files(
        bucketed,
        n_files=n_files or max(4, spark.sparkContext.defaultParallelism),
        salt_col=id_col,
    )
    t.commit_append(entries, summary={"lsh-planes": n_planes, "lsh-seed": seed,
                                      "lsh-quantized": int(quantize)})
    return t


def ann_lsh_topk_clustered(
    spark: SparkSession,
    table,
    query_vec: list[float],
    k: int = 10,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, dict]:
    """ANN probe against a bucket-clustered table: resolve the probe
    buckets driver-side, scan ONLY their partitions via manifest
    pruning, then exact-cosine the candidates. Returns (topk, stats)
    where stats reports the observable payoff: files scanned vs total.
    Plane count/seed come from the build commit's snapshot summary, so
    probe and build can never disagree on the bucket function."""
    summ = next(
        s.summary for s in reversed(table.snapshots_list())
        if "lsh-planes" in s.summary
    )
    n_planes, seed = int(summ["lsh-planes"]), int(summ["lsh-seed"])
    signs = rademacher_signs(len(query_vec), n_planes, seed)
    qv = quantize_vec(query_vec) if int(summ.get("lsh-quantized", 0)) else query_vec
    margins = rademacher_margins_of(qv, signs)
    qb = sum((1 << i) for i, m in enumerate(margins) if m > 0)
    probe = [qb]
    for i in np.argsort(np.abs(np.array(margins)))[: max(0, n_probes - 1)]:
        probe.append(qb ^ (1 << int(i)))
    pv = {str(b) for b in probe}
    total = table.size_stats(spark)["files"]
    scanned = table.plan_files(spark, partition_values=pv).count()
    topk = cosine_topk(
        table.scan(spark, partition_values=pv), query_vec, k, id_col, vec_col
    )
    return topk, {
        "total_files": total,
        "scanned_files": scanned,
        "pruned_fraction": 1.0 - scanned / max(total, 1),
        "probe_buckets": probe,
    }


def rademacher_probe_buckets_col(
    vec_col: str, signs: np.ndarray, n_probes: int = 1, quantize: bool = False
):
    """Pure-Catalyst ARRAY of probe buckets for one vector: its own
    sign-LSH bucket plus the (n_probes-1) Hamming-1 neighbors whose
    flipped plane has the smallest |margin| (Lv et al. multi-probe LSH,
    VLDB 2007) — array_sort over (|margin|, plane) structs picks the
    nearest decision boundaries, all inside whole-stage codegen. The
    scalar driver-side twin is rademacher_margins_of + the argsort in
    ann_lsh_topk_clustered."""
    dots = []
    for plane in signs:
        lit = F.array(*[F.lit(float(x)) for x in plane])
        if quantize:
            elem = lambda x, y: F.round(x.cast("double") * 1024) * y  # noqa: E731
        else:
            elem = lambda x, y: x.cast("double") * y  # noqa: E731
        dots.append(F.aggregate(
            F.zip_with(F.col(vec_col), lit, elem), F.lit(0.0),
            lambda acc, x: acc + x,
        ))
    bucket = None
    for i, d in enumerate(dots):
        b = F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = b if bucket is None else bucket + b
    if n_probes <= 1:
        return F.array(bucket)
    # the flip mask 1<<i rides the struct (array_sort orders by |margin|
    # then mask — identical tie-break to the driver twin's stable argsort)
    pairs = F.array(*[
        F.struct(F.abs(dots[i]).alias("m"), F.lit(1 << i).alias("f"))
        for i in range(len(dots))
    ])
    flips = F.slice(F.array_sort(pairs), 1, n_probes - 1)
    return F.concat(
        F.array(bucket),
        F.transform(flips, lambda s: bucket.bitwiseXOR(s["f"])),
    )


def ann_batch_topk_clustered(
    spark: SparkSession,
    table,
    queries: DataFrame,
    k: int = 3,
    n_probes: int = 1,
    qid_col: str = "qid",
    qvec_col: str = "qv",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, dict]:
    """BATCH ANN against a PERSISTED LSH-clustered table: every query
    vector's probe buckets come from the same pinned plane matrix the
    build used (commit summary), the table is scanned pruned to the
    UNION of probe partitions (manifest pruning — the only collected
    planning value is the distinct bucket set, bounded by 2^n_planes,
    never query vectors), and candidates meet queries in a bucket
    EQUI-JOIN with a per-query window rank. The many-query form of
    ann_lsh_topk_clustered: one pruned scan + one shuffle join for the
    whole batch, no per-query loop."""
    from pyspark.sql.window import Window

    summ = next(
        s.summary for s in reversed(table.snapshots_list())
        if "lsh-planes" in s.summary
    )
    n_planes, seed = int(summ["lsh-planes"]), int(summ["lsh-seed"])
    quant = bool(int(summ.get("lsh-quantized", 0)))
    first = queries.select(qvec_col).first()
    signs = rademacher_signs(len(first[0]), n_planes, seed)
    qx = queries.select(
        qid_col, qvec_col,
        F.explode(
            rademacher_probe_buckets_col(qvec_col, signs, n_probes, quant)
        ).alias("_bucket"),
    )
    buckets = {str(r["_bucket"]) for r in qx.select("_bucket").distinct().collect()}
    total = table.size_stats(spark)["files"]
    scanned = table.plan_files(spark, partition_values=buckets).count()
    cand = table.scan(spark, partition_values=buckets)
    joined = cand.join(F.broadcast(qx), "_bucket")
    dot = F.aggregate(
        F.zip_with(vec_col, qvec_col, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    sim = dot / (norm(F.col(vec_col)) * norm(F.col(qvec_col)))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos_sim"), id_col)
    topk = (
        joined.select(qid_col, id_col, F.round(sim, 4).alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
    return topk, {
        "total_files": total,
        "scanned_files": scanned,
        "pruned_fraction": 1.0 - scanned / max(total, 1),
        "probe_buckets": len(buckets),
    }


def ivf_cell_col(vec_col: str, cents: np.ndarray, quantize: bool = True):
    """Pure-Catalyst IVF cell id for a FIXED +-1 quantizer: argmax of
    the integer dot products (all centroids equal-norm, so argmax dot ==
    argmin L2). ``quantize`` rounds elements to ints (x*1024) so the
    double sums are exact and order-independent — the same bit-portable
    form as plans/relational.py::ann_ivf_probe."""
    dots = []
    for c in cents:
        lit = F.array(*[F.lit(float(s)) for s in c])
        if quantize:
            elem = lambda x, y: F.round(x.cast("double") * 1024) * y  # noqa: E731
        else:
            elem = lambda x, y: x.cast("double") * y  # noqa: E731
        dots.append(F.aggregate(
            F.zip_with(F.col(vec_col), lit, elem), F.lit(0.0),
            lambda acc, x: acc + x,
        ))
    best = F.greatest(*dots)
    expr = F.when(dots[0] == best, 0)
    for i in range(1, len(dots)):
        expr = expr.when(dots[i] == best, i)  # ties -> lowest index
    return expr


def ivf_cells_of(vec, cents: np.ndarray, nprobe: int, quantize: bool = True) -> list[int]:
    """Driver-side twin: the query's ``nprobe`` best cells by exact
    integer dots, ties by index (same order as the Catalyst CASE)."""
    q = quantize_vec(vec) if quantize else [float(x) for x in vec]
    dots = [sum(a * float(b) for a, b in zip(q, c)) for c in cents]
    order = sorted(range(len(cents)), key=lambda i: (-dots[i], i))
    return order[:nprobe]


def ivf_trained_cell_col(vec_col: str, cq: np.ndarray):
    """Pure-Catalyst argmin-L2 cell for TRAINED (unequal-norm)
    centroids on the exact-integer grid: with v' = round(v*1024) and
    integer-grid centroids c_i, argmin ||v'-c_i||^2 == argmax
    (v'.c_i - |c_i|^2/2). The dot is an exact integer sum in doubles
    (order-independent), the bias a baked literal — so the driver twin
    (ivf_trained_cells_of) reproduces the assignment bit-for-bit.
    Ties resolve to the lowest cell index (CASE order)."""
    scores = []
    for c in cq:
        lit = F.array(*[F.lit(float(s)) for s in c])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit,
                       lambda x, y: F.round(x.cast("double") * 1024) * y),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        scores.append(dot - F.lit(float((c * c).sum()) / 2.0))
    best = F.greatest(*scores)
    expr = F.when(scores[0] == best, 0)
    for i in range(1, len(scores)):
        expr = expr.when(scores[i] == best, i)
    return expr


def ivf_trained_cells_of(vec, cq: np.ndarray, nprobe: int) -> list[int]:
    """Driver-side twin of ivf_trained_cell_col: the query's ``nprobe``
    best cells by exact integer dots minus the half-squared-norm bias,
    ties by index."""
    q = quantize_vec(vec)
    scores = [
        sum(a * float(b) for a, b in zip(q, c)) - float((c * c).sum()) / 2.0
        for c in cq
    ]
    order = sorted(range(len(cq)), key=lambda i: (-scores[i], i))
    return order[:nprobe]


def quantize_centroids(centroids: np.ndarray) -> np.ndarray:
    """Snap trained centroids onto the exact-integer grid (x*1024,
    round-half-away like quantize_vec) so cell assignment is
    bit-portable between build, probe, and any SQL twin."""
    c = np.asarray(centroids, dtype=np.float64) * 1024.0
    return np.copysign(np.floor(np.abs(c) + 0.5), c)


def build_ivf_clustered_table(
    spark: SparkSession,
    embeddings: DataFrame,
    location: str,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 23,
    n_files: int | None = None,
    centroids: np.ndarray | None = None,
):
    """Persist embeddings PARTITIONED by IVF cell — the coarse-quantizer
    twin of build_lsh_clustered_table: a probe reads nprobe/n_cells of
    the files via manifest partition pruning instead of assigning every
    row at query time.

    ``centroids=None`` uses the fixed deterministic +-1 quantizer
    (data-oblivious; the SQL-oracle-reproducible form). Pass
    ``ivf_train_centroids(...)`` output to cluster by DATA-DERIVED
    cells instead — the quantized centroids are pinned in the commit
    summary (like the fixed quantizer's params), so the probe can never
    disagree with the build. Reference analog: the data-derived zone
    hierarchy built before clustering queries on it
    (/root/reference/src/sql/silver.sql:85-89)."""
    import json

    from ..tableformat import LakehouseTable

    first = embeddings.select(vec_col).first()
    if centroids is None:
        cents = rademacher_signs(len(first[0]), n_cells, seed)
        cell_expr = ivf_cell_col(vec_col, cents)
        summary = {"ivf-cells": n_cells, "ivf-seed": seed}
    else:
        cq = quantize_centroids(centroids)
        cell_expr = ivf_trained_cell_col(vec_col, cq)
        summary = {"ivf-cells": len(cq),
                   "ivf-centroids": json.dumps(cq.astype(int).tolist())}
    celled = embeddings.withColumn("_cell", cell_expr.cast("int"))
    t = LakehouseTable.create(location, celled.schema, partition_col="_cell")
    entries = t.write_data_files(
        celled,
        n_files=n_files or max(4, spark.sparkContext.defaultParallelism),
        salt_col=id_col,
    )
    t.commit_append(entries, summary=summary)
    return t


def ann_ivf_topk_clustered(
    spark: SparkSession,
    table,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, dict]:
    """IVF probe against a cell-partitioned table: resolve the query's
    nprobe cells driver-side (exact integer dots against the same
    quantizer the build used — fixed-quantizer params OR pinned trained
    centroids from the build commit's summary), scan only those
    partitions, exact-cosine the candidates."""
    import json

    summ = next(
        s.summary for s in reversed(table.snapshots_list())
        if "ivf-cells" in s.summary
    )
    if "ivf-centroids" in summ:
        cq = np.array(json.loads(summ["ivf-centroids"]), dtype=np.float64)
        probe = ivf_trained_cells_of(query_vec, cq, nprobe)
    else:
        n_cells, seed = int(summ["ivf-cells"]), int(summ["ivf-seed"])
        cents = rademacher_signs(len(query_vec), n_cells, seed)
        probe = ivf_cells_of(query_vec, cents, nprobe)
    pv = {str(c) for c in probe}
    total = table.size_stats(spark)["files"]
    scanned = table.plan_files(spark, partition_values=pv).count()
    topk = cosine_topk(
        table.scan(spark, partition_values=pv), query_vec, k, id_col, vec_col
    )
    return topk, {
        "total_files": total,
        "scanned_files": scanned,
        "pruned_fraction": 1.0 - scanned / max(total, 1),
        "probe_cells": probe,
    }


def lsh_bucket_udf(dim: int, n_planes: int = 16, seed: int = 7):
    """Arrow UDF: embedding -> LSH bucket id (sign-bit signature)."""
    planes = _hyperplanes(dim, n_planes, seed)
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def bucket(embs: pd.Series) -> pd.Series:
        mat = np.stack(embs.to_numpy())  # (batch, dim)
        signs = mat.astype(np.float64) @ planes.T > 0  # (batch, planes)
        return pd.Series((signs * powers).sum(axis=1).astype(np.int64))

    return bucket


def ann_lsh_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.

    At 10^12 scale the bucket column is what the table is partitioned/
    clustered by, so the probe is a partition-pruned scan; here it is a
    filter. Recall/latency tuned by n_planes (fewer planes = bigger
    buckets = higher recall, more compute) and ``n_probes``:
    MULTI-PROBE LSH (Lv et al., VLDB 2007) also visits the buckets at
    Hamming distance 1 whose flipped plane has the SMALLEST |margin|
    (the nearest decision boundaries — the most likely buckets to hold
    lost neighbors), recovering recall without shrinking the plane
    count."""
    dim = len(query_vec)
    bucket = lsh_bucket_udf(dim, n_planes)
    planes = _hyperplanes(dim, n_planes)
    q = np.array(query_vec, dtype=np.float64)
    margins = q @ planes.T  # signed distance to each plane
    qb = int(((margins > 0) * (1 << np.arange(n_planes))).sum())
    probe_buckets = [qb]
    # flip the lowest-|margin| planes first
    for i in np.argsort(np.abs(margins))[: max(0, n_probes - 1)]:
        probe_buckets.append(qb ^ (1 << int(i)))
    cand = embeddings.withColumn("_bucket", bucket(F.col(vec_col))).filter(
        F.col("_bucket").isin(probe_buckets)
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def ivf_train_centroids(
    embeddings: DataFrame,
    n_cells: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    seed: int = 11,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Tiny Lloyd's k-means expressed as DataFrame aggregations:
    assignment via a pandas UDF against broadcast centroids, update via
    posexplode + groupBy(cell, pos) avg — both shuffle only
    (cell, pos, sum) aggregates, never raw vectors to the driver.

    The key-only projection is PERSISTED across iterations (one source
    scan total, not one per Lloyd step), and ``sample_fraction``
    trains on a deterministic sample — at 10^12-vector scale quantizer
    quality needs only a sample, not the corpus."""
    emb = embeddings.select(vec_col)
    if sample_fraction is not None:
        emb = emb.sample(fraction=sample_fraction, seed=seed)
    emb = emb.persist()
    try:
        first = emb.first()
        dim = len(first[0])
        cents = _hyperplanes(dim, n_cells, seed)  # deterministic init
        for _ in range(iters):
            cmat = cents.copy()

            @F.pandas_udf(T.IntegerType())
            def assign(embs: pd.Series) -> pd.Series:
                mat = np.stack(embs.to_numpy()).astype(np.float64)
                d = ((mat[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
                return pd.Series(d.argmin(axis=1).astype(np.int32))

            assigned = emb.select(
                assign(F.col(vec_col)).alias("cell"), F.posexplode(vec_col)
            )
            rows = (
                assigned.groupBy("cell", "pos")
                .agg(F.avg(F.col("col").cast("double")).alias("m"))
                .collect()
            )
            for r in rows:
                cents[r["cell"], r["pos"]] = r["m"]
    finally:
        emb.unpersist()
    return cents


def ivf_topk(
    spark: SparkSession,
    embeddings: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: score vectors whose cell is among the query's nprobe
    nearest centroids."""
    q = np.array(query_vec, dtype=np.float64)
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = set(np.argsort(d)[:nprobe].tolist())
    cmat = centroids.copy()

    @F.pandas_udf(T.IntegerType())
    def assign(embs: pd.Series) -> pd.Series:
        mat = np.stack(embs.to_numpy()).astype(np.float64)
        dd = ((mat[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(dd.argmin(axis=1).astype(np.int32))

    cand = embeddings.withColumn("_cell", assign(F.col(vec_col))).filter(
        F.col("_cell").isin(*probe)
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


# =====================================================================
# Product quantization (PQ) with asymmetric-distance (ADC) scoring
# =====================================================================
#
# The memory-bound ANN form (Jegou, Douze, Schmid 2011 — public paper):
# each vector is split into m subvectors, each subvector replaced by
# the index of its nearest codeword in a per-subspace codebook of k
# entries. A 64-dim float32 vector (256 B) becomes m log2(k)-bit codes
# (m=8, k=16 -> 4 bytes, 64x smaller) — at 10^12 vectors the codes fit
# where the vectors never could, and queries score candidates WITHOUT
# touching the original embeddings: the query precomputes one m x k
# lookup table of subspace dot products, and each candidate's score is
# m table lookups (ADC). Everything here is on the repo's exact
# integer grid (round(x*1024), codewords integer) so encoding and
# scoring are bit-identical across Catalyst, numpy, and the SQL
# oracle — the same determinism contract as the trained-IVF quantizer.


def fixed_pq_codebooks(dim: int, m: int = 8, k: int = 16,
                       seed: int = 29, scale: int = 103) -> np.ndarray:
    """Data-oblivious deterministic codebooks: per subspace, k
    Rademacher +-scale codewords on the integer grid (odd scale so no
    dot can straddle zero ties with the +-1 structure). Equal-norm
    codewords mean argmin-L2 == argmax-dot — the SQL-reproducible
    form, exactly like the fixed IVF quantizer. Returns (m, k, dim/m)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    signs = rademacher_signs(sub, m * k, seed)
    return (signs * float(scale)).reshape(m, k, sub)


def pq_train_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 8,
    sample_n: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 29,
) -> np.ndarray:
    """Per-subspace Lloyd on a bounded deterministic sample (first
    ``sample_n`` ids — PQ codebooks are tiny, m*k codewords, and the
    published practice trains them on a sample; the driver transfer is
    O(sample_n * dim), never the table). Centroids are snapped to the
    integer grid after the last iteration so the trained codebooks
    keep the same cross-engine exactness as the fixed ones. Empty
    cells keep their previous codeword (standard Lloyd degeneracy
    handling, deterministic)."""
    rows = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(sample_n)
        .collect()
    )
    X = np.array([quantize_vec(r[1]) for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    init = fixed_pq_codebooks(dim, m, k, seed)
    out = []
    for s in range(m):
        Xs = X[:, s * sub:(s + 1) * sub]
        C = init[s].astype(np.float64).copy()
        for _ in range(iters):
            d = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for j in range(k):
                pts = Xs[a == j]
                if len(pts):
                    C[j] = pts.mean(axis=0)
        out.append(np.copysign(np.floor(np.abs(C) + 0.5), C))
    return np.stack(out)


def pq_code_cols(vec_col, codebooks: np.ndarray) -> list:
    """One Catalyst code column per subspace (``pq_0`` .. ``pq_{m-1}``):
    argmin_j ||round(v*1024)_s - C_sj||^2 computed as argmax of
    (integer dot - |C_sj|^2 / 2), ties to the lowest code index (CASE
    order) — the exact-integer idiom shared with the trained-IVF cell
    assignment, so a SQL twin reproduces every code bit-for-bit. All
    JVM higher-order functions, zero Python."""
    m, k, sub = codebooks.shape
    base = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    quant = F.transform(base, lambda x: F.round(x.cast("double") * 1024))
    cols = []
    for s in range(m):
        vs = F.slice(quant, s * sub + 1, sub)
        scores = []
        for j in range(k):
            c = codebooks[s, j]
            lit = F.array(*[F.lit(float(v)) for v in c])
            dot = F.aggregate(
                F.zip_with(vs, lit, lambda x, y: x * y),
                F.lit(0.0), lambda acc, x: acc + x,
            )
            scores.append(dot - F.lit(float((c * c).sum()) / 2.0))
        best = F.greatest(*scores)
        e = F.when(scores[0] == best, 0)
        for j in range(1, k):
            e = e.when(scores[j] == best, j)
        cols.append(e.alias(f"pq_{s}"))
    return cols


def pq_adc_score_col(codebooks: np.ndarray, query_vec) -> F.Column:
    """ADC inner-product score for ONE query over ``pq_*`` code
    columns: the m x k lookup table of exact integer subspace dots is
    computed driver-side (the PQ query-time idiom — O(m*k*sub) work
    once, not per candidate) and baked as array literals; each row's
    score is m element_at lookups summed. Ranking by this score is the
    asymmetric inner-product approximation q . reconstruct(code)."""
    m, k, sub = codebooks.shape
    q = np.asarray(quantize_vec(query_vec), dtype=np.float64)
    total = F.lit(0.0)
    for s in range(m):
        qs = q[s * sub:(s + 1) * sub]
        lut = [float(np.dot(qs, codebooks[s, j])) for j in range(k)]
        arr = F.array(*[F.lit(v) for v in lut])
        total = total + F.element_at(arr, F.col(f"pq_{s}") + 1)
    return total


def pq_codes_of(vec, codebooks: np.ndarray) -> list[int]:
    """Driver/numpy twin of pq_code_cols for one vector (same integer
    math, same lowest-index tie rule)."""
    m, k, sub = codebooks.shape
    v = np.asarray(quantize_vec(vec), dtype=np.float64)
    codes = []
    for s in range(m):
        vs = v[s * sub:(s + 1) * sub]
        scores = [float(np.dot(vs, codebooks[s, j]))
                  - float((codebooks[s, j] ** 2).sum()) / 2.0
                  for j in range(k)]
        best = max(scores)
        codes.append(next(j for j in range(k) if scores[j] == best))
    return codes


def pq_topk(
    embeddings: DataFrame,
    query_vec,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by PQ/ADC score (descending, ties by id). The scan reads
    only the code columns' source vector once to encode; a persisted
    deployment stores the codes as a table column at write time and
    this becomes a vector-free scan of m tiny int columns."""
    coded = embeddings.select(id_col, *pq_code_cols(vec_col, codebooks))
    return (
        coded.select(id_col,
                     pq_adc_score_col(codebooks, query_vec).alias("adc_score"))
        .orderBy(F.desc("adc_score"), id_col)
        .limit(k)
    )


def build_pq_coded_table(
    spark: SparkSession,
    embeddings: DataFrame,
    location: str,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_files: int | None = None,
    extra_cols: tuple = (),
):
    """Persist embeddings WITH their PQ codes materialized as int
    columns (encode-once-at-write, the PQ deployment shape): a probe
    then scans ONLY (id, pq_0..pq_{m-1}) — m small ints per row via
    parquet column pruning, ~4 B/vector at m=8/k=16 instead of the
    256 B float32 vector — while the vector column stays in the same
    file for the exact re-rank of the shortlist. The codebooks are
    pinned in the commit summary (integer grid, JSON-exact) so probe
    and build can never disagree — the same contract as the LSH plane
    matrix and the trained-IVF centroids."""
    import json

    from ..tableformat import LakehouseTable

    m, k, sub = codebooks.shape
    coded = embeddings.select(
        id_col, vec_col, *extra_cols, *pq_code_cols(vec_col, codebooks)
    )
    t = LakehouseTable.create(location, coded.schema)
    entries = t.write_data_files(
        coded,
        n_files=n_files or max(4, spark.sparkContext.defaultParallelism),
        salt_col=id_col,
    )
    t.commit_append(entries, summary={
        "pq-m": m, "pq-k": k,
        "pq-codebooks": json.dumps(codebooks.astype(int).tolist()),
    })
    return t


def ann_pq_topk_coded(
    spark: SparkSession,
    table,
    query_vec,
    k: int = 10,
    shortlist: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, dict]:
    """ANN probe against a PQ-coded table: ADC-score a column-pruned
    scan of the code columns (the vector column is never read in this
    pass), take the ``shortlist`` best (default 4k), then exact-rerank
    only the shortlist's vectors via a broadcast semi-join. Returns
    (topk, stats) where stats reports the observable payoff: bytes of
    code columns vs bytes of the vector column the ADC pass avoided.
    Codebooks come from the build commit's summary."""
    import json

    summ = next(
        s.summary for s in reversed(table.snapshots_list())
        if "pq-codebooks" in s.summary
    )
    cbs = np.array(json.loads(summ["pq-codebooks"]), dtype=np.float64)
    m = cbs.shape[0]
    code_cols = [f"pq_{s}" for s in range(m)]
    n_short = shortlist or 4 * k
    scored = (
        table.scan(spark, columns=[id_col] + code_cols)
        .select(id_col, pq_adc_score_col(cbs, query_vec).alias("adc_score"))
        .orderBy(F.desc("adc_score"), id_col)
        .limit(n_short)
    )
    ids = scored.select(id_col)
    cand = table.scan(spark, columns=[id_col, vec_col]).join(
        F.broadcast(ids), id_col, "left_semi"
    )
    topk = cosine_topk(cand, query_vec, k, id_col, vec_col)
    return topk, {
        "m": m, "k_codes": int(cbs.shape[1]), "shortlist": n_short,
        "code_bytes_per_row": m * 4,
    }


def build_ivfpq_table(
    spark: SparkSession,
    embeddings: DataFrame,
    location: str,
    codebooks: np.ndarray,
    n_cells: int = 8,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 23,
    n_files: int | None = None,
):
    """IVF+PQ — the canonical billion-scale ANN layout (FAISS IVFPQ,
    Jegou et al. 2011): the table is PARTITIONED by IVF cell (fixed
    +-1 quantizer or pinned trained centroids) AND carries the PQ
    codes as materialized int columns. A probe then composes the two
    prunings: manifest partition pruning reads only nprobe/n_cells of
    the FILES, and within them column pruning reads only the ~4 B/row
    code columns for ADC scoring — the vector column is read only for
    the shortlist rerank. At 10^12 vectors this is the only layout
    where a query's working set fits anywhere: cells bound the files,
    codes bound the bytes. Quantizer AND codebooks are pinned in the
    commit summary so probe and build can never disagree."""
    import json

    from ..tableformat import LakehouseTable

    first = embeddings.select(vec_col).first()
    dim = len(first[0])
    if centroids is None:
        cents = rademacher_signs(dim, n_cells, seed)
        cell_expr = ivf_cell_col(vec_col, cents)
        summary = {"ivf-cells": n_cells, "ivf-seed": seed}
    else:
        cq = quantize_centroids(centroids)
        cell_expr = ivf_trained_cell_col(vec_col, cq)
        summary = {"ivf-cells": len(cq),
                   "ivf-centroids": json.dumps(cq.astype(int).tolist())}
    m, kc, _sub = codebooks.shape
    coded = embeddings.select(
        id_col, vec_col, *pq_code_cols(vec_col, codebooks)
    ).withColumn("_cell", cell_expr.cast("int"))
    t = LakehouseTable.create(location, coded.schema, partition_col="_cell")
    entries = t.write_data_files(
        coded,
        n_files=n_files or max(4, spark.sparkContext.defaultParallelism),
        salt_col=id_col,
    )
    t.commit_append(entries, summary={
        **summary, "pq-m": m, "pq-k": kc,
        "pq-codebooks": json.dumps(codebooks.astype(int).tolist()),
    })
    return t


def ann_ivfpq_topk(
    spark: SparkSession,
    table,
    query_vec,
    k: int = 10,
    nprobe: int = 2,
    shortlist: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, dict]:
    """Three-stage IVFPQ probe: (1) resolve the query's nprobe cells
    driver-side from the pinned quantizer; (2) ADC-score a scan pruned
    to those PARTITIONS and to the code COLUMNS (no vector bytes);
    (3) exact-cosine rerank of the shortlist's vectors via broadcast
    semi-join against the same pruned partitions. Returns (topk,
    stats) with the measured pruned_fraction."""
    import json

    summ = next(
        s.summary for s in reversed(table.snapshots_list())
        if "pq-codebooks" in s.summary
    )
    cbs = np.array(json.loads(summ["pq-codebooks"]), dtype=np.float64)
    if "ivf-centroids" in summ:
        cq = np.array(json.loads(summ["ivf-centroids"]), dtype=np.float64)
        probe = ivf_trained_cells_of(query_vec, cq, nprobe)
    else:
        cents = rademacher_signs(len(query_vec), int(summ["ivf-cells"]),
                                 int(summ["ivf-seed"]))
        probe = ivf_cells_of(query_vec, cents, nprobe)
    pv = {str(c) for c in probe}
    total = table.size_stats(spark)["files"]
    scanned = table.plan_files(spark, partition_values=pv).count()
    m = cbs.shape[0]
    code_cols = [f"pq_{s}" for s in range(m)]
    n_short = shortlist or 4 * k
    ids = (
        table.scan(spark, partition_values=pv,
                   columns=[id_col] + code_cols)
        .select(id_col, pq_adc_score_col(cbs, query_vec).alias("adc_score"))
        .orderBy(F.desc("adc_score"), id_col)
        .limit(n_short)
        .select(id_col)
    )
    cand = table.scan(spark, partition_values=pv,
                      columns=[id_col, vec_col]).join(
        F.broadcast(ids), id_col, "left_semi"
    )
    topk = cosine_topk(cand, query_vec, k, id_col, vec_col)
    return topk, {
        "total_files": total,
        "scanned_files": scanned,
        "pruned_fraction": 1.0 - scanned / max(total, 1),
        "probe_cells": probe,
        "shortlist": n_short,
        "code_bytes_per_row": m * 4,
    }
