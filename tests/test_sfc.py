"""Property tests for the space-filling-curve kernels (SURVEY.md §7.3:
'Hilbert curve correctness: ... property-test locality vs Morton')."""

import numpy as np

from mobility_lakehouse_project_spark.functions import sfc


def _all_coords(bits):
    n = 1 << bits
    g = np.arange(n, dtype=np.uint64)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    return xx.ravel(), yy.ravel(), zz.ravel()


def test_morton_bijective_small_grid():
    x, y, z = _all_coords(3)
    idx = sfc.morton3(x, y, z)
    assert len(np.unique(idx)) == len(idx)
    assert idx.min() == 0 and idx.max() == len(idx) - 1


def test_hilbert_bijective_small_grid():
    x, y, z = _all_coords(3)
    idx = sfc.hilbert3(x, y, z, bits=3)
    assert len(np.unique(idx)) == len(idx)
    assert idx.min() == 0 and idx.max() == len(idx) - 1


def test_hilbert_unit_step_locality():
    """The defining Hilbert property: consecutive curve positions are
    adjacent cells (manhattan distance exactly 1). Morton does NOT have
    this property — verified as the contrast case."""
    bits = 3
    x, y, z = _all_coords(bits)
    idx = sfc.hilbert3(x, y, z, bits=bits)
    order = np.argsort(idx)
    coords = np.stack([x, y, z], axis=1).astype(np.int64)[order]
    steps = np.abs(np.diff(coords, axis=0)).sum(axis=1)
    assert (steps == 1).all()

    midx = sfc.morton3(x, y, z)
    morder = np.argsort(midx)
    mcoords = np.stack([x, y, z], axis=1).astype(np.int64)[morder]
    msteps = np.abs(np.diff(mcoords, axis=0)).sum(axis=1)
    assert (msteps > 1).any()


def test_normalize_i64_order_preserving():
    vals = np.array([-(2**63), -1, 0, 1, 2**62, 2**63 - 1], dtype=np.int64)
    norm = sfc.normalize_i64(vals)
    assert (np.diff(norm.astype(np.int64)) >= 0).all()


def test_morton_high_bits_follow_first_dim():
    """Top curve bits come from dim0 (phash) — the property that makes
    per-file z-ranges imply tight phash ranges."""
    lo = sfc.morton3(np.array([0], dtype=np.uint64), np.array([(1 << 21) - 1], dtype=np.uint64), np.array([(1 << 21) - 1], dtype=np.uint64))
    hi = sfc.morton3(np.array([1 << 20], dtype=np.uint64), np.array([0], dtype=np.uint64), np.array([0], dtype=np.uint64))
    assert hi[0] > lo[0]


def test_jvm_zorder_col_bit_identical(spark):
    """The Catalyst-expression Z-order key (sfc.zorder_col) must match
    the numpy kernel bit-for-bit — it feeds the same quantile
    boundaries the Arrow assigner searches."""
    import pyspark.sql.functions as F

    df = spark.range(2000).select(
        (F.col("id") * 982451653 - 4611686018427387904).alias("phash"),
        (F.col("id") % 70).cast("int").alias("w"),
        (F.col("id") % 130).cast("int").alias("h"),
    )
    jvm = [r["z"] for r in df.select(sfc.zorder_col(F.col("phash"), F.col("w"), F.col("h")).alias("z")).collect()]
    pdf = df.toPandas()
    ref = sfc.morton3(
        sfc.normalize_i64(pdf["phash"].to_numpy()),
        sfc.normalize_u32(pdf["w"].to_numpy()),
        sfc.normalize_u32(pdf["h"].to_numpy()),
    )
    assert list(ref) == jvm


def test_udfs_run_in_spark(spark):
    import pyspark.sql.functions as F

    df = spark.range(1000).select(
        (F.col("id") * 7919 - 500).alias("phash"),
        (F.col("id") % 64).cast("int").alias("w"),
        (F.col("id") % 32).cast("int").alias("h"),
    )
    out = df.select(
        sfc.zorder_key("phash", "w", "h").alias("z"),
        sfc.hilbert_key("phash", "w", "h").alias("hb"),
    ).collect()
    assert len(out) == 1000
    assert all(r["z"] >= 0 and r["hb"] >= 0 for r in out)


def test_normalize_scaled_order_preserving_and_full_range():
    """Range-scaled dims: order preserved AND narrow-range values spread
    over the full 21-bit space (the r2 weak finding: clipping left w/h
    in bits 4-7, so their file stats never pruned)."""
    vals = np.array([16, 32, 64, 128], dtype=np.int64)
    lo_f, sc = sfc.dim_params(16, 128)
    norm = sfc.normalize_scaled(vals, lo_f, sc).astype(np.int64)
    assert (np.diff(norm) > 0).all()
    assert norm[0] == 0
    assert norm[-1] == (1 << 21) - 1  # max maps to the top of the dim
    # int64-wide dim (phash) stays order-preserving through the double path
    big = np.array([-(2**63), -(2**40), -1, 0, 1, 2**40, 2**63 - 1],
                   dtype=np.int64)
    lo_f, sc = sfc.dim_params(-(2**63), 2**63 - 1)
    nb = sfc.normalize_scaled(big, lo_f, sc).astype(np.int64)
    assert (np.diff(nb) >= 0).all()
    assert nb[0] == 0 and nb[-1] == (1 << 21) - 1


def test_jvm_zorder_col_bit_identical_with_bounds(spark):
    """Bounds-scaled Catalyst twin must stay bit-identical to the numpy
    kernel — both apply the identical driver-computed (lo, scale)
    double sequence."""
    import pyspark.sql.functions as F

    bounds = ((-(2**63), 2**63 - 1), (16, 128), (8, 512))
    df = spark.range(2000).select(
        (F.col("id") * 982451653 - 4611686018427387904).alias("phash"),
        (16 + F.col("id") % 113).cast("int").alias("w"),
        (8 + F.col("id") % 505).cast("int").alias("h"),
    )
    jvm = [
        r["z"]
        for r in df.select(
            sfc.zorder_col(
                F.col("phash"), F.col("w"), F.col("h"), bounds=bounds
            ).alias("z")
        ).collect()
    ]
    pdf = df.toPandas()
    ref = sfc.curve_np(
        "zorder",
        pdf["phash"].to_numpy(),
        pdf["w"].to_numpy(),
        pdf["h"].to_numpy(),
        bounds=bounds,
    )
    assert list(ref) == jvm
    # and the Arrow UDF factory agrees too
    udf_vals = [
        r["z"]
        for r in df.select(
            sfc.curve_key_udf("zorder", bounds)("phash", "w", "h").alias("z")
        ).collect()
    ]
    assert udf_vals == jvm


def test_morton2_bijective_small_grid():
    n = 1 << 5
    g = np.arange(n, dtype=np.uint64)
    xx, yy = np.meshgrid(g, g, indexing="ij")
    idx = sfc.morton_n([xx.ravel(), yy.ravel()])
    assert len(np.unique(idx)) == len(idx)
    assert idx.min() == 0 and idx.max() == len(idx) - 1


def test_hilbert2_unit_step_locality():
    bits = 4
    n = 1 << bits
    g = np.arange(n, dtype=np.uint64)
    xx, yy = np.meshgrid(g, g, indexing="ij")
    idx = sfc.hilbert_n([xx.ravel(), yy.ravel()], bits=bits)
    order = np.argsort(idx)
    coords = np.stack([xx.ravel(), yy.ravel()], axis=1).astype(np.int64)[order]
    steps = np.abs(np.diff(coords, axis=0)).sum(axis=1)
    assert (steps == 1).all()


def test_jvm_zorder_col_n_dims_bit_identical(spark):
    """The variadic Catalyst twin must match morton_n for 1 and 2 dims
    (bounds-scaled), like the 3-dim case."""
    import pyspark.sql.functions as F

    df = spark.range(1500).select(
        (F.col("id") * 982451653 - 4611686018427387904).alias("phash"),
        (16 + F.col("id") % 113).cast("int").alias("w"),
    )
    pdf = df.toPandas()
    b2 = ((-(2**63), 2**63 - 1), (16, 128))
    jvm2 = [r["z"] for r in df.select(
        sfc.zorder_col(F.col("phash"), F.col("w"), bounds=b2).alias("z")).collect()]
    ref2 = sfc.morton_n(sfc._dims_np(
        (pdf["phash"].to_numpy(), pdf["w"].to_numpy()), b2))
    assert list(ref2) == jvm2
    b1 = ((-(2**63), 2**63 - 1),)
    jvm1 = [r["z"] for r in df.select(
        sfc.zorder_col(F.col("phash"), bounds=b1).alias("z")).collect()]
    ref1 = sfc.morton_n(sfc._dims_np((pdf["phash"].to_numpy(),), b1))
    assert list(ref1) == jvm1
    # and the variadic Arrow UDF agrees
    udf2 = [r["z"] for r in df.select(
        sfc.curve_key_udf("zorder", b2)("phash", "w").alias("z")).collect()]
    assert udf2 == jvm2
