"""Image corpus-prep pipeline (plans/imagepipe.py): structural+decode
quality gates -> exact byte dedup -> phash-hamming near-dup components
-> splits, with stage-level skip/resume. Near-dup ground truth is an
all-pairs popcount union-find oracle (the tools/golden_phash.py
idiom), never assumed from the synthesis."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.operators.multimodal import resize_images
from mobility_lakehouse_project_spark.plans.imagepipe import (
    incremental_image_update,
    run_image_pipeline,
)
from mobility_lakehouse_project_spark.synth import images_df, phash_variants_df
from mobility_lakehouse_project_spark.tableformat import Catalog


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def _corpus(spark):
    base = images_df(spark, 40)
    # near-dups: base phash with 1-3 bits flipped, re-encoded at 16x16
    # png so the BYTES differ -- only phash proximity links them
    var = resize_images(phash_variants_df(spark, 40, step=10), 16, 16, "png")
    # exact dups: identical bytes under a lexically-later id
    dup = (base.filter(F.col("image_id").isin(
               "img000000000001", "img000000000002", "img000000000003"))
           .withColumn("image_id", F.concat(F.lit("zz"), "image_id")))
    bad_trunc = (base.filter("image_id = 'img000000000004'")
                 .withColumn("image_id", F.lit("bad_trunc"))
                 .withColumn("bytes", F.expr("substring(bytes, 1, 2)")))
    bad_caption = (base.filter("image_id = 'img000000000005'")
                   .withColumn("image_id", F.lit("bad_caption"))
                   .withColumn("caption", F.lit("x")))
    bad_dim = (base.filter("image_id = 'img000000000006'")
               .withColumn("image_id", F.lit("bad_dim"))
               .withColumn("w", F.lit(2)))
    return (base.unionByName(var).unionByName(dup).unionByName(bad_trunc)
            .unionByName(bad_caption).unionByName(bad_dim))


def _expected_survivors(rows, max_hamming=3):
    """All-pairs union-find oracle: survivor = min image_id per
    hamming<=k component over (image_id, phash)."""
    ids = [r["image_id"] for r in rows]
    sigs = [r["phash"] & 0xFFFFFFFFFFFFFFFF for r in rows]
    parent = list(range(len(ids)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(sigs[i] ^ sigs[j]).count("1") <= max_hamming:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[rj] = ri
    comp: dict[int, str] = {}
    for i in range(len(ids)):
        r = find(i)
        comp[r] = min(comp.get(r, ids[i]), ids[i])
    return {comp[find(i)] for i in range(len(ids))}


def test_image_pipeline_end_to_end_and_resume(spark, cat):
    out = run_image_pipeline(spark, cat, images=_corpus(spark))
    assert out["bronze"]["rows"] == 50  # 40 base + 4 var + 3 dup + 3 bad
    # clean: bad_caption (1 word) and bad_dim (w=2) fail structural
    # gates; bad_trunc decodes as bad magic and fails the decode gate
    clean = cat.load_table("imagepipe.clean").scan(spark)
    clean_ids = {r["image_id"] for r in clean.select("image_id").collect()}
    assert out["clean"]["rows"] == 47
    assert not {"bad_trunc", "bad_caption", "bad_dim"} & clean_ids
    # exact dedup: the zz copies lose to their base ids by byte md5
    dd = cat.load_table("imagepipe.dedup").scan(spark)
    dd_ids = {r["image_id"] for r in dd.select("image_id").collect()}
    assert not any(i.startswith("zz") for i in dd_ids)
    # near-dup: survivors == the all-pairs popcount oracle over the
    # post-exact-dedup population (var rows have distinct bytes, so
    # only the hamming stage can remove them)
    pop = clean.filter(~F.col("image_id").startswith("zz")) \
        .select("image_id", "phash").collect()
    assert dd_ids == _expected_survivors(pop)
    # every var row sits within hamming<=3 of its base -> all removed
    assert not any(i.startswith("var") for i in dd_ids)
    # splits partition the dedup set exactly and deterministically
    n = sum(out[k]["rows"] for k in ("train", "valid", "test"))
    assert n == out["dedup"]["rows"] == len(dd_ids)
    # resume: nothing moved -> every stage skipped
    out2 = run_image_pipeline(spark, cat)
    for k in ("clean", "dedup", "train", "valid", "test"):
        assert out2[k]["skipped"] is True, k
    t1 = {r["image_id"] for r in
          cat.load_table("imagepipe.train").scan(spark).collect()}
    assert t1 <= dd_ids


def _ham(a, b):
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_image_pipeline_incremental(spark, cat):
    run_image_pipeline(spark, cat, images=images_df(spark, 40))
    dedup = cat.load_table("imagepipe.dedup")
    base_ids = {r["image_id"] for r in
                dedup.scan(spark).select("image_id").collect()}
    cursor0 = dedup.properties()["imagepipe.cursor.seq"]

    # batch: 5 fresh rows (id namespace AFTER the base so first-seen ==
    # global-min), 1 exact byte dup, 1 phash near-dup, 1 bad caption
    base = images_df(spark, 40)
    fresh = images_df(spark, 5, id_offset=900_000)
    dup = (base.filter("image_id = 'img000000000001'")
           .withColumn("image_id", F.lit("zzdup")))
    near = resize_images(phash_variants_df(spark, 40, step=40), 16, 16, "png")
    bad = (base.filter("image_id = 'img000000000002'")
           .withColumn("image_id", F.lit("bad2"))
           .withColumn("caption", F.lit("x")))
    batch = fresh.unionByName(dup).unionByName(near).unionByName(bad)
    cat.load_table("imagepipe.bronze").append(batch)

    out = incremental_image_update(spark, cat)
    assert out["new_rows"] == 8
    assert out["admitted"] == 7  # bad caption rejected at the gate

    # oracle: among admitted batch rows, drop exact-fp dups of the
    # corpus, then anything within hamming<=3 of an existing survivor
    # or losing min-id within its batch cluster
    idx = cat.load_table("imagepipe.dedup_index").scan(spark)
    cand = sorted(
        [(r["image_id"], r["phash"]) for r in fresh.select(
            "image_id", "phash").collect()]
        + [(r["image_id"], r["phash"]) for r in near.select(
            "image_id", "phash").collect()]
    )
    cand_ids = {cid for cid, _ in cand}
    # the pre-batch survivor sigs (the index was collected AFTER the
    # increment, so exclude everything the batch itself added)
    existing = [r["phash"] for r in idx.select("image_id", "phash").collect()
                if r["image_id"] not in cand_ids and r["image_id"] != "zzdup"]
    expect = set()
    for cid, ph in cand:
        if any(_ham(ph, e) <= 3 for e in existing):
            continue
        if any(_ham(ph, ph2) <= 3 and cid2 < cid for cid2, ph2 in cand):
            continue
        expect.add(cid)
    assert out["appended"] == len(expect)
    now_ids = {r["image_id"] for r in
               dedup.scan(spark).select("image_id").collect()}
    assert now_ids == base_ids | expect
    assert sum(out["splits"].values()) == out["appended"]
    # index stays in lockstep with the dedup table
    idx_ids = {r["image_id"] for r in idx.select("image_id").collect()}
    assert idx_ids == now_ids
    # cursor advanced; a second increment is a no-op
    assert int(dedup.properties()["imagepipe.cursor.seq"]) > int(cursor0)
    out2 = incremental_image_update(spark, cat)
    assert out2 == {"new_rows": 0, "admitted": 0, "appended": 0, "splits": {}}

    # a full rebuild (global-min canonical) lands on the SAME survivor
    # set because every batch id sorts after its near-dup's base id
    out3 = run_image_pipeline(spark, cat)
    assert out3["clean"]["skipped"] is False
    rebuilt = {r["image_id"] for r in
               cat.load_table("imagepipe.dedup").scan(spark)
               .select("image_id").collect()}
    assert rebuilt == now_ids


def test_image_pipeline_decontamination_full_and_incremental(spark, cat):
    base = images_df(spark, 30)
    # eval set: one phash FROM the corpus (row 7) + one off-corpus
    # phash that a future increment will collide with
    bench = (base.filter("image_id = 'img000000000007'").select("phash")
             .unionByName(images_df(spark, 1, id_offset=500_000)
                          .select("phash")))
    out = run_image_pipeline(spark, cat, images=base, benchmark=bench)
    bench_ph = [r["phash"] for r in bench.collect()]
    dd = cat.load_table("imagepipe.dedup").scan(spark) \
        .select("image_id", "phash").collect()
    dc_ids = {r["image_id"] for r in
              cat.load_table("imagepipe.decontaminated").scan(spark)
              .select("image_id").collect()}
    expect_dc = {r["image_id"] for r in dd
                 if all(_ham(r["phash"], b) > 3 for b in bench_ph)}
    assert dc_ids == expect_dc
    assert "img000000000007" not in dc_ids
    n = sum(out[k]["rows"] for k in ("train", "valid", "test"))
    assert n == out["decontaminated"]["rows"] == len(dc_ids)

    # increment: 3 clean freshes + 1 row whose phash IS an eval phash
    pre = cat.load_table("imagepipe.dedup_index").scan(spark) \
        .select("image_id", "phash").collect()
    batch = images_df(spark, 3, id_offset=600_000).unionByName(
        images_df(spark, 1, id_offset=500_000))
    cat.load_table("imagepipe.bronze").append(batch)
    # decontaminated stage exists -> benchmark is required
    with pytest.raises(ValueError, match="benchmark"):
        incremental_image_update(spark, cat)
    out2 = incremental_image_update(spark, cat, benchmark=bench)
    # oracle: first-seen dedup vs the pre-batch index, then decon
    cand = sorted((r["image_id"], r["phash"]) for r in batch.select(
        "image_id", "phash").collect())
    exp_app = set()
    for cid, ph in cand:
        if any(_ham(ph, r["phash"]) <= 3 for r in pre):
            continue
        if any(_ham(ph, p2) <= 3 and c2 < cid for c2, p2 in cand):
            continue
        exp_app.add(cid)
    assert out2["appended"] == len(exp_app)
    exp_dc_new = {cid for cid in exp_app
                  if all(_ham(dict(cand)[cid], b) > 3 for b in bench_ph)}
    dc2_ids = {r["image_id"] for r in
               cat.load_table("imagepipe.decontaminated").scan(spark)
               .select("image_id").collect()}
    assert dc2_ids == dc_ids | exp_dc_new
    assert sum(out2["splits"].values()) == len(exp_dc_new)
    # the contaminated row still lives in dedup + the index (dedup is
    # the canonical survivor set; decontamination is downstream)
    dd2_ids = {r["image_id"] for r in
               cat.load_table("imagepipe.dedup").scan(spark)
               .select("image_id").collect()}
    assert exp_app <= dd2_ids


def test_export_train_shards_roundtrip_and_snapshot_pin(spark, cat, tmp_path):
    from mobility_lakehouse_project_spark.plans.imagepipe import (
        export_train_shards)

    run_image_pipeline(spark, cat, images=images_df(spark, 40))
    out = str(tmp_path / "shards")
    res = export_train_shards(spark, cat, out, target_bytes=20_000, seed=3)
    train = cat.load_table("imagepipe.train")
    ids = {r["image_id"] for r in
           train.scan(spark).select("image_id").collect()}
    back = spark.read.parquet(out)
    assert {r["image_id"] for r in back.select("image_id").collect()} == ids
    assert res["n_shards"] == res["written"] >= 2
    pin = res["snapshot"]

    # the split grows (incremental fold), but re-exporting the PINNED
    # snapshot reproduces exactly the original corpus version
    cat.load_table("imagepipe.bronze").append(
        images_df(spark, 6, id_offset=700_000))
    incremental_image_update(spark, cat)
    assert train.scan(spark).count() >= len(ids)
    out2 = str(tmp_path / "shards2")
    res2 = export_train_shards(spark, cat, out2, target_bytes=20_000,
                               seed=3, snapshot_id=pin)
    back2 = spark.read.parquet(out2)
    assert {r["image_id"] for r in back2.select("image_id").collect()} == ids
    assert res2["n_shards"] == res["n_shards"]
    # identical shard assignment: same (shard_id, image_id) pairs
    a = {(r["shard_id"], r["image_id"]) for r in
         back.select("shard_id", "image_id").collect()}
    b = {(r["shard_id"], r["image_id"]) for r in
         back2.select("shard_id", "image_id").collect()}
    assert a == b


def test_caption_frequency_cap_full_and_incremental(spark, cat):
    boiler = "stock photo watermark"
    rare = "rare caption words"
    base = images_df(spark, 30).withColumn(
        "caption",
        F.when(F.col("image_id") <= "img000000000009", F.lit(boiler))
        .when(F.col("image_id").between(
            "img000000000010", "img000000000012"), F.lit(rare))
        .otherwise(F.col("caption")),
    )
    run_image_pipeline(spark, cat, images=base, max_caption_repeats=4)

    # oracle: caption counts driver-side over the capped input, then
    # the all-pairs hamming union-find on what the cap admits
    rows = base.collect()
    from collections import Counter
    freq = Counter(r["caption"] for r in rows)
    capped = [r for r in rows if freq[r["caption"]] <= 4]
    assert len(capped) == 20  # the 10 boilerplate rows are gone
    expected = _expected_survivors(capped)
    dd = cat.load_table("imagepipe.dedup").scan(spark)
    got = {r["image_id"] for r in dd.select("image_id").collect()}
    assert got == expected
    assert dd.filter(F.col("caption") == boiler).count() == 0
    idx = cat.load_table("imagepipe.dedup_index").scan(spark)
    assert "cap_fp" in idx.columns
    n_rare_idx = dd.filter(F.col("caption") == rare).count()
    assert n_rare_idx == 3  # sanity: the rare rows survived near-dup

    # incremental: 2 more rare-caption rows push rare to 5 > cap ->
    # the NEW rows drop wholesale, existing survivors stay; a
    # unique-caption row is admitted normally
    extra = images_df(spark, 3, id_offset=900_000).withColumn(
        "caption",
        F.when(F.col("image_id") < "img000000900002", F.lit(rare))
        .otherwise(F.col("caption")),
    )
    cat.load_table("imagepipe.bronze").append(extra)
    res = incremental_image_update(spark, cat, max_caption_repeats=4)
    assert res["admitted"] == 3 and res["appended"] == 1
    dd2 = cat.load_table("imagepipe.dedup").scan(spark)
    assert dd2.filter(F.col("caption") == rare).count() == 3  # unchanged
    assert dd2.filter(F.col("image_id") == "img000000900002").count() == 1

    # a pre-cap_fp index (older build) makes the incremental cap fail
    # loudly instead of miscounting
    cat.load_table("imagepipe.dedup_index").drop_column("cap_fp")
    cat.load_table("imagepipe.bronze").append(
        images_df(spark, 1, id_offset=910_000))
    with pytest.raises(ValueError, match="cap_fp"):
        incremental_image_update(spark, cat, max_caption_repeats=4)


def test_blob_stage_tables_write_uncompressed_parquet(spark, cat):
    """Optimization pin (r06): blob-bearing stage tables are created
    with the uncompressed/no-dictionary parquet properties (zstd over
    already-compressed image bytes costs ~2.2x write+read CPU for <1%
    size), while the metadata-sized dedup_index keeps the session
    default codec."""
    import glob
    import os

    import pyarrow.parquet as pq

    run_image_pipeline(spark, cat, images=images_df(spark, 40))
    for name in ("imagepipe.bronze", "imagepipe.clean", "imagepipe.dedup",
                 "imagepipe.train"):
        t = cat.load_table(name)
        props = t.properties()
        assert props.get("write.parquet.compression-codec") == "uncompressed", name
        loc = t.location[len("file://"):] if t.location.startswith("file://") else t.location
        files = glob.glob(os.path.join(loc, "data", "**", "*.parquet"),
                          recursive=True)
        assert files, name
        col = pq.ParquetFile(files[0]).metadata.row_group(0).column(0)
        assert col.compression == "UNCOMPRESSED", name
    idx = cat.load_table("imagepipe.dedup_index")
    assert "write.parquet.compression-codec" not in idx.properties()


def test_fused_build_matches_sequential(spark, tmp_path):
    """The fused bootstrap (one categorized write + hard-linked stage
    registration) must produce row-identical stage tables, row counts,
    index contents and cursor to the sequential chain on the same
    input — including the decontaminated stage and a caption cap. The
    sequential path is forced via a pre-existing sentinel dedup_index
    (any existing stage table disables the fused gate; the sequential
    chain overwrites the index anyway)."""
    from mobility_lakehouse_project_spark.plans import imagepipe

    base = _corpus(spark)
    bench = (images_df(spark, 40).filter("image_id = 'img000000000007'")
             .select("phash"))
    cat_f = Catalog(str(tmp_path / "wh_fused"))
    out_f = run_image_pipeline(spark, cat_f, images=base, benchmark=bench,
                               max_caption_repeats=30)

    cat_s = Catalog(str(tmp_path / "wh_seq"))
    cat_s.create_table_as(
        "imagepipe.bronze", base, properties=imagepipe._BLOB_TABLE_PROPS)
    cat_s.create_table_as(
        "imagepipe.dedup_index",
        spark.createDataFrame(
            [("__sentinel__", "x", 0, "y")],
            "image_id string, fp string, phash long, cap_fp string"))
    out_s = run_image_pipeline(spark, cat_s, benchmark=bench,
                               max_caption_repeats=30)

    for name in ("imagepipe.clean", "imagepipe.dedup",
                 "imagepipe.decontaminated", "imagepipe.train",
                 "imagepipe.valid", "imagepipe.test",
                 "imagepipe.dedup_index"):
        rf = sorted(tuple(r) for r in
                    cat_f.load_table(name).scan(spark).collect())
        rs = sorted(tuple(r) for r in
                    cat_s.load_table(name).scan(spark).collect())
        assert rf == rs, f"{name} diverges between fused and sequential"
    for k in ("clean", "dedup", "decontaminated", "train", "valid", "test"):
        assert out_f[k]["rows"] == out_s[k]["rows"], k
        assert out_f[k]["skipped"] is False
    # cursor parity: both paths advance to bronze's last sequence
    assert (cat_f.load_table("imagepipe.dedup")
            .properties()["imagepipe.cursor.seq"]
            == cat_s.load_table("imagepipe.dedup")
            .properties()["imagepipe.cursor.seq"])
    # resume parity: a fused-built warehouse skips every stage on the
    # next call exactly like a sequentially-built one
    out_f2 = run_image_pipeline(spark, cat_f, benchmark=bench,
                                max_caption_repeats=30)
    for k in ("clean", "dedup", "decontaminated", "train", "valid", "test"):
        assert out_f2[k]["skipped"] is True, k


def test_bronze_clone_bootstrap_matches_ctas(spark, tmp_path):
    """A pristine full-table scan on the catalog's filesystem boots
    bronze as a zero-copy CLONE (op == 'clone', source files hard-
    linked); every downstream stage table is row-identical to the CTAS
    path, and a transformed (non-pristine) input still routes to CTAS."""
    from mobility_lakehouse_project_spark.plans import imagepipe
    from mobility_lakehouse_project_spark.tableformat import LakehouseTable

    d = images_df(spark, 400, dims=(8, 16))
    t = LakehouseTable.create(
        str(tmp_path / "src_t"), d.schema, partition_col="bucket",
        properties=imagepipe._BLOB_TABLE_PROPS)
    t.append(d, n_files=4)
    bench = images_df(spark, 8, id_offset=900).select("phash")

    cat_c = Catalog(str(tmp_path / "wh_clone"))
    out_c = run_image_pipeline(spark, cat_c, images=t.scan(spark),
                               benchmark=bench)
    bz = cat_c.load_table("imagepipe.bronze")
    assert bz.current_snapshot().operation == "clone"
    # future bronze appends keep the pipeline's blob-write posture
    assert (bz.properties()["write.parquet.compression-codec"]
            == "uncompressed")
    assert out_c["bronze"]["rows"] == 400

    # a transformed frame loses the pristine tag -> ordinary CTAS
    cat_s = Catalog(str(tmp_path / "wh_ctas"))
    cols = t.scan(spark).columns
    out_s = run_image_pipeline(spark, cat_s,
                               images=t.scan(spark).select(*cols),
                               benchmark=bench)
    assert (cat_s.load_table("imagepipe.bronze")
            .current_snapshot().operation == "append")
    for name in ("imagepipe.clean", "imagepipe.dedup",
                 "imagepipe.decontaminated", "imagepipe.train",
                 "imagepipe.valid", "imagepipe.test",
                 "imagepipe.dedup_index"):
        rc = sorted(tuple(r) for r in
                    cat_c.load_table(name).scan(spark).collect())
        rs = sorted(tuple(r) for r in
                    cat_s.load_table(name).scan(spark).collect())
        assert rc == rs, f"{name} diverges between clone and CTAS boot"
    for k in ("clean", "dedup", "decontaminated", "train", "valid", "test"):
        assert out_c[k]["rows"] == out_s[k]["rows"], k


def test_bronze_clone_skipped_for_pending_deletes(spark, tmp_path):
    """A source table with pending MOR deletes must NOT clone (the
    clone would resurrect deleted rows) — the CTAS path applies them."""
    from mobility_lakehouse_project_spark.operators.delete import delete_where
    from mobility_lakehouse_project_spark.plans import imagepipe
    from mobility_lakehouse_project_spark.tableformat import LakehouseTable

    d = images_df(spark, 60, dims=(8,))
    t = LakehouseTable.create(
        str(tmp_path / "src_t"), d.schema, partition_col="bucket",
        properties=imagepipe._BLOB_TABLE_PROPS)
    t.append(d, n_files=2)
    delete_where(t, spark, "image_id = 'img000000000000'", mode="mor")
    cat = Catalog(str(tmp_path / "wh"))
    out = run_image_pipeline(spark, cat, images=t.scan(spark))
    bz = cat.load_table("imagepipe.bronze")
    assert bz.current_snapshot().operation == "append"  # CTAS, not clone
    assert out["bronze"]["rows"] == 59
    ids = {r["image_id"] for r in bz.scan(spark).select("image_id").collect()}
    assert "img000000000000" not in ids
