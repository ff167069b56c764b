"""Image-corpus preparation pipeline — the multimodal twin of the
document chain (plans/datapipe.py) over the input_hint table shape
(image_id, bytes, w, h, fmt, caption, phash). Reference analog: the
bronze->silver quality/dedup gates the mobility DAGs run per day
(/root/reference/dags/Silver_Transform_Dag.py), re-expressed as the
standard image-training-corpus prep stages:

    imagepipe.bronze   raw image+caption rows (bootstrap CTAS)
    imagepipe.clean    structural gates (dims/fmt/caption) + decode gate
    imagepipe.dedup    exact byte dedup + phash-hamming near-dup
                       components (keep the canonical image)
    imagepipe.decontaminated  eval-set phash-proximity removal
                       (hamming_join vs the held-out benchmark)
    imagepipe.train/valid/test  deterministic hash splits

Stage-level resume is shared with datapipe (``_stage``): each output
table records its input's ``table@snapshot`` signature and is rebuilt
only when that signature moves, as one overwrite commit.

Scale notes (100 TB of blobs):
  * Structural gates are pure Catalyst over metadata columns — the
    parquet scan never materializes ``bytes`` for a row that fails a
    cheap gate first (filter order matters; Spark short-circuits
    conjuncts left to right within a codegen stage).
  * The decode gate streams blobs through one Arrow-batched
    mapInPandas pass and emits ONLY failing ids; survivors are kept
    by a broadcast-able left_anti join, so blobs are read once and
    never shuffled.
  * Exact dedup groups by md5(bytes) — computed JVM-side in the scan
    projection; only (fingerprint, id) pairs shuffle, never payload.
  * Near-dup blocking is the pigeonhole hamming-band self-join
    (operators/dedup.hamming_pairs): candidate volume is bounded by
    band collisions, not O(n^2); component labeling converges in
    O(log diameter) shuffle rounds (operators/dedup.
    connected_components).
  * Splits are hash-deterministic on image_id, so backfills land rows
    in the same split across runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import imagecodec as ic
from ..operators.dedup import connected_components, hamming_join, hamming_pairs
from ..tableformat.catalog import Catalog
from .datapipe import SRC_PROP, _sig, _stage

SUPPORTED_FMTS = ("jpeg", "png", "raw")
# Stage tables carry the image payload: parquet-level zstd over
# already-compressed blobs costs ~2.2x slower writes+reads for <1%
# size (measured, tableformat/table.py::create docstring), and
# dictionary encoding never hits on unique multi-KB blobs. Every
# blob-bearing stage (bronze/clean/dedup/decontaminated/splits) is
# created with these; the metadata-sized dedup_index keeps the session
# default codec (guide §6: pick the codec per payload, not globally).
_BLOB_TABLE_PROPS = {
    "write.parquet.compression-codec": "uncompressed",
    "write.parquet.dictionary-enabled": "false",
}
# bronze sequence number the dedup table has consumed through; keyed on
# the dedup table's properties (advanced by full builds and increments)
CURSOR_PROP = "imagepipe.cursor.seq"


def _decode_reject_ids(images: DataFrame) -> DataFrame:
    """One streaming decode pass over the blobs; emits ONLY the ids
    whose payload fails to decode (bad magic, truncation, header/dims
    disagreement). The tiny reject set anti-joins against the full
    table, so the expensive column is read exactly once."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bad = []
            # plain-list iteration: per-row .iloc pays pandas indexing
            # overhead per CALL (5 calls/row); the decode kernel itself
            # is the only per-row work that should remain
            for img_id, blob, w, h, fmt in zip(
                pdf["image_id"].tolist(), pdf["bytes"].tolist(),
                pdf["w"].tolist(), pdf["h"].tolist(), pdf["fmt"].tolist(),
            ):
                try:
                    ic.decode(blob, int(w), int(h), fmt)
                except Exception:
                    bad.append(img_id)
            yield pd.DataFrame({"image_id": pd.Series(bad, dtype="object")})

    cols = ["image_id", "bytes", "w", "h", "fmt"]
    return images.select(*cols).mapInPandas(run, schema="image_id string")


def _gate_fingerprints(images: DataFrame) -> DataFrame:
    """Decode gate + fingerprint pass in ONE blob read: the gate
    already ships every payload to Python, so emitting the byte/caption
    md5 fingerprints (identical to ``F.md5`` — lowercase hex over the
    raw/UTF-8 bytes, pinned by tests) and phash alongside the ok flag
    makes the dedup stage's separate full-blob md5 scan unnecessary
    (guide §8: decide with small rows computed while the heavy bytes
    are already in hand). Output is metadata-sized (~100 B/row)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["image_id"].tolist()
            oks: list[bool] = []
            fps: list[str] = []
            cfps: list[str] = []
            for blob, w, h, fmt, cap in zip(
                pdf["bytes"].tolist(), pdf["w"].tolist(),
                pdf["h"].tolist(), pdf["fmt"].tolist(),
                pdf["caption"].tolist(),
            ):
                try:
                    ic.decode(blob, int(w), int(h), fmt)
                    oks.append(True)
                except Exception:
                    oks.append(False)
                fps.append(hashlib.md5(blob).hexdigest())
                cfps.append(hashlib.md5(cap.encode("utf-8")).hexdigest())
            yield pd.DataFrame({
                "image_id": pd.Series(ids, dtype="object"),
                "ok": pd.Series(oks, dtype="bool"),
                "fp": pd.Series(fps, dtype="object"),
                "cap_fp": pd.Series(cfps, dtype="object"),
                "phash": pdf["phash"],
            })

    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    return images.select(*cols).mapInPandas(
        run, schema="image_id string, ok boolean, fp string, "
                    "cap_fp string, phash long")


def _dedup_drop_set(
    ids: DataFrame, max_hamming: int, max_caption_repeats: int | None,
) -> DataFrame:
    """The dedup stage's combined loser-id set, computed entirely over
    the persisted metadata frame ``ids`` (image_id, phash, fp, cap_fp):
    exact byte-dup losers (min-id keeps), over-cap boilerplate
    captions, and phash-hamming near-dup component losers. Returned
    EAGERLY materialized (localCheckpoint): the set is consumed by the
    survivor write's broadcast anti-join, the dedup_index build, and —
    on the fused fresh-build path — the categorized corpus write;
    uncut, each consumer re-executed the whole decision DAG (~9
    competing broadcast subtrees per execution in the sf1 event log).

    Hot-key safety (the input's ~5%-hot phash skew, FIXTURES.md): the
    component graph's nodes are the DISTINCT phash values, not the
    images — an identical-phash group of size g contributes 1 node,
    not g^2 band pairs, and the numeric sig doubles as the component
    label (connected_components' monotone-sum convergence check needs
    numeric ids). Survivor per near-dup cluster = its global min
    image_id."""
    keep = ids.groupBy("fp").agg(F.min("image_id").alias("__keep"))
    exact_losers = (
        ids.join(keep, "fp")
        .filter(F.col("image_id") != F.col("__keep"))
        .select("image_id")
    # EAGER checkpoints on the intermediate decision frames too: the
    # loser set feeds both the drop union and the survivor branch, and
    # the survivor frame feeds the caption counts, the sig distinct
    # and the member join — uncut, each broadcast subtree re-ran the
    # groupBy-over-ids chain (the concurrent-broadcast staircases in
    # the sf1 event log). Both frames are metadata-sized (duplicate
    # volume / one row per admitted image).
    ).localCheckpoint()
    drop = exact_losers
    surv = _drop_ids(ids, exact_losers).localCheckpoint()
    if max_caption_repeats is not None:
        # boilerplate-caption filter: counts over byte-deduped rows (a
        # byte-dup must not inflate its caption), drop over-cap
        # captions wholesale — count + anti-join, no per-caption
        # window (hot captions are the hot keys)
        boiler = (
            surv.groupBy("cap_fp")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > max_caption_repeats)
            .select("cap_fp")
        )
        drop = drop.unionByName(
            surv.join(F.broadcast(boiler), "cap_fp", "left_semi")
            .select("image_id")
        )
        surv = surv.join(F.broadcast(boiler), "cap_fp", "left_anti")
    sigs = surv.select("phash").distinct()
    pairs = hamming_pairs(
        sigs.select(F.col("phash").alias("id"), F.col("phash").alias("sig")),
        max_hamming=max_hamming,
    # EAGER checkpoint: connected_components' symmetrized edge union
    # references this frame twice, and the band join is the stage's
    # widest shuffle. Materialized pair volume is band-collision-
    # bounded (near-dup hits only), metadata-sized.
    ).localCheckpoint()
    labels = connected_components(pairs, src="ida", dst="idb")
    canon = sigs.join(
        labels, sigs["phash"] == labels["id"], "left"
    ).select("phash", F.coalesce("component", "phash").alias("__comp"))
    members = surv.select("image_id", "phash").join(canon, "phash")
    winners = (
        members.groupBy("__comp").agg(F.min("image_id").alias("image_id"))
    )
    return drop.unionByName(
        members.join(winners.select("image_id"), "image_id", "left_anti")
        .select("image_id")
    ).localCheckpoint()


def _n_meta(d: DataFrame) -> int:
    """Partition count for cached metadata-sized frames (the blob
    scan's split count is payload-sized — thousands of ~350 KB
    metadata slivers at sf1+; see _fused_fresh_build)."""
    return max(8, d.sparkSession.sparkContext.defaultParallelism)


def _drop_ids(d: DataFrame, drop: DataFrame) -> DataFrame:
    """Anti-join ``d`` against a DROP-id frame, broadcast explicitly.

    Every removal set in this pipeline is proportional to the
    *failure/duplicate* volume (decode rejects, exact-dup losers,
    near-dup losers, contaminated ids) — metadata-sized in a mostly-
    unique corpus — while the survivor side is corpus-sized. Without
    the hint the planner cannot size the small side (it sits behind
    MapInPandas / aggregates) and falls back to a SortMergeJoin that
    shuffles the full blob payload by image_id (measured: the clean
    stage's dominant cost). Broadcasting the loser set keeps the
    payload on its scan partitioning: zero payload shuffles."""
    return d.join(F.broadcast(drop), "image_id", "left_anti")


def _structural_pred(min_dim: int, min_caption_words: int):
    """The metadata-only admission predicate (pure Catalyst): shared
    by the sequential gate, the incremental path and the fused fresh
    build so every path enforces identical rules."""
    words = F.size(F.filter(F.split("caption", " "), lambda x: x != ""))
    return (
        F.col("bytes").isNotNull()
        & (F.length("bytes") > 0)
        & (F.col("w") >= min_dim)
        & (F.col("h") >= min_dim)
        & F.col("fmt").isin(*SUPPORTED_FMTS)
        & F.col("caption").isNotNull()
        & (words >= min_caption_words)
    )


def _quality_gate(
    d: DataFrame, min_dim: int, min_caption_words: int, decode_gate: bool,
    fingerprint_state: dict | None = None,
) -> DataFrame:
    """Structural gates (metadata columns only, pure Catalyst) then the
    streaming decode gate. Shared by the full build and the
    incremental path so both enforce identical admission rules.

    ``fingerprint_state``: when a dict is passed (the full-build path)
    and the decode gate is on, the gate pass ALSO emits the dedup
    fingerprints (md5 of bytes/caption + phash) and stores the
    persisted metadata-sized frame under ``fingerprint_state["gate_fp"]``
    — one blob read serves both the gate and exact dedup."""
    d = d.filter(_structural_pred(min_dim, min_caption_words))
    if decode_gate:
        if fingerprint_state is not None:
            gfp = _gate_fingerprints(d).persist()
            fingerprint_state["gate_fp"] = gfp
            d = _drop_ids(d, gfp.filter(~F.col("ok")).select("image_id"))
        else:
            d = _drop_ids(d, _decode_reject_ids(d))
    return d


_STAGE_TABLES = ("imagepipe.clean", "imagepipe.dedup",
                 "imagepipe.decontaminated", "imagepipe.train",
                 "imagepipe.valid", "imagepipe.test", "imagepipe.dedup_index")


def _clone_bronze_if_pristine(
    spark: SparkSession, catalog: Catalog, images: DataFrame,
):
    """Bootstrap ``imagepipe.bronze`` as a hard-link clone when the
    input frame is a pristine full-table scan co-located with the
    catalog's filesystem; returns None (caller falls back to CTAS)
    otherwise. Every guard errs toward the CTAS path — the clone is an
    optimization, never a semantic fork: the cloned files ARE the rows
    the CTAS would have written."""
    import os

    from ..tableformat.paths import to_local

    src_info = getattr(images, "_lh_pristine_scan", None)
    if src_info is None:
        return None
    src_t, src_snap_id = src_info
    snap = src_t.snapshot_by_id(src_snap_id)
    if snap is None or snap.delete_manifests:
        return None  # expired snapshot / pending deletes: CTAS applies them
    if src_t._current_spec_snapshot_ids(src_t.load_metadata()) is not None:
        return None  # mixed partition specs: clone_to would refuse
    try:
        sdev = os.stat(to_local(src_t.location)).st_dev
        wh = to_local(catalog.warehouse)
        os.makedirs(wh, exist_ok=True)
        ddev = os.stat(wh).st_dev
    except OSError:
        return None
    if sdev != ddev:
        return None  # cross-device: hard links impossible, CTAS is parallel
    bronze = src_t.clone_to(spark, catalog._location("imagepipe.bronze"),
                            snapshot_id=src_snap_id)
    # the clone inherits the SOURCE's properties; pin the stage-table
    # write posture so bronze's future appends match the pipeline's
    bronze.update_properties(_BLOB_TABLE_PROPS)
    return bronze


def _fused_fresh_build(
    spark: SparkSession,
    catalog: Catalog,
    bronze,
    *,
    min_dim: int,
    min_caption_words: int,
    max_hamming: int,
    decode_gate: bool,
    benchmark: DataFrame | None,
    decon_hamming: int,
    splits: tuple[float, float],
    max_caption_repeats: int | None,
) -> dict:
    """Bootstrap build of every downstream stage from ONE categorized
    corpus write (guide §8: decide with small rows, move big rows
    once — here, WRITE big rows once).

    The sequential chain writes the payload five times (clean, dedup,
    decontaminated, splits) and re-reads each parent table, because
    each stage's input is its predecessor. But every stage is a pure
    row-subset of clean, decided by metadata-sized id sets — so on a
    fresh build the stages are NESTED FILTERS of one frame. This path:

      1. runs the gate + fingerprint pass (one blob read, as before),
      2. computes every drop decision over the metadata frame
         (exact/boilerplate/near-dup losers via _dedup_drop_set,
         eval-set contamination via hamming_join),
      3. labels each surviving row with its FINEST category —
         'd' dedup-loser, 'x' contaminated, 't'/'v'/'s' its split —
         via broadcast joins on the failure-volume-sized id sets
         (never a corpus-sized broadcast),
      4. writes the corpus ONCE, partitionBy('__cat') so every file
         is category-pure (no shuffle — rows stay on their scan
         partitioning; the transient __cat column never lands in the
         files), and
      5. registers each stage table over its category subset by
         HARD-LINKING the files into the stage's data dir (same-FS
         zero-copy; falls back to a byte copy across devices). Each
         table owns a real directory entry, so per-table drop/orphan
         GC stays safe — the analog of Iceberg tables sharing
         physical files via absolute-path manifests on an object
         store, where none of these bytes would be duplicated either.

    Payload I/O drops from 5 writes + 4 reads of the corpus to 1
    write + 2 reads (gate pass + write pass); the stage tables, their
    row sets, SRC_PROP signatures, properties and the dedup_index are
    IDENTICAL to the sequential path's (pinned by the e2e tests and
    test_fused_build_matches_sequential). The sequential path remains
    the resume/rebuild engine — this runs only when no stage table
    exists yet, which is also what bounds the decision broadcasts:
    failure/duplicate volume of a fresh corpus."""
    import os
    import shutil
    import time
    import uuid

    # step-level wall-clock attribution (guide §1.5): printed only when
    # SPARK_GRAFT_PIPE_PROFILE is set, so profiling runs can see where
    # the fused build spends its time without an event log
    _prof = bool(os.environ.get("SPARK_GRAFT_PIPE_PROFILE"))
    _tlast = [time.time()]

    def _mark(step: str) -> None:
        if _prof:
            now = time.time()
            print(f"[fused] {step}: {now - _tlast[0]:.2f}s", flush=True)
            _tlast[0] = now

    out: dict = {}
    d0 = bronze.scan(spark).filter(
        _structural_pred(min_dim, min_caption_words))
    # ~core-count partitions for the cached metadata frame: it
    # inherits the blob scan's split count (one ~350 KB sliver per
    # 32 MB payload split — thousands at sf1+), and every decision job
    # below re-pays that task dispatch; one cheap shuffle of the
    # ~100 B/row frame right-sizes ALL of them (guide §2.2: fewer,
    # larger partitions for metadata-sized work)
    n_meta = max(8, spark.sparkContext.defaultParallelism)
    if decode_gate:
        gfp = _gate_fingerprints(d0).persist()
        # ONE decode pass fills the fingerprint cache BEFORE any plan
        # fans out over it: the ids frame's repartition makes its first
        # query multi-stage under AQE, and the shuffle map stage and
        # the reject-broadcast subtree are independent query stages
        # that would otherwise race to compute the uncached gate pass
        # concurrently (measured: twin full-decode jobs)
        gfp.count()
        rejects = gfp.filter(~F.col("ok")).select("image_id")
        ids = _drop_ids(
            gfp, rejects
        ).select("image_id", "phash", "fp", "cap_fp") \
            .repartition(n_meta).persist()
        corpus = _drop_ids(d0, rejects)
    else:
        gfp = None
        ids = d0.select(
            "image_id", "phash", F.md5("bytes").alias("fp"),
            F.md5("caption").alias("cap_fp"),
        ).repartition(n_meta).persist()
        corpus = d0
    # materialize the fingerprint pass ONCE before fan-out: the first
    # decision query's independent AQE subtrees (groupBy + join
    # branches) otherwise race to fill the cache, each running the
    # full blob-decode gate pass concurrently (twin 13s jobs in the
    # sf1 event log)
    ids.count()
    _mark("gate+fingerprints (cache fill)")
    drop = _dedup_drop_set(ids, max_hamming, max_caption_repeats)
    _mark("dedup decision DAG")
    surv = _drop_ids(ids, drop)
    dirty = None
    if benchmark is not None:
        bench = benchmark.select(
            F.col("phash").alias("sig")
        ).distinct().withColumn("id", F.lit(0))
        dirty = hamming_join(
            surv.select(F.col("image_id").alias("id"),
                        F.col("phash").alias("sig")),
            bench, max_hamming=decon_hamming,
        ).select(F.col("ida").alias("image_id")).distinct().localCheckpoint()
        _mark("decontamination hamming join")

    t_frac, v_frac = splits
    bucket = F.pmod(
        F.xxhash64(F.col("image_id"), F.lit("imagepipe-split")), F.lit(10_000)
    )
    cuts = (int(t_frac * 10_000), int((t_frac + v_frac) * 10_000))
    # category = the finest stage that still CONTAINS the row; every
    # id-set join is broadcast and failure/duplicate-volume-sized
    corpus = corpus.join(
        F.broadcast(drop.withColumn("__dup", F.lit(True))), "image_id", "left")
    cat = F.when(F.col("__dup").isNotNull(), "d")
    if dirty is not None:
        corpus = corpus.join(
            F.broadcast(dirty.withColumn("__dirty", F.lit(True))),
            "image_id", "left")
        cat = cat.when(F.col("__dirty").isNotNull(), "x")
    cat = (cat.when(bucket < cuts[0], "t")
           .when(bucket < cuts[1], "v").otherwise("s"))
    data_cols = [f.name for f in bronze.schema().fields]
    corpus = corpus.select(*data_cols, cat.alias("__cat"))
    # Write-task sizing (guide §6): each writer task emits one file per
    # category it sees (rows arrive category-mixed), so the scan's
    # 32 MB splits would produce ~5 files per task — thousands of
    # ~6 MB files at sf1+. Coalesce (no shuffle — categories stay on
    # their scan rows) to a byte-derived task count targeting ~256 MB
    # of input per task, floored at two waves of cores so the write
    # stays parallel; the stage tables this corpus backs then carry
    # sanely-sized files into every downstream scan.
    corpus_bytes = bronze.size_stats(spark)["bytes"] or 0
    n_write = max(2 * spark.sparkContext.defaultParallelism,
                  int(corpus_bytes // (256 << 20)))
    corpus = corpus.coalesce(n_write)

    # ---- the one corpus write, category-pure files -------------------
    clean_t = catalog.create_table("imagepipe.clean", bronze.schema(),
                                   properties=_BLOB_TABLE_PROPS)
    out_dir = os.path.join(clean_t.data_dir,
                           f"snap-{uuid.uuid4().hex[:12]}")
    (corpus.write.partitionBy("__cat").mode("append")
     .option("compression", "uncompressed")
     .option("parquet.enable.dictionary", "false")
     .parquet(out_dir))
    _mark("categorized corpus write")
    entries = clean_t._collect_entries(out_dir, clean_t.load_metadata())
    for e in entries:
        seg = next(s for s in e["file_path"].split("/")
                   if s.startswith("__cat="))
        e["__cat"] = seg.split("=", 1)[1]

    def _sub(cats) -> list[dict]:
        # fresh top-level dicts per table: commits stamp snapshot ids
        # and row-id ranges into the entry dicts
        return [
            {k: v for k, v in e.items() if k != "__cat"}
            for e in entries if e["__cat"] in cats
        ]

    def _commit(t, sub: list[dict], src_prop: str) -> dict:
        if sub:
            t.commit_append(sub, summary={"op": "imagepipe-fused"})
        t.update_properties({SRC_PROP: src_prop})
        return {"skipped": False,
                "rows": sum(e["record_count"] for e in sub)}

    def _link_table(name: str, cats) -> tuple:
        t = catalog.create_table(name, bronze.schema(),
                                 properties=_BLOB_TABLE_PROPS)
        sub = _sub(cats)
        for e in sub:
            src = os.path.join(clean_t._local_root, e["file_path"])
            dst = os.path.join(t._local_root, e["file_path"])
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)
        return t, sub

    _mark("footer collect")
    out["clean"] = _commit(clean_t, _sub({"d", "x", "t", "v", "s"}),
                           _sig(bronze))
    cap_sig = (f"#cap{max_caption_repeats}"
               if max_caption_repeats is not None else "")
    dedup_t, sub = _link_table("imagepipe.dedup", {"x", "t", "v", "s"})
    out["dedup"] = _commit(dedup_t, sub,
                           _sig(clean_t) + f"#ham{max_hamming}" + cap_sig)
    src_t = dedup_t
    if benchmark is not None:
        src_t, sub = _link_table("imagepipe.decontaminated", {"t", "v", "s"})
        out["decontaminated"] = _commit(
            src_t, sub, _sig(dedup_t) + f"#dh{decon_hamming}")
    for name, cats in (("train", {"t"}), ("valid", {"v"}), ("test", {"s"})):
        t, sub = _link_table(f"imagepipe.{name}", cats)
        out[name] = _commit(t, sub, _sig(src_t) + f"#{cuts}")

    # ---- dedup index: survivor fingerprints, zero blob reads ----------
    _mark("stage links+commits")
    if _prof:
        import time as _t
        _t0 = _t.time()
        n_ids = ids.count()
        print(f"[fused] ids re-count before index: {_t.time() - _t0:.2f}s "
              f"({n_ids} rows)", flush=True)
        _tlast[0] = _t.time()
    catalog.create_table_as(
        "imagepipe.dedup_index",
        surv.select("image_id", "fp", "phash", "cap_fp"), n_files=4)
    ids.unpersist()
    if gfp is not None:
        gfp.unpersist()
    _mark("dedup index write")
    dedup_t.update_properties(
        {CURSOR_PROP: str(bronze.load_metadata()["last_sequence"])}
    )
    return out


def run_image_pipeline(
    spark: SparkSession,
    catalog: Catalog,
    images: DataFrame | None = None,
    *,
    min_dim: int = 8,
    min_caption_words: int = 2,
    max_hamming: int = 3,
    decode_gate: bool = True,
    benchmark: DataFrame | None = None,
    decon_hamming: int = 3,
    splits: tuple[float, float] = (0.9, 0.05),
    max_caption_repeats: int | None = None,
) -> dict:
    """Run (or resume) the image corpus-prep chain. ``images``
    bootstraps the bronze table on first call; later calls resume from
    whatever state the stage signatures record. ``benchmark`` is a
    frame with a ``phash`` column — the held-out eval set; training
    images within hamming <= ``decon_hamming`` of any eval phash are
    dropped (the image analog of n-gram decontamination; skipped when
    None). ``splits`` = (train, valid) fractions; test takes the
    rest.

    ``max_caption_repeats`` drops BOILERPLATE captions wholesale: a
    caption carried by more than that many distinct (byte-deduped)
    images is watermark/SEO filler ("stock photo", "image may
    contain ..."), and every row bearing it is removed — the LAION
    caption-frequency filter. Deliberately an all-or-nothing drop
    (count + anti-join on md5(caption)): keeping "the first K" of a
    10^8-row boilerplate caption would need a per-caption rank — a
    single-task hot-key window at exactly the captions that are hot.
    Returns per-stage metrics with ``skipped`` flags."""
    out: dict = {}
    if not catalog.table_exists("imagepipe.bronze"):
        if images is None:
            raise ValueError("first run needs images= to bootstrap bronze")
        # Pristine-scan fast path: when ``images`` is an untouched full
        # scan of a lakehouse table (tagged by LakehouseTable.scan) on
        # the SAME filesystem, bronze is a zero-copy CLONE — hard links
        # + one manifest, no 13-GB-per-TB decode/re-encode CTAS pass
        # (guide §8: the bytes already exist; move decisions, not
        # payload). Guards route everything else (pending MOR deletes,
        # mixed partition specs, cross-device catalogs — where the CTAS
        # write is parallel while a copy fallback would be driver-
        # serial) to the ordinary CTAS below. Rows are identical by
        # construction: the clone shares the exact committed files.
        bronze = _clone_bronze_if_pristine(spark, catalog, images)
        if bronze is None:
            # n_files=None: write on the input's natural partitioning —
            # a fixed small file count would funnel the whole payload
            # through one shuffle into that many tasks (guide §2:
            # scale-adaptive partitioning, not a constant)
            bronze = catalog.create_table_as("imagepipe.bronze", images,
                                             properties=_BLOB_TABLE_PROPS)
    else:
        bronze = catalog.load_table("imagepipe.bronze")
    out["bronze"] = {"rows": bronze.size_stats(spark)["rows"]}

    # ---- fused bootstrap: no stage table exists yet -------------------
    # one categorized corpus write + hard-linked stage registration
    # replaces the five sequential stage writes; identical tables,
    # rows, signatures and index (see _fused_fresh_build). Any
    # pre-existing stage table routes to the sequential skip/rebuild
    # logic below — the resume semantics are untouched.
    if not any(catalog.table_exists(n) for n in _STAGE_TABLES):
        out.update(_fused_fresh_build(
            spark, catalog, bronze,
            min_dim=min_dim, min_caption_words=min_caption_words,
            max_hamming=max_hamming, decode_gate=decode_gate,
            benchmark=benchmark, decon_hamming=decon_hamming,
            splits=splits, max_caption_repeats=max_caption_repeats,
        ))
        return out

    # ---- clean: structural gates, then the decode gate ----------------
    # gate_state carries the decode pass's fingerprint side-product to
    # the dedup stage WITHIN this call (one blob read serves both);
    # when clean is skipped/rebuilt independently, dedup falls back to
    # computing fingerprints from its own scan.
    gate_state: dict = {}

    def build_clean() -> DataFrame:
        return _quality_gate(
            bronze.scan(spark), min_dim, min_caption_words, decode_gate,
            fingerprint_state=gate_state,
        )

    clean, out["clean"] = _stage(
        spark, catalog, "imagepipe.clean", _sig(bronze), build_clean,
        properties=_BLOB_TABLE_PROPS,
    )

    # ---- dedup: exact bytes, then phash-hamming components ------------
    # Plan shape (the §8 "decide with small rows, move big rows once"
    # discipline): ONE payload scan produces the metadata-sized ids
    # frame (image_id, phash, byte/caption fingerprints, ~80 B/row);
    # every dedup decision — exact-dup losers, boilerplate captions,
    # near-dup component losers — is computed over that persisted frame
    # only; the blob column is then read exactly once more for the
    # survivor write, gated by a broadcast anti-join on the combined
    # loser set. The payload is never shuffled and never hashed twice.
    dedup_state: dict = {}

    def build_dedup() -> DataFrame:
        d = clean.scan(spark)
        if "gate_fp" in gate_state:
            # the decode-gate pass of THIS call already computed every
            # fingerprint — reuse the persisted metadata frame instead
            # of re-reading every blob for a second md5 pass. The row
            # set must equal the clean TABLE's: same anti-join on the
            # reject ids (filter(ok) would diverge if a duplicated
            # image_id had both an ok and a failing row).
            gfp = gate_state["gate_fp"]
            ids = _drop_ids(
                gfp, gfp.filter(~F.col("ok")).select("image_id")
            ).select("image_id", "phash", "fp", "cap_fp") \
                .repartition(_n_meta(d)).persist()
        else:
            ids = d.select(
                "image_id", "phash", F.md5("bytes").alias("fp"),
                F.md5("caption").alias("cap_fp"),
            ).repartition(_n_meta(d)).persist()
        ids.count()  # one cache fill before the decision fan-out (see
        # _fused_fresh_build: AQE subtrees race an unmaterialized cache)
        drop = _dedup_drop_set(ids, max_hamming, max_caption_repeats)
        dedup_state["ids"] = ids
        dedup_state["drop"] = drop
        return _drop_ids(d, drop)

    cap_sig = (f"#cap{max_caption_repeats}"
               if max_caption_repeats is not None else "")
    dedup, out["dedup"] = _stage(
        spark, catalog, "imagepipe.dedup",
        _sig(clean) + f"#ham{max_hamming}" + cap_sig, build_dedup,
        properties=_BLOB_TABLE_PROPS,
    )

    # ---- decontaminate: eval-set phash proximity -----------------------
    src = dedup
    if benchmark is not None:
        def build_decon() -> DataFrame:
            d = dedup.scan(spark)
            bench = benchmark.select(
                F.col("phash").alias("sig")
            ).distinct().withColumn("id", F.lit(0))
            dirty = hamming_join(
                d.select(F.col("image_id").alias("id"),
                         F.col("phash").alias("sig")),
                bench, max_hamming=decon_hamming,
            ).select(F.col("ida").alias("image_id")).distinct()
            return _drop_ids(d, dirty)

        src, out["decontaminated"] = _stage(
            spark, catalog, "imagepipe.decontaminated",
            _sig(dedup) + f"#dh{decon_hamming}", build_decon,
            properties=_BLOB_TABLE_PROPS,
        )

    # ---- splits: deterministic hash buckets ---------------------------
    t_frac, v_frac = splits
    bucket = F.pmod(
        F.xxhash64(F.col("image_id"), F.lit("imagepipe-split")), F.lit(10_000)
    )
    cuts = (int(t_frac * 10_000), int((t_frac + v_frac) * 10_000))

    def run_split(name_cond):
        name, cond = name_cond

        def build_split():
            return src.scan(spark).filter(cond)

        return name, _stage(
            spark, catalog, f"imagepipe.{name}",
            _sig(src) + f"#{cuts}", build_split,
            properties=_BLOB_TABLE_PROPS,
        )[1]

    # The three split builds are independent single-table jobs over
    # disjoint filters; overlapping them lets each write's straggler
    # tail back-fill the others' tasks (guide §2.6) instead of three
    # sequential ramp-downs. Results are order-independent (disjoint
    # hash buckets, separate tables); `out` keeps train/valid/test
    # insertion order.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        for name, metrics in pool.map(run_split, (
            ("train", bucket < cuts[0]),
            ("valid", (bucket >= cuts[0]) & (bucket < cuts[1])),
            ("test", bucket >= cuts[1]),
        )):
            out[name] = metrics

    # ---- dedup index + incremental cursor ------------------------------
    # The index is the metadata-sized projection (image_id, fp, phash)
    # of the survivor set — what incremental_image_update joins new
    # arrivals against WITHOUT rescanning existing blobs. ~40 B/row:
    # at 10^12 images the index is tens of GB while the corpus is
    # 100 TB+ of payload.
    if not out["dedup"]["skipped"] or not catalog.table_exists(
        "imagepipe.dedup_index"
    ):
        if "ids" in dedup_state:
            # fresh dedup build: the survivor fingerprints are already
            # in the persisted metadata frame — zero blob reads here
            idx_df = _drop_ids(dedup_state["ids"], dedup_state["drop"]).select(
                "image_id", "fp", "phash",
                # caption fingerprint: lets the incremental path count
                # caption frequency against the corpus without
                # re-reading any blob or caption text (~16 B/row)
                "cap_fp",
            )
        else:
            # stage skipped but the index is missing/stale: re-derive
            # from the materialized dedup table (one blob scan)
            idx_df = dedup.scan(spark).select(
                "image_id", F.md5("bytes").alias("fp"), "phash",
                F.md5("caption").alias("cap_fp"),
            )
        if catalog.table_exists("imagepipe.dedup_index"):
            idx_t = catalog.load_table("imagepipe.dedup_index")
            if "cap_fp" not in [f.name for f in idx_t.schema().fields]:
                # pre-cap_fp index: derivable metadata, rebuild clean
                catalog.drop_table("imagepipe.dedup_index", purge=True)
                catalog.create_table_as("imagepipe.dedup_index", idx_df,
                                        n_files=4)
            else:
                idx_t.overwrite(idx_df)
        else:
            catalog.create_table_as("imagepipe.dedup_index", idx_df, n_files=4)
    if "ids" in dedup_state:
        dedup_state["ids"].unpersist()
    if "gate_fp" in gate_state:
        gate_state["gate_fp"].unpersist()
    dedup.update_properties(
        {CURSOR_PROP: str(bronze.load_metadata()["last_sequence"])}
    )
    return out


def incremental_image_update(
    spark: SparkSession,
    catalog: Catalog,
    *,
    min_dim: int = 8,
    min_caption_words: int = 2,
    max_hamming: int = 3,
    decode_gate: bool = True,
    benchmark: DataFrame | None = None,
    decon_hamming: int = 3,
    splits: tuple[float, float] = (0.9, 0.05),
    max_caption_repeats: int | None = None,
) -> dict:
    """Fold rows appended to ``imagepipe.bronze`` since the last run
    into the downstream stages WITHOUT rebuilding them — the 100 TB
    steady-state path (a full rebuild re-reads every blob; an
    increment reads only the new blobs plus the metadata-sized dedup
    index):

      * new rows = ``bronze.scan(updated_since=cursor)`` — file-seq
        pruning keeps the read proportional to the change volume;
      * the same quality gates admit them; admitted rows APPEND to
        ``imagepipe.clean``;
      * exact dedup joins new fingerprints against the index (never
        the existing blobs); near-dup runs hamming components over
        the DISTINCT phashes of index+batch;
      * canonical choice is FIRST-SEEN: a new row near an existing
        survivor always loses, survivors are never retracted
        (increments are append-only; a full ``run_image_pipeline``
        rebuild restores global-min-id canonicalization);
      * every downstream append (clean, dedup, index, decontaminated,
        splits) publishes as ONE multi-table transaction — all visible
        together or none; the cursor property advances after the
        commit;
      * when the full build created a ``imagepipe.decontaminated``
        stage, ``benchmark`` must be passed again: survivors are
        decon-filtered before landing there and in the splits (dedup
        and the index still see every survivor).

    Returns ``{"new_rows", "admitted", "appended", "splits": {...}}``.
    """
    bronze = catalog.load_table("imagepipe.bronze")
    dedup = catalog.load_table("imagepipe.dedup")
    has_decon = catalog.table_exists("imagepipe.decontaminated")
    if has_decon and benchmark is None:
        # fail BEFORE any read or write — a mid-flow failure here would
        # otherwise leave dedup fed but splits starved
        raise ValueError(
            "the pipeline has a decontaminated stage — pass benchmark="
        )
    cur = dedup.properties().get(CURSOR_PROP)
    if cur is None:
        raise ValueError("no cursor — run run_image_pipeline() first")
    cursor = int(cur)
    last = bronze.load_metadata()["last_sequence"]
    if last <= cursor:
        return {"new_rows": 0, "admitted": 0, "appended": 0, "splits": {}}

    new = bronze.scan(spark, updated_since=cursor)
    n_new = new.count()
    gated = _quality_gate(new, min_dim, min_caption_words, decode_gate).persist()
    admitted = gated.count()
    if admitted == 0:
        gated.unpersist()
        dedup.update_properties({CURSOR_PROP: str(last)})
        return {"new_rows": n_new, "admitted": 0, "appended": 0, "splits": {}}

    index = catalog.load_table("imagepipe.dedup_index")
    idx = index.scan(spark)
    # exact: batch-internal min-id per fingerprint, then drop
    # fingerprints the corpus already holds
    fp = gated.withColumn("fp", F.md5("bytes"))
    batch_keep = fp.groupBy("fp").agg(F.min("image_id").alias("image_id"))
    fp = fp.join(batch_keep, ["fp", "image_id"], "left_semi")
    fp = fp.join(idx.select("fp"), "fp", "left_anti")
    if max_caption_repeats is not None:
        # boilerplate-caption gate, incremental form: frequency =
        # corpus count (the index's cap_fp column — metadata-sized,
        # no blob read) + this batch's count; an over-cap caption
        # drops its NEW rows wholesale. Existing survivors stay
        # (append-only, same first-seen rule as dedup) — a full
        # rebuild re-applies the cap globally.
        if "cap_fp" not in idx.columns:
            raise ValueError(
                "dedup_index has no cap_fp column — run "
                "run_image_pipeline() once to rebuild it before using "
                "max_caption_repeats incrementally"
            )
        fp = fp.withColumn("cap_fp", F.md5("caption"))
        combined = (
            idx.select("cap_fp").unionByName(fp.select("cap_fp"))
            .groupBy("cap_fp").agg(F.count("*").alias("__n"))
        )
        boiler = combined.filter(
            F.col("__n") > max_caption_repeats).select("cap_fp")
        fp = fp.join(boiler, "cap_fp", "left_anti").drop("cap_fp")
    # near-dup: components over DISTINCT phashes of index + batch.
    # Existing-existing edges cannot exist (survivors are pairwise
    # > max_hamming by construction), so every component with an
    # existing member was pulled in by a new phash.
    nodes = idx.select("phash").union(fp.select("phash")).distinct()
    pairs = hamming_pairs(
        nodes.select(F.col("phash").alias("id"), F.col("phash").alias("sig")),
        max_hamming=max_hamming,
    )
    labels = connected_components(pairs, src="ida", dst="idb")
    canon = nodes.join(labels, nodes["phash"] == labels["id"], "left").select(
        "phash", F.coalesce("component", "phash").alias("__comp")
    )
    taken = idx.join(canon, "phash").select("__comp").distinct()
    new_comp = fp.join(canon, "phash")
    # first-seen pinning: drop any component an existing survivor owns
    new_comp = new_comp.join(taken, "__comp", "left_anti")
    winners = new_comp.groupBy("__comp").agg(F.min("image_id").alias("image_id"))
    kept = new_comp.join(
        winners.select("image_id"), "image_id", "left_semi"
    ).persist()
    appended = kept.count()
    # ---- one atomic multi-table publish --------------------------------
    # All downstream appends ride a single write-ahead-journaled
    # transaction (tableformat/catalog.py CatalogTransaction): clean,
    # dedup, the index, decontaminated and the splits become visible
    # together or not at all — a crash mid-increment can never leave
    # dedup fed but splits starved. The cursor property advances only
    # after the commit; a crash in that window re-processes the batch,
    # where every row is an index fingerprint dup (appended=0), so the
    # only at-least-once table is `clean`.
    txn = catalog.transaction()
    txn.stage_append("imagepipe.clean", gated)
    if appended == 0:
        txn.commit()
        kept.unpersist()
        gated.unpersist()
        dedup.update_properties({CURSOR_PROP: str(last)})
        return {"new_rows": n_new, "admitted": admitted, "appended": 0,
                "splits": {}}

    cols = [c for c in kept.columns if c not in ("fp", "__comp")]
    txn.stage_append("imagepipe.dedup", kept.select(*cols))
    idx_cols = ["image_id", "fp", "phash"]
    if "cap_fp" in idx.columns:
        idx_cols.append(F.md5("caption").alias("cap_fp"))
    txn.stage_append("imagepipe.dedup_index", kept.select(*idx_cols))

    downstream = kept.select(*cols)
    if has_decon:
        bench = benchmark.select(
            F.col("phash").alias("sig")
        ).distinct().withColumn("id", F.lit(0))
        dirty = hamming_join(
            downstream.select(F.col("image_id").alias("id"),
                              F.col("phash").alias("sig")),
            bench, max_hamming=decon_hamming,
        ).select(F.col("ida").alias("image_id")).distinct()
        downstream = downstream.join(dirty, "image_id", "left_anti").persist()
        if downstream.count():
            txn.stage_append("imagepipe.decontaminated", downstream)

    t_frac, v_frac = splits
    bucket = F.pmod(
        F.xxhash64(F.col("image_id"), F.lit("imagepipe-split")), F.lit(10_000)
    )
    cuts = (int(t_frac * 10_000), int((t_frac + v_frac) * 10_000))
    out_splits: dict[str, int] = {}
    for name, cond in (
        ("train", bucket < cuts[0]),
        ("valid", (bucket >= cuts[0]) & (bucket < cuts[1])),
        ("test", bucket >= cuts[1]),
    ):
        part = downstream.filter(cond)
        out_splits[name] = part.count()
        if out_splits[name]:
            txn.stage_append(f"imagepipe.{name}", part)
    txn.commit()
    kept.unpersist()
    gated.unpersist()
    dedup.update_properties({CURSOR_PROP: str(last)})
    return {
        "new_rows": n_new,
        "admitted": admitted,
        "appended": appended,
        "splits": out_splits,
    }


def export_train_shards(
    spark: SparkSession,
    catalog: Catalog,
    out_dir: str,
    target_bytes: int = 512 << 20,
    seed: int = 42,
    snapshot_id: int | None = None,
) -> dict:
    """Ship ``imagepipe.train`` as deterministic byte-balanced shards
    (operators/training_export.write_shards): one sorted parquet file
    per ~``target_bytes`` of payload in md5-shuffled order, with a
    shard manifest and per-shard resume. The weight is the encoded
    blob size (``octet_length(bytes)``), so shards balance actual I/O,
    not row counts — at 10^12 scale a row-count split would skew 5x
    between thumbnail- and panorama-heavy shards.

    Pinning ``snapshot_id`` exports a reproducible corpus version even
    while incremental updates keep appending to the split (time-travel
    read of the same lakehouse table); the assignment is a pure
    function of (ids, blob sizes, seed), so a resumed or repeated
    export of the same snapshot is byte-identical."""
    from ..operators.training_export import write_shards

    train = catalog.load_table("imagepipe.train")
    df = train.scan(spark, snapshot_id=snapshot_id).withColumn(
        "_nbytes", F.octet_length(F.col("bytes"))
    )
    res = write_shards(spark, df, "image_id", "_nbytes", out_dir,
                       target_bytes=target_bytes, seed=seed)
    res["snapshot"] = (snapshot_id if snapshot_id is not None
                       else train.current_snapshot().snapshot_id)
    return res
