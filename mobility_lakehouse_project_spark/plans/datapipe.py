"""Training-corpus preparation pipeline over lakehouse tables — the
LLM-data twin of the mobility medallion (plans/medallion.py; reference:
the bronze->silver->gold DAG chain, /root/reference/dags/). One call
runs the standard corpus-prep chain, each stage a snapshot-versioned
lakehouse table:

    datapipe.bronze          raw documents (COPY INTO / bootstrap CTAS)
    datapipe.clean           quality filter + PII redaction
    datapipe.dedup           exact + MinHash-LSH near-dup (connected
                             components, keep the canonical doc)
    datapipe.decontaminated  benchmark n-gram overlap removal
    datapipe.train/valid/test  deterministic hash splits

Resumability is at STAGE granularity: every output table records its
input's ``table@snapshot`` signature in the ``datapipe.src`` property;
a re-run recomputes a stage ONLY when its input signature moved (the
same idiom as the per-partition lineage log, at coarser grain). A
stage rebuild is a one-commit ``overwrite`` — history preserved,
readers never see a half-built stage.

Scale notes: every transform is pure-Catalyst or Arrow-batched
(minhash UDF); near-dup verification cost is proportional to
candidate volume, not corpus size (operators/dedup.py); splits are
hash-deterministic so re-runs and backfills land rows in the same
split. At 100 TB the only corpus-sized shuffles are the dedup band
join and the split write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedup import connected_components, minhash_lsh_exact_pairs
from ..tableformat.catalog import Catalog

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3,4}[-.]?\d{0,4}\b"
SRC_PROP = "datapipe.src"


def _sig(table) -> str:
    s = table.current_snapshot()
    return f"{table.location}@{s.snapshot_id if s else 0}"


def _stage(spark, catalog: Catalog, name: str, src_sig: str, build,
           properties: dict | None = None):
    """Skip-or-rebuild one stage: rebuild only when the input signature
    moved; rebuilds are single overwrite commits. ``properties`` seeds
    table properties at creation (e.g. the parquet codec for
    blob-payload stages — see plans/imagepipe._BLOB_TABLE_PROPS)."""
    if catalog.table_exists(name):
        t = catalog.load_table(name)
        if t.properties().get(SRC_PROP) == src_sig:
            rows = t.size_stats(spark)["rows"]
            return t, {"skipped": True, "rows": rows}
        t.overwrite(build())
    else:
        # natural partitioning (no n_files): a fixed tiny file count
        # would repartition the stage's full payload into that many
        # tasks — the write must scale with the input, and these
        # intermediate tables are compacted by normal maintenance if
        # their file sizes matter downstream
        t = catalog.create_table_as(name, build(), properties=properties)
    t.update_properties({SRC_PROP: src_sig})
    return t, {"skipped": False, "rows": t.size_stats(spark)["rows"]}


def run_data_pipeline(
    spark: SparkSession,
    catalog: Catalog,
    docs: DataFrame | None = None,
    source_glob: str | None = None,
    *,
    min_words: int = 5,
    max_word_rep: float = 0.6,
    dedup_threshold: float = 0.8,
    benchmark: DataFrame | None = None,
    contamination_ngram: int = 3,
    splits: tuple[float, float] = (0.9, 0.05),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Run (or resume) the corpus-prep chain. ``docs`` bootstraps the
    bronze table on first call; ``source_glob`` ingests landing files
    exactly-once per run (operators/copy_into.py). ``benchmark`` is
    the eval corpus to decontaminate against (skipped when None).
    ``splits`` = (train, valid) fractions; test takes the rest.
    Returns per-stage metrics with ``skipped`` flags."""
    out: dict = {}
    # ---- bronze ------------------------------------------------------
    if not catalog.table_exists("datapipe.bronze"):
        if docs is None:
            raise ValueError("first run needs docs= to bootstrap bronze")
        bronze = catalog.create_table_as("datapipe.bronze", docs)
    else:
        bronze = catalog.load_table("datapipe.bronze")
    if source_glob is not None:
        from ..operators.copy_into import copy_into

        out["ingest"] = copy_into(bronze, spark, source_glob)
    out["bronze"] = {"rows": bronze.size_stats(spark)["rows"]}
    sig = _sig(bronze)

    # ---- clean: quality gates + PII redaction ------------------------
    def build_clean() -> DataFrame:
        d = bronze.scan(spark)
        w = F.split(F.col(text_col), " ")
        n_words = F.size(F.filter(w, lambda x: x != ""))
        rep = F.lit(1.0) - F.size(F.array_distinct(w)) / F.size(w)
        red = F.regexp_replace(
            F.regexp_replace(text_col, EMAIL_RE, "<EMAIL>"),
            PHONE_RE, "<PHONE>")
        return (d.withColumn("__nw", n_words).withColumn("__rep", rep)
                .filter((F.col("__nw") >= min_words)
                        & (F.col("__rep") <= max_word_rep))
                .withColumn(text_col, red)
                .drop("__nw", "__rep"))

    clean, out["clean"] = _stage(spark, catalog, "datapipe.clean",
                                 sig, build_clean)

    # ---- dedup: exact fingerprint, then near-dup components ----------
    def build_dedup() -> DataFrame:
        d = clean.scan(spark)
        # exact: one survivor (min id) per text fingerprint
        keep = (d.groupBy(F.md5(text_col).alias("__fp"))
                .agg(F.min(id_col).alias(id_col)))
        d = d.join(keep.select(id_col), id_col, "left_semi")
        # near-dup: LSH candidates -> exact-Jaccard verify -> CC ->
        # keep each component's min id
        pairs = minhash_lsh_exact_pairs(
            spark, d, id_col=id_col, text_col=text_col,
            threshold=dedup_threshold)
        labels = connected_components(pairs, src="ida", dst="idb")
        losers = (labels.filter(F.col("id") != F.col("component"))
                  .select(F.col("id").alias(id_col)))
        return d.join(losers, id_col, "left_anti")

    dedup, out["dedup"] = _stage(spark, catalog, "datapipe.dedup",
                                 _sig(clean), build_dedup)

    # ---- decontaminate: benchmark n-gram overlap ----------------------
    src = dedup
    if benchmark is not None:
        def grams(df: DataFrame, ident) -> DataFrame:
            w = F.split(F.col(text_col), " ")
            n = contamination_ngram
            # n-grams via a transform over start indices (pure
            # Catalyst, no explode-join). The short-doc case needs an
            # explicit empty branch: sequence(0, negative) DESCENDS
            # ([0,-1]) and ANSI element_at rejects index 0.
            idx = F.when(
                F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)
            ).otherwise(F.array().cast("array<int>"))
            g = F.transform(idx, lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j + 1) for j in range(n)]))
            return df.select(ident, F.explode(g).alias("__gram"))

        def build_decon() -> DataFrame:
            d = dedup.scan(spark)
            bench_grams = grams(benchmark, F.lit(1).alias("__one")) \
                .select("__gram").distinct()
            dirty = (grams(d, F.col(id_col))
                     .join(F.broadcast(bench_grams), "__gram", "left_semi")
                     .select(id_col).distinct())
            return d.join(dirty, id_col, "left_anti")

        src, out["decontaminated"] = _stage(
            spark, catalog, "datapipe.decontaminated",
            _sig(dedup) + f"#ng{contamination_ngram}", build_decon)

    # ---- splits: deterministic hash buckets ---------------------------
    t_frac, v_frac = splits
    bucket = F.pmod(F.xxhash64(F.col(id_col).cast("string"),
                               F.lit("datapipe-split")), F.lit(10_000))
    cuts = (int(t_frac * 10_000), int((t_frac + v_frac) * 10_000))
    for name, cond in (
        ("train", bucket < cuts[0]),
        ("valid", (bucket >= cuts[0]) & (bucket < cuts[1])),
        ("test", bucket >= cuts[1]),
    ):
        def build_split(cond=cond):
            return src.scan(spark).filter(cond)

        _, out[name] = _stage(
            spark, catalog, f"datapipe.{name}",
            _sig(src) + f"#{cuts}", build_split)
    return out
