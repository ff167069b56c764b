"""Corpus-prep pipeline (plans/datapipe.py): quality -> PII -> dedup ->
decontamination -> splits, with stage-level skip/resume."""

import pytest
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.plans.datapipe import run_data_pipeline
from mobility_lakehouse_project_spark.tableformat import Catalog


@pytest.fixture()
def cat(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def _corpus(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, f"{base} doc{i} " + " ".join(f"w{i}x{j}" for j in range(8)),
             "en") for i in range(20)]
    rows += [
        (100, rows[3][1], "en"),                      # exact dup of doc 3
        (101, rows[4][1] + " tail", "en"),            # near dup of doc 4
        (102, "tiny doc", "en"),                      # too short
        (103, "spam spam spam spam spam spam ham", "en"),  # repetitive
        (104, base + " mail me bob@example.com or 555-0133 now "
              + " ".join(f"u{j}" for j in range(6)), "en"),   # PII
        (105, base + " the secret benchmark passage here plus "
              + " ".join(f"v{j}" for j in range(8)), "en"),   # contaminated
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _bench(spark):
    return spark.createDataFrame(
        [(1, "unrelated words then secret benchmark passage end")],
        "bid long, text string")


def test_pipeline_end_to_end_and_resume(spark, cat):
    docs = _corpus(spark)
    out = run_data_pipeline(spark, cat, docs=docs,
                            benchmark=_bench(spark),
                            contamination_ngram=3)
    assert out["bronze"]["rows"] == 26
    # quality: 102 (short) and 103 (repetition 6/7) removed
    assert out["clean"]["rows"] == 24
    clean_ids = {r["doc_id"] for r in
                 cat.load_table("datapipe.clean").scan(spark).collect()}
    assert 102 not in clean_ids and 103 not in clean_ids
    # PII redacted in place
    red = (cat.load_table("datapipe.clean").scan(spark)
           .filter("doc_id = 104").collect()[0]["text"])
    assert "<EMAIL>" in red and "<PHONE>" in red
    assert "bob@example.com" not in red and "555-0133" not in red
    # dedup: exact dup 100 and near dup 101 lose to lower ids
    dd_ids = {r["doc_id"] for r in
              cat.load_table("datapipe.dedup").scan(spark).collect()}
    assert 100 not in dd_ids and 101 not in dd_ids
    assert 3 in dd_ids and 4 in dd_ids
    assert out["dedup"]["rows"] == 22
    # decontamination: 105 shares the benchmark 3-gram
    dc_ids = {r["doc_id"] for r in
              cat.load_table("datapipe.decontaminated").scan(spark).collect()}
    assert 105 not in dc_ids and len(dc_ids) == 21
    # splits partition the decontaminated set exactly
    n = sum(out[k]["rows"] for k in ("train", "valid", "test"))
    assert n == 21
    # resume: nothing moved -> every stage skipped
    out2 = run_data_pipeline(spark, cat, benchmark=_bench(spark),
                             contamination_ngram=3)
    for k in ("clean", "dedup", "decontaminated", "train", "valid", "test"):
        assert out2[k]["skipped"] is True, k
    # splits are hash-deterministic across runs
    t1 = {r["doc_id"] for r in
          cat.load_table("datapipe.train").scan(spark).collect()}
    assert t1 <= dc_ids


def test_pipeline_incremental_rebuild_on_new_data(spark, cat, tmp_path):
    docs = _corpus(spark)
    run_data_pipeline(spark, cat, docs=docs, benchmark=_bench(spark))
    # new landing files arrive -> COPY INTO moves bronze -> stages rerun
    more = spark.createDataFrame(
        [(200 + i, "fresh words " + " ".join(f"n{i}q{j}" for j in range(9)),
          "en") for i in range(5)],
        "doc_id long, text string, lang string")
    land = str(tmp_path / "landing")
    more.coalesce(1).write.parquet(land)
    out = run_data_pipeline(spark, cat, source_glob=f"{land}/*.parquet",
                            benchmark=_bench(spark))
    assert out["ingest"]["files_loaded"] == 1
    assert out["bronze"]["rows"] == 31
    assert out["clean"]["skipped"] is False
    assert out["clean"]["rows"] == 29
    n = sum(out[k]["rows"] for k in ("train", "valid", "test"))
    assert n == out["decontaminated"]["rows"]
    # rerun with the same landing glob: ingest no-ops, stages skip
    out3 = run_data_pipeline(spark, cat, source_glob=f"{land}/*.parquet",
                             benchmark=_bench(spark))
    assert out3["ingest"]["files_loaded"] == 0
    assert out3["clean"]["skipped"] is True
