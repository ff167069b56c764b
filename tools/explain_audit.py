"""Physical-plan audit: dump .explain("formatted") for the headline
queries and grep for the properties the 100 TB design depends on —
parquet filter pushdown (PushedFilters), column pruning (ReadSchema),
broadcast joins for dims, whole-stage codegen coverage. Writes
BENCH/EXPLAIN.md for review. Usage: python tools/explain_audit.py
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, ".")

from mobility_lakehouse_project_spark.plans.relational import QUERIES
from mobility_lakehouse_project_spark.session import get_spark

AUDIT = [
    "p_filter_project",      # expect PushedFilters on l_quantity/l_discount
    "a1_groupby_sums",       # expect partial+final HashAggregate, pushdown on shipdate
    "j1_fact_dim_inner",     # expect BroadcastHashJoin for customer
    "gold_od_matrix_top",    # expect 4x BroadcastHashJoin, TakeOrderedAndProject absent (rank after limit)
    "gold_gravity_model",    # expect broadcast mass joins
    "w_partitioned_topk",    # expect single shuffle for window
    "ann_cosine_topk",       # expect no python UDF (JVM higher-order fns)
    "dedup_simhash",         # expect NO Python UDF (pure Catalyst simhash)
    "ann_lsh_bucketed",      # expect NO Python UDF (Catalyst bucket expr)
    "dedup_embed_cosine",    # expect no python UDF; join, not cartesian of blobs
    "txt_quality_score",     # expect single HashAggregate pair, no UDF
    "ann_ivf_probe",         # expect NO Python UDF (fixed-quantizer cells in Catalyst)
    "ann_lsh_clustered",     # expect NO Python UDF + pruned file scan (bucket = partition key)
    "emb_label_profile",     # expect per-row pre-sum: one HashAggregate pair, NO Generate/explode
    "ann_batch_join",        # expect bucket EQUI-join (broadcast), Window rank, NO Python, NO cartesian
    "ann_batch_clustered",   # persisted twin: pruned scan + bucket equi-join, NO Python
    "mor_delete_scan",       # expect broadcast LEFT-ANTI delete join; data side never shuffles
    "cdc_changelog_scan",    # expect changelog union + broadcast semi for delete rows, NO Python
    "bloom_point_lookup",    # expect tiny pruned file scans (bloom file skipping) + pushed key filter
    "txt_token_bpe",         # expect NO Python UDF (Catalyst regexp_extract_all), one agg pair
    "dedup_cc_canonical",    # expect joins over doc ids only (no text in the shuffle)
    "sample_hash_mod",       # hash residue can't push to parquet; expect column-pruned scan
    "addfiles_scan",         # imported-by-link table: column-pruned scan, one agg pair, NO Python
    "txt_decontaminate",     # gram semi-join: expect BROADCAST left-semi (bench side small), NO Python
    "txt_dedup_keep_best",   # expect ONE Window over the fingerprint shuffle, no self-join
    "ds_source_roundtrip",   # python data source scan: BatchScan of pruned file splits
    "stats_agg_pushdown",    # expect NO FileScan at all — answered from manifest stats
    "txt_pii_scrub",         # expect NO Python UDF (Catalyst regexp kernels), one agg pair
    "txt_vocab_bigrams",     # expect NO Python (slice+zip_with bigrams), top-k via TakeOrdered
    "train_shard_plan",      # two-phase prefix sum: bucketed Window, pruned scan, NO Python
    "train_aspect_batches",  # two-phase per-bucket numbering: bucketed Window, pruned scan, NO Python
    "ann_pq_adc",            # PQ/ADC: NO Python (integer-exact Catalyst encode + LUT taps), top-k
    "txt_repeated_spans",    # window spans via sequence/transform/slice: NO per-token explode, one agg
    "txt_bigram_lm_score",   # LM joins not force-broadcast (AQE decides); NO Python; TakeOrdered top-20
    "ann_ivfpq",             # cell-pruned scan + code-column ADC + broadcast-semi rerank, NO Python
    "dedup_semantic",        # cell EQUI-join (never cartesian), NO Python quantizer
    "txt_ngram_containment", # gram equi-join blocking, NO Python, pruned scan
    "j_asof_last_click",     # as-of via union+window: NO JOIN operator at all
    "j_range_interval_join", # bucketed range join: equi-join, never cartesian
    "w_funnel_conversion",   # one window pass on user_id, NO Python
    "a_cohort_retention",    # agg-only cohort matrix, pruned scan
    "a_time_ohlc",           # min_by/max_by OHLC: ONE agg pair, NO window/sort
    "w_range_moving_avg",    # RANGE frame: one keyed window, NO Python
]

CHECKS = {
    "p_filter_project": ["PushedFilters: [", "IsNotNull"],
    "a1_groupby_sums": ["HashAggregate", "PushedFilters: ["],
    "j1_fact_dim_inner": ["BroadcastHashJoin"],
    "gold_od_matrix_top": ["BroadcastHashJoin"],
    "gold_gravity_model": ["BroadcastHashJoin"],
    "w_partitioned_topk": ["Window"],
    "ann_cosine_topk": ["TakeOrderedAndProject"],  # higher-order fns are not codegen'd; top-k must be
    "dedup_simhash": ["HashAggregate"],
    "ann_lsh_bucketed": ["TakeOrderedAndProject"],
    "dedup_embed_cosine": [],
    "txt_quality_score": ["HashAggregate"],
    "ann_ivf_probe": ["TakeOrderedAndProject"],
    "ann_lsh_clustered": ["TakeOrderedAndProject"],
    "emb_label_profile": ["HashAggregate"],
    "ann_batch_join": ["BroadcastHashJoin", "Window"],
    "txt_decontaminate": ["BroadcastHashJoin"],
    "txt_dedup_keep_best": ["Window", "HashAggregate"],
    "ds_source_roundtrip": ["HashAggregate"],
    "ann_batch_clustered": ["BroadcastHashJoin", "Window"],
    # LeftAnti over a BROADCAST of the delete set: the data side (the
    # blob-carrying scan) must not shuffle to apply MOR deletes, and
    # the aggregation pushes filters/pruning through the join
    "mor_delete_scan": ["BroadcastHashJoin", "LeftAnti", "HashAggregate"],
    "cdc_changelog_scan": ["BroadcastHashJoin", "LeftSemi", "HashAggregate"],
    # the key predicate must reach the (already bloom-pruned) scans
    "bloom_point_lookup": ["Union", "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey"],
    "txt_token_bpe": ["HashAggregate"],
    # the iterative component labels are materialized by eager
    # localCheckpoints (lineage truncation — dedup.connected_components),
    # so the FINAL plan is the checkpointed label scan + cluster-size
    # window; the jaccard/CC algebra is audited through its per-round
    # plans, which the checkpoint keeps constant-depth
    # small near-dup graphs label via the driver union-find and come
    # back as an Arrow-built LOCAL relation (LocalTableScan — no RDD,
    # no Python in the plan); large graphs take the distributed loop
    "dedup_cc_canonical": ["Window", "LocalTableScan"],
    # the md5-residue predicate is computed, not pushable — the scan must
    # still be column-pruned to exactly the 5 referenced columns
    "sample_hash_mod": ["HashAggregate", "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_extendedprice:double,l_discount:double,l_returnflag:string>"],
    # a zero-copy-imported table must scan exactly like a native one:
    # pruned to the 3 referenced columns, partial+final aggregation
    "addfiles_scan": ["HashAggregate", "ReadSchema: struct<doc_id:bigint,lang:string,n_chars:bigint>"],
    "stats_agg_pushdown": ["Range"],  # a 1-row Range, nothing else
    "txt_pii_scrub": ["HashAggregate",
                      "ReadSchema: struct<doc_id:bigint,text:string,lang:string>"],
    "txt_vocab_bigrams": ["TakeOrderedAndProject", "HashAggregate"],
    # two-phase prefix sums: scans pruned to exactly the id+weight
    # columns; the data-row window partitions by the key-prefix bucket
    # (the test suite separately forbids single-partition exchanges
    # over data rows — test_training_export)
    "train_shard_plan": ["Window", "HashAggregate",
                         "ReadSchema: struct<doc_id:bigint,n_chars:bigint>"],
    "train_aspect_batches": ["Window", "HashAggregate",
                             "ReadSchema: struct<p_partkey:bigint,p_size:int>"],
    "ann_pq_adc": ["TakeOrderedAndProject"],
    # the span windows come from ONE higher-order-function pass over
    # the token array (a single Generate of 8-token spans, never a
    # per-token explode), then one partial+final aggregate pair; scan
    # pruned to exactly (doc_id, text)
    "txt_repeated_spans": ["HashAggregate",
                           "ReadSchema: struct<doc_id:bigint,text:string>"],
    "txt_bigram_lm_score": ["TakeOrderedAndProject", "HashAggregate",
                            "ReadSchema: struct<doc_id:bigint,text:string,lang:string>"],
    # ADC pass reads only (vec_id, pq_*): the embedding column must be
    # pruned out of the shortlist scan; rerank joins a broadcast
    # semi-join of the shortlist ids
    "ann_ivfpq": ["TakeOrderedAndProject", "BroadcastHashJoin", "LeftSemi"],
    # the within-cell candidate join must be an EQUI-join on the cell
    # id (SemDeDup's blocking; hash/sort-merge both fine) — the
    # NO-CARTESIAN gate below is the load-bearing assertion
    "dedup_semantic": ["HashAggregate"],
    # gram-blocked directional containment: equi-join candidate
    # generation, scan pruned to exactly (doc_id, text)
    "txt_ngram_containment": ["HashAggregate",
                              "ReadSchema: struct<doc_id:bigint,text:string>"],
    # the as-of composition: one window over the keyed union; the
    # NO-JOIN gate below is the load-bearing assertion (a Join here
    # means the op degraded to a range join).  The click dedup is a
    # struct-keyed max -> SortAggregate (structs aren't hash-aggregable)
    "j_asof_last_click": ["Window", "Union", "Aggregate"],
    # containment becomes an equi-join on the hour bucket; the explode
    # is per-interval (bounded), never per-point
    "j_range_interval_join": ["Window", "HashAggregate"],
    # one window pass on the user partition (single exchange), then a
    # global aggregate unpivoted with stack() — no per-stage re-scans
    "w_funnel_conversion": ["Window", "HashAggregate"],
    "a_cohort_retention": ["HashAggregate",
                           "ReadSchema: struct<ts:timestamp_ntz,user_id:bigint>"],
    # ordered-first/last via struct-keyed min_by/max_by: partial+final
    # SortAggregate (struct ordering keys can't hash-agg) — the sorts
    # are per-input-partition partial-agg sorts; only per-group partial
    # rows cross the single exchange.  The NO-WINDOW gate is the
    # load-bearing one: a Window here would shuffle+sort EVERY fact row
    "a_time_ohlc": ["SortAggregate",
                    "ReadSchema: struct<event_id:bigint,ts:timestamp_ntz,value:double>"],
    "w_range_moving_avg": ["Window",
                           "ReadSchema: struct<event_id:bigint,ts:timestamp_ntz,user_id:bigint,value:double>"],
}

# plans that must read NO data file at all (metadata-only answers)
NO_FILESCAN = {"stats_agg_pushdown"}

# plans that must contain NO row-at-a-time or Arrow Python evaluation
NO_PYTHON = {"dedup_simhash", "ann_lsh_bucketed", "dedup_embed_cosine",
             "txt_quality_score", "ann_cosine_topk", "ann_ivf_probe",
             "ann_lsh_clustered", "emb_label_profile", "ann_batch_join",
             "ann_batch_clustered", "mor_delete_scan", "cdc_changelog_scan",
             "bloom_point_lookup", "txt_token_bpe", "dedup_cc_canonical",
             "sample_hash_mod", "addfiles_scan", "stats_agg_pushdown",
             "txt_pii_scrub", "txt_vocab_bigrams", "train_shard_plan",
             "train_aspect_batches", "ann_pq_adc", "txt_repeated_spans",
             "txt_bigram_lm_score", "ann_ivfpq", "dedup_semantic",
             "txt_ngram_containment", "j_asof_last_click",
             "j_range_interval_join", "w_funnel_conversion",
             "a_cohort_retention", "a_time_ohlc", "w_range_moving_avg"}

# plans that must NOT explode arrays into the shuffle (per-row pre-sum)
NO_GENERATE = {"emb_label_profile"}

# plans whose candidate generation must stay an EQUI-join — a
# CartesianProduct / BroadcastNestedLoopJoin means the blocking key
# fell out of the join condition and the op degraded to all-pairs
NO_CARTESIAN = {"dedup_semantic", "txt_ngram_containment",
                "ann_batch_join", "ann_batch_clustered",
                "dedup_cc_canonical", "j_range_interval_join",
                "w_funnel_conversion"}

# the as-of join must compile to window-over-union: ANY join operator
# in the plan means it degraded to the O(n*m) range-join form
NO_JOIN = {"j_asof_last_click"}

# ordered-first/last rollups must stay an aggregation: a Window here
# means every fact row got shuffled into one global/group ordering
NO_WINDOW = {"a_time_ohlc"}


def main() -> int:
    spark = get_spark("explain-audit", cores=8)
    sf = "/root/testdata/sf0.01"
    out = ["# Physical plan audit (sf0.01)\n"]
    failures = []
    for name in AUDIT:
        df = QUERIES[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        musts = CHECKS.get(name, [])
        missing = [m for m in musts if m not in plan]
        if name in NO_PYTHON and ("Python" in plan or "ArrowEval" in plan):
            missing.append("NO-PYTHON violated")
        if name in NO_GENERATE and "Generate" in plan:
            missing.append("NO-GENERATE violated (array exploded into shuffle)")
        if name in NO_CARTESIAN and (
                "CartesianProduct" in plan
                or "BroadcastNestedLoopJoin" in plan):
            missing.append("NO-CARTESIAN violated (blocking key lost)")
        if name in NO_FILESCAN and ("Scan parquet" in plan or "FileScan" in plan):
            missing.append("NO-FILESCAN violated (metadata-only answer read data)")
        if name in NO_JOIN and "Join" in plan:
            missing.append("NO-JOIN violated (as-of degraded to a range join)")
        if name in NO_WINDOW and "Window" in plan:
            missing.append("NO-WINDOW violated (rollup windowed every row)")
        status = "OK" if not missing else f"MISSING {missing}"
        if missing:
            failures.append((name, missing))
        out.append(f"\n## {name} — {status}\n\n```\n{plan[:4000]}\n```\n")
        print(f"{name}: {status}")
    # MV incremental recompute (operators/matview.py::_compute with an
    # affected-key set): the plan MERGE consumes. Must broadcast the
    # affected keys into a LeftSemi against the source scan, push the
    # view WHERE to parquet, and contain no Python.
    import shutil
    import tempfile
    import os as _os

    from mobility_lakehouse_project_spark.operators.matview import (
        _compute, _definition, create_materialized_view)
    from mobility_lakehouse_project_spark.tableformat import Catalog

    scratch = _os.path.join(tempfile.gettempdir(), "mlps-scratch", "audit-mv")
    shutil.rmtree(scratch, ignore_errors=True)
    cat = Catalog(scratch)
    orders = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus")
    cat.create_table_as("silver.orders", orders, n_files=8)
    create_materialized_view(
        spark, cat, "gold.by_priority", "silver.orders",
        group_by=["o_orderpriority"],
        aggs={"n": "count(*)", "sum_key": "sum(o_orderkey)"},
        where="o_orderstatus = 'O'")
    mv = cat.load_table("gold.by_priority")
    src = cat.load_table("silver.orders")
    # JVM-side VALUES relation: production derives `affected` from the
    # changelog parquet scan, so the audit input must not inject a
    # Python-RDD scan (spark.createDataFrame would) into the plan the
    # NO-PYTHON gate reads.
    affected = spark.sql(
        "SELECT * FROM VALUES ('1-URGENT'), ('3-MEDIUM') "
        "AS t(o_orderpriority)")
    df = _compute(spark, src, _definition(mv),
                  snapshot_id=src.current_snapshot().snapshot_id,
                  affected=affected, n_affected=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    missing = [m for m in
               ("BroadcastHashJoin", "LeftSemi", "HashAggregate",
                "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,O)")
               if m not in plan]
    if "Python" in plan or "ArrowEval" in plan:
        missing.append("NO-PYTHON violated")
    status = "OK" if not missing else f"MISSING {missing}"
    if missing:
        failures.append(("mv_recompute_affected", missing))
    out.append(f"\n## mv_recompute_affected — {status}\n\n```\n{plan[:4000]}\n```\n")
    print(f"mv_recompute_affected: {status}")
    shutil.rmtree(scratch, ignore_errors=True)

    with open("BENCH/EXPLAIN.md", "w") as f:
        f.write("".join(out))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
