"""Differential (model-based) test for the row-level DML surface:
random op sequences — append, DELETE WHERE (CoW and MOR), UPDATE WHERE
(CoW and MOR), MERGE upsert (CoW and MOR), MERGE matched-delete,
delete fold, compaction, snapshot expiry — applied BOTH to a
LakehouseTable and to a driver-side dict model; the table's scan must
equal the model after every sequence. Rows with a NULL predicate
column are always present, so every DELETE/UPDATE exercises SQL
three-valued semantics (NULL never matches). This is the property the
individual MOR/CoW tests sample pointwise: no interleaving of
row-level ops and maintenance may diverge a scan from the model."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mobility_lakehouse_project_spark.operators import compaction, merge
from mobility_lakehouse_project_spark.operators.delete import (
    delete_where,
    rewrite_position_deletes,
    update_where,
)
from mobility_lakehouse_project_spark.tableformat import LakehouseTable

DDL = "`id` bigint, `grp` int, `v` bigint, `tag` string"
COLS = ["id", "grp", "v", "tag"]

OPS = st.lists(
    st.one_of(
        st.just(("append",)),
        st.tuples(st.just("delete"), st.sampled_from(["cow", "mor"])),
        st.tuples(st.just("update"), st.sampled_from(["cow", "mor"])),
        st.tuples(st.just("merge"), st.sampled_from(["cow", "mor"])),
        st.just(("merge_del",)),
        st.just(("fold",)),
        st.just(("compact",)),
        st.just(("expire",)),
    ),
    min_size=1,
    max_size=6,
)


class _Model:
    """Driver-side truth: id -> row dict. ``v`` is NULL for every 9th
    row (the three-valued-logic sentinels)."""

    def __init__(self):
        self.rows: dict[int, dict] = {}
        self.next_id = 0
        self.step = 0  # deterministic per-op variation

    def mk_rows(self, k):
        out = []
        for _ in range(k):
            i = self.next_id
            self.next_id += 1
            out.append({
                "id": i, "grp": i % 4,
                "v": None if i % 9 == 8 else (i * 13) % 97,
                "tag": f"t{i}",
            })
        return out

    def add(self, rows):
        for r in rows:
            self.rows[r["id"]] = dict(r)


def _df(spark, rows):
    return spark.createDataFrame(
        [tuple(r[c] for c in COLS) for r in rows], DDL)


def _apply(t, model, spark, op):
    kind = op[0]
    model.step += 1
    s = model.step
    if kind == "append":
        rows = model.mk_rows(8)
        model.add(rows)
        t.append(_df(spark, rows), n_files=2)
    elif kind == "delete":
        r = s % 7
        delete_where(t, spark, f"v % 7 = {r}", mode=op[1],
                     target_file_size=1 << 20)
        model.rows = {i: row for i, row in model.rows.items()
                      if row["v"] is None or row["v"] % 7 != r}
    elif kind == "update":
        g = s % 4
        update_where(t, spark, f"grp = {g}",
                     {"v": f"coalesce(v, 0) + 1000", "tag": "concat(tag, 'u')"},
                     mode=op[1], target_file_size=1 << 20)
        for row in model.rows.values():
            if row["grp"] == g:
                row["v"] = (row["v"] or 0) + 1000
                row["tag"] += "u"
    elif kind == "merge":
        # update half the surviving ids + insert 4 brand-new ones
        hit = sorted(model.rows)[::2][:6]
        src_rows = [{"id": i, "grp": model.rows[i]["grp"],
                     "v": 5000 + i, "tag": f"m{i}"} for i in hit]
        src_rows += model.mk_rows(4)
        merge.merge_into(t, spark, _df(spark, src_rows), key="id",
                         mode=op[1], target_file_size=1 << 20)
        model.add(src_rows)
    elif kind == "merge_del":
        victims = sorted(model.rows)[1::3][:5]
        if not victims:
            return
        src = [model.rows[i] for i in victims]
        merge.merge_into(t, spark, _df(spark, src), key="id",
                         when_matched="delete", when_not_matched=None,
                         target_file_size=1 << 20)
        for i in victims:
            del model.rows[i]
    elif kind == "fold":
        rewrite_position_deletes(t, spark, target_file_size=1 << 20)
    elif kind == "compact":
        compaction.compact(t, spark, target_file_size=1 << 20, n_chunks=1)
    elif kind == "expire":
        t.expire_snapshots(keep_last=1)


def _check(t, model, spark):
    got = (t.scan(spark).toPandas()[COLS]
           .sort_values("id").reset_index(drop=True))
    want = (pd.DataFrame(
        [model.rows[i] for i in sorted(model.rows)] or
        {c: [] for c in COLS}, columns=COLS)
        .reset_index(drop=True))
    assert len(got) == len(want), f"rows {len(got)} != {len(want)}"
    for c in COLS:
        g = [None if pd.isna(x) else x for x in got[c].tolist()]
        w = [None if pd.isna(x) else x for x in want[c].tolist()]
        assert g == w, f"column {c}: {g[:6]} != {w[:6]}"


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=OPS)
def test_random_rowlevel_ops_match_model(spark, tmp_path_factory, ops):
    d = str(tmp_path_factory.mktemp("dml") / "t")
    model = _Model()
    first = model.mk_rows(24)
    model.add(first)
    t = LakehouseTable.create(d, _df(spark, first).schema, partition_col="grp")
    t.append(_df(spark, first), n_files=3)
    for op in ops:
        _apply(t, model, spark, op)
    _check(t, model, spark)


def test_known_rowlevel_sequence(spark, tmp_path):
    """Deterministic spot sequence covering the nastiest interleaving:
    MOR delete -> CoW update of surviving rows -> MOR merge upsert ->
    fold -> compact -> expire, with NULL-v sentinel rows throughout."""
    d = str(tmp_path / "t")
    model = _Model()
    first = model.mk_rows(24)
    model.add(first)
    t = LakehouseTable.create(d, _df(spark, first).schema, partition_col="grp")
    t.append(_df(spark, first), n_files=3)
    for op in [("delete", "mor"), ("update", "cow"), ("merge", "mor"),
               ("fold",), ("compact",), ("expire",)]:
        _apply(t, model, spark, op)
        _check(t, model, spark)  # invariant holds after EVERY op
