"""Differential (model-based) test for the schema-evolution surface:
random op sequences — append, add column (with/without initial
default), rename, drop, widen — applied BOTH to a LakehouseTable and
to a driver-side pandas model; the table's scan must equal the model
after every sequence. This is the property the individual evolution
tests sample pointwise: no sequence of metadata-only commits may
corrupt what a scan returns."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mobility_lakehouse_project_spark.tableformat import LakehouseTable

# ops: ("append",), ("add", with_default), ("rename",), ("drop",),
# ("widen",) — targets are chosen deterministically inside apply()
OPS = st.lists(
    st.one_of(
        st.just(("append",)),
        st.tuples(st.just("add"), st.booleans()),
        st.just(("rename",)),
        st.just(("drop",)),
        st.just(("widen",)),
    ),
    min_size=1,
    max_size=7,
)


class _Model:
    """Driver-side truth: rows as list-of-dicts keyed by CURRENT
    logical column names; defaults applied to pre-existing rows at
    add-time (initial-default semantics)."""

    def __init__(self):
        self.rows: list[dict] = []
        self.cols: dict[str, str] = {"id": "bigint", "v": "int"}
        self.next_id = 0
        self.n_added = 0
        self.n_dropped = 0
        self.widened = False

    def append_rows(self, k=5):
        out = []
        for _ in range(k):
            r = {}
            for c, ty in self.cols.items():
                if c == "id":
                    r[c] = self.next_id
                elif ty in ("int", "bigint"):
                    r[c] = (self.next_id * 37 + len(c)) % 1000 + (
                        5_000_000_000 if self.widened and ty == "bigint" else 0)
                else:
                    r[c] = f"{c}{self.next_id}"
            out.append(r)
            self.next_id += 1
        self.rows.extend(out)
        return out


def _apply(t, model, spark, op):
    kind = op[0]
    if kind == "append":
        new = model.append_rows()
        ddl = ", ".join(f"`{c}` {ty}" for c, ty in model.cols.items())
        df = spark.createDataFrame(
            [tuple(r[c] for c in model.cols) for r in new], ddl)
        t.append(df, n_files=1)
    elif kind == "add":
        with_default = op[1]
        name = f"c{model.n_added}"
        model.n_added += 1
        default = f"d_{name}" if with_default else None
        t.add_columns({name: "string"},
                      defaults={name: default} if with_default else None)
        for r in model.rows:
            r[name] = default
        model.cols[name] = "string"
    elif kind == "rename":
        cands = [c for c in model.cols if c not in ("id", "v")]
        if not cands:
            return
        old = cands[0]
        new = old + "r"
        t.rename_column(old, new)
        for r in model.rows:
            r[new] = r.pop(old)
        model.cols = {new if c == old else c: ty
                      for c, ty in model.cols.items()}
    elif kind == "drop":
        cands = [c for c in model.cols if c not in ("id", "v")]
        if not cands:
            return
        victim = cands[-1]
        t.drop_column(victim)
        for r in model.rows:
            r.pop(victim, None)
        del model.cols[victim]
    elif kind == "widen":
        if model.widened:
            return
        t.widen_column("v", "bigint")
        model.cols["v"] = "bigint"
        model.widened = True


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=OPS)
def test_random_evolution_matches_model(spark, tmp_path_factory, ops):
    d = str(tmp_path_factory.mktemp("evo") / "t")
    model = _Model()
    first = model.append_rows()
    df = spark.createDataFrame(
        [tuple(r[c] for c in model.cols) for r in first],
        "`id` bigint, `v` int")
    t = LakehouseTable.create(d, df.schema)
    t.append(df, n_files=1)
    for op in ops:
        _apply(t, model, spark, op)
    got = (t.scan(spark).toPandas()
           .sort_values("id").reset_index(drop=True))
    want = (pd.DataFrame(model.rows, columns=list(model.cols))
            .sort_values("id").reset_index(drop=True))
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        g, w = got[c].tolist(), want[c].tolist()
        assert g == w, f"column {c}: {g[:5]} != {w[:5]}"


@pytest.mark.parametrize("seq", [
    [("add", True), ("rename",), ("append",), ("drop",), ("add", True)],
    [("widen",), ("append",), ("add", True), ("append",)],
])
def test_known_sequences(spark, tmp_path, seq):
    """Deterministic spot sequences (fast signal when hypothesis is
    skipped/shrunk): default->rename->append->drop->re-add, and
    widen->append->default->append."""
    d = str(tmp_path / "t")
    model = _Model()
    first = model.append_rows()
    df = spark.createDataFrame(
        [tuple(r[c] for c in model.cols) for r in first],
        "`id` bigint, `v` int")
    t = LakehouseTable.create(d, df.schema)
    t.append(df, n_files=1)
    for op in seq:
        _apply(t, model, spark, op)
    got = {r["id"]: r.asDict() for r in t.scan(spark).collect()}
    want = {r["id"]: r for r in model.rows}
    assert got == want
