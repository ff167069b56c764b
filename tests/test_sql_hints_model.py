"""Property test: derived pruning hints are SOUND — for any predicate
the grammar can produce, the hint-pruned candidate file set must
contain every file holding a predicate-matching row. An unsound hint
is the worst failure class in the engine (a DELETE that silently
skips matching rows), so the property is checked against Spark's own
evaluation of the predicate, not against a reimplementation."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mobility_lakehouse_project_spark.sql import derive_hints
from mobility_lakehouse_project_spark.tableformat import LakehouseTable

# literals chosen to straddle the per-file ranges of the fixture table
INT_LITS = st.sampled_from([-5, 0, 3, 17, 40, 59, 60, 99])
STR_LITS = st.sampled_from(
    ["2024-01-00", "2024-01-03", "2024-01-07", "2024-01-99", "", "zzz",
     "don't"])
INT_COLS = st.sampled_from(["id", "v"])
STR_COLS = st.sampled_from(["dt"])


def _quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


@st.composite
def comparisons(draw):
    if draw(st.booleans()):
        col, lit = draw(INT_COLS), str(draw(INT_LITS))
    else:
        col, lit = draw(STR_COLS), _quote(draw(STR_LITS))
    kind = draw(st.sampled_from(["op", "rev", "between", "in", "null"]))
    if kind == "op":
        return f"{col} {draw(st.sampled_from(['=', '<', '<=', '>', '>=']))} {lit}"
    if kind == "rev":
        return f"{lit} {draw(st.sampled_from(['=', '<', '<=', '>', '>=']))} {col}"
    if kind == "between":
        if col == "dt":
            a, b = draw(STR_LITS), draw(STR_LITS)
            return f"{col} BETWEEN {_quote(min(a, b))} AND {_quote(max(a, b))}"
        a, b = draw(INT_LITS), draw(INT_LITS)
        return f"{col} BETWEEN {min(a, b)} AND {max(a, b)}"
    if kind == "in":
        if col == "dt":
            vals = ", ".join(_quote(v) for v in draw(
                st.lists(STR_LITS, min_size=1, max_size=3)))
        else:
            vals = ", ".join(str(v) for v in draw(
                st.lists(INT_LITS, min_size=1, max_size=3)))
        return f"{col} IN ({vals})"
    return f"{col} IS NOT NULL"


@st.composite
def predicates(draw):
    frags = draw(st.lists(comparisons(), min_size=1, max_size=4))
    glue = draw(st.sampled_from([" AND ", " OR "]))
    return glue.join(frags)


@pytest.fixture(scope="module")
def hint_table(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hints") / "t")
    rows = [(i, (i * 7) % 60, f"2024-01-{1 + i // 10:02d}",
             None if i % 13 == 0 else i % 4)
            for i in range(60)]
    df = spark.createDataFrame(rows, "id long, v long, dt string, x long")
    t = LakehouseTable.create(d, df.schema)
    # 6 files, each a tight id/dt window, overlapping v windows
    for lo in range(0, 60, 10):
        t.append(df.filter(f"id >= {lo} AND id < {lo + 10}"), n_files=1)
    return t


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pred=predicates())
def test_derived_hints_never_exclude_a_matching_file(spark, hint_table,
                                                     pred):
    t = hint_table
    int_ranges, point_eq = derive_hints(t, pred)
    cand = {
        r["file_path"]
        for r in t.plan_files(spark, int_ranges=int_ranges or None,
                              point_eq=point_eq or None)
        .select("file_path").collect()
    }
    matching = {
        r["_file"]
        for r in t.scan(spark, with_pos=True).filter(pred)
        .select("_file").distinct().collect()
    }
    missed = matching - cand
    assert not missed, (
        f"hints {int_ranges}/{point_eq} for {pred!r} pruned files with "
        f"matching rows: {sorted(missed)}")
