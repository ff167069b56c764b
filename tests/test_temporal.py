"""Unit tests for operators/temporal.py: as-of join (backward/forward,
exact-match flag, tolerance, left-outer nulls) against a naive per-row
model, and the bucketed interval join against the plain theta join."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mobility_lakehouse_project_spark.operators.temporal import asof_join, interval_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", lid=1, ts=ts(10)),
            Row(k="a", lid=2, ts=ts(30)),
            Row(k="a", lid=3, ts=ts(5)),   # before any right row
            Row(k="b", lid=4, ts=ts(50)),
            Row(k="c", lid=5, ts=ts(50)),  # key with no right rows at all
            Row(k="a", lid=6, ts=ts(20)),  # exactly on a right row's ts
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=ts(8), rid=100, rv=1.0),
            Row(k="a", ts=ts(20), rid=101, rv=2.0),
            Row(k="a", ts=ts(25), rid=102, rv=3.0),
            Row(k="b", ts=ts(49), rid=103, rv=4.0),
            Row(k="b", ts=ts(51), rid=104, rv=5.0),
        ]
    )
    return left, right


def _matches(df):
    return {
        r["lid"]: (r["rid_r"], r["ts_r"]) for r in df.collect()
    }


def naive_asof(left_rows, right_rows, direction, allow_exact):
    out = {}
    for lk, lid, lts in left_rows:
        cands = []
        for rk, rts, rid, _ in right_rows:
            if rk != lk:
                continue
            if direction == "backward":
                ok = rts <= lts if allow_exact else rts < lts
            else:
                ok = rts >= lts if allow_exact else rts > lts
            if ok:
                cands.append((rts, rid))
        if not cands:
            out[lid] = (None, None)
        elif direction == "backward":
            rts, rid = max(cands)
            out[lid] = (rid, rts)
        else:
            rts, rid = min(cands)
            out[lid] = (rid, rts)
    return out


LEFT_ROWS = [
    ("a", 1, ts(10)), ("a", 2, ts(30)), ("a", 3, ts(5)),
    ("b", 4, ts(50)), ("c", 5, ts(50)), ("a", 6, ts(20)),
]
RIGHT_ROWS = [
    ("a", ts(8), 100, 1.0), ("a", ts(20), 101, 2.0), ("a", ts(25), 102, 3.0),
    ("b", ts(49), 103, 4.0), ("b", ts(51), 104, 5.0),
]


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_asof_matches_naive_model(spark, frames, direction, allow_exact):
    left, right = frames
    got = _matches(
        asof_join(
            left, right, on=["k"], payload=["rid", "rv"],
            direction=direction, allow_exact=allow_exact, suffix="_r",
        )
    )
    want = naive_asof(LEFT_ROWS, RIGHT_ROWS, direction, allow_exact)
    assert got == want


def test_asof_tolerance_nulls_far_matches(spark, frames):
    left, right = frames
    j = asof_join(
        left, right, on=["k"], payload=["rid", "rv"],
        tolerance_sec=5 * 60, suffix="_r",
    )
    got = _matches(j)
    # lid=1 matched ts(8) at gap 2min (kept); lid=2 matched ts(25) at
    # gap 5min (kept, boundary); lid=6 matched ts(20) gap 0 (kept);
    # lid=4 matched ts(49) gap 1min (kept); others null.
    assert got[1] == (100, ts(8))
    assert got[2] == (102, ts(25))
    assert got[6] == (101, ts(20))
    assert got[4] == (103, ts(49))
    assert got[3] == (None, None)
    assert got[5] == (None, None)


def test_asof_preserves_left_rowcount(spark, frames):
    left, right = frames
    j = asof_join(left, right, on=["k"], payload=["rid", "rv"], suffix="_r")
    assert j.count() == left.count()


def test_asof_no_join_in_plan(spark, frames):
    """The whole point: the physical plan is window-over-union — there
    must be NO join operator and exactly one exchange for the keys."""
    left, right = frames
    j = asof_join(left, right, on=["k"], payload=["rid", "rv"], suffix="_r")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


def test_interval_join_matches_theta(spark):
    iv = spark.createDataFrame(
        [
            Row(iid=1, lo=ts(0), hi=ts(90)),      # spans 2 hour buckets
            Row(iid=2, lo=ts(30), hi=ts(40)),
            Row(iid=3, lo=ts(200), hi=ts(210)),   # empty
            Row(iid=4, lo=ts(55), hi=ts(65)),     # crosses bucket edge
        ]
    )
    pts = spark.createDataFrame(
        [Row(pid=i, pts=ts(m)) for i, m in enumerate([0, 5, 35, 59, 60, 61, 89, 90, 91, 150])]
    )
    got = interval_join(iv, pts, start="lo", end="hi", point_ts="pts", bucket_sec=3600)
    got_pairs = {(r["iid"], r["pid"]) for r in got.collect()}
    want = iv.join(
        pts, (pts["pts"] >= iv["lo"]) & (pts["pts"] <= iv["hi"]), "inner"
    )
    want_pairs = {(r["iid"], r["pid"]) for r in want.collect()}
    assert got_pairs == want_pairs
    # each pair exactly once even for the bucket-spanning interval
    assert got.count() == len(got_pairs)


def test_interval_join_with_keys(spark):
    iv = spark.createDataFrame(
        [Row(u=1, lo=ts(0), hi=ts(60)), Row(u=2, lo=ts(0), hi=ts(60))]
    )
    pts = spark.createDataFrame(
        [Row(u=1, pid=1, pts=ts(30)), Row(u=2, pid=2, pts=ts(30)), Row(u=3, pid=3, pts=ts(30))]
    )
    got = interval_join(iv, pts, start="lo", end="hi", point_ts="pts", on=["u"])
    assert {(r["u"], r["pid"]) for r in got.collect()} == {(1, 1), (2, 2)}


def test_interval_join_rejects_collisions(spark):
    iv = spark.createDataFrame([Row(x=1, lo=ts(0), hi=ts(1))])
    pts = spark.createDataFrame([Row(x=2, pts=ts(0))])
    with pytest.raises(ValueError, match="colliding"):
        interval_join(iv, pts, start="lo", end="hi", point_ts="pts")


@pytest.mark.parametrize("direction,allow_exact", [
    ("backward", True), ("backward", False),
    ("forward", True), ("forward", False),
])
def test_asof_randomized_parity(spark, direction, allow_exact):
    """Seeded adversarial fuzz: 5 keys, a coarse 40-slot timestamp grid
    (forcing left==right ties and duplicate left timestamps), right
    deduped per (key, ts) — distributed asof == the naive per-row scan
    for every direction/exactness combination."""
    import numpy as np

    rng = np.random.default_rng(20260821)
    keys = list("abcde")
    left_rows = [
        (keys[rng.integers(5)], int(i), ts(int(rng.integers(40) * 5)))
        for i in range(200)
    ]
    seen = {}
    for j in range(220):
        k, t = keys[rng.integers(5)], ts(int(rng.integers(40) * 5))
        seen.setdefault((k, t), (k, t, 1000 + j, float(j)))
    right_rows = list(seen.values())

    left = spark.createDataFrame(
        [Row(k=k, lid=i, ts=t) for k, i, t in left_rows]
    ).repartition(7)
    right = spark.createDataFrame(
        [Row(k=k, ts=t, rid=r, rv=v) for k, t, r, v in right_rows]
    ).repartition(5)
    got = _matches(
        asof_join(left, right, on=["k"], payload=["rid", "rv"],
                  direction=direction, allow_exact=allow_exact, suffix="_r")
    )
    want = naive_asof(left_rows, right_rows, direction, allow_exact)
    assert got == want


def test_asof_rejects_output_name_collisions(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        # suffix "" makes the matched ts column collide with left.ts
        asof_join(left, right, on=["k"], payload=["rid", "rv"], suffix="")


def test_asof_empty_right_side_yields_all_nulls(spark, frames):
    left, right = frames
    j = asof_join(left, right.limit(0), on=["k"],
                  payload=["rid", "rv"], suffix="_r")
    rows = j.collect()
    assert len(rows) == left.count()
    assert all(r["rid_r"] is None and r["ts_r"] is None for r in rows)


def test_interval_join_rejects_bad_bucket(spark):
    iv = spark.createDataFrame([Row(iid=1, lo=ts(0), hi=ts(1))])
    pts = spark.createDataFrame([Row(pid=1, pts=ts(0))])
    with pytest.raises(ValueError, match="bucket_sec"):
        interval_join(iv, pts, start="lo", end="hi", point_ts="pts",
                      bucket_sec=0)
