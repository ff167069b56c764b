"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` — the arbitrary-state API the reference has
no analog for (its incrementality is day-batch DELETE+INSERT,
dags/Silver_Transform_Dag.py:188-207); this is the capability a
streaming training-data pipeline needs for session/conversation
assembly.

State per user: (session_start, last_ts, n_events, total_value) in
epoch microseconds. Each micro-batch folds its (sorted) events into
the open session; a gap > ``gap_minutes`` CLOSES the session (emitted
downstream, exactly once per closed session in append mode) and opens
a new one. The open tail session stays in state across batches — the
semantics of a streaming session window with unbounded lateness inside
the group, bounded by the source's watermark upstream.

Scale shape: state is per-key O(1) (four scalars), shuffled once by
user_id; Arrow batches stream through the Python worker — no
collect, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
STATE_SCHEMA = "start long, last long, n int, tv double"

_US = 1_000_000


def _fold(rows: pd.DataFrame, state_tuple, gap_us: int):
    """Fold sorted events into (closed_sessions, open_state)."""
    closed = []
    start, last, n, tv = state_tuple
    # normalize to epoch microseconds regardless of pandas resolution
    ts_us = rows["ts"].astype("datetime64[us]").astype("int64").tolist()
    vals = rows["value"].tolist()
    for t, v in zip(ts_us, vals):
        if start is None:
            start, last, n, tv = t, t, 1, float(v)
        elif t - last > gap_us:
            closed.append((start, last, n, tv))
            start, last, n, tv = t, t, 1, float(v)
        else:
            last, n, tv = max(last, t), n + 1, tv + float(v)
    return closed, (start, last, n, tv)


def sessionize_stream(events: DataFrame, gap_minutes: float = 30.0) -> DataFrame:
    """events(user_id long, ts timestamp, value double) ->
    closed sessions, one row per session, append-mode exactly-once."""
    gap_us = int(gap_minutes * 60 * _US)

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (uid,) = key
        st = state.get if state.exists else (None, None, 0, 0.0)
        closed_all = []
        # a group spanning multiple Arrow chunks must be sorted as ONE
        # batch — per-chunk sorting would fold events out of time order
        # across chunk boundaries and corrupt session assembly
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values("ts")
            closed, st = _fold(batch[["ts", "value"]], st, gap_us)
            closed_all.extend(closed)
        if st[0] is not None:
            state.update(tuple(st))
        if closed_all:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(closed_all),
                    "session_start": pd.to_datetime([c[0] for c in closed_all], unit="us"),
                    "session_end": pd.to_datetime([c[1] for c in closed_all], unit="us"),
                    "n_events": [c[2] for c in closed_all],
                    "total_value": [c[3] for c in closed_all],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


ASOF_OUT_SCHEMA = (
    "user_id long, event_id long, ts timestamp, value double, "
    "right_ts timestamp, right_value double"
)
ASOF_STATE_SCHEMA = "rts long, rv double"


def _asof_fold(rows: pd.DataFrame, st, left_type: str, right_type: str):
    """Fold one (ts, side)-sorted batch: right rows advance the
    per-key (latest right ts, payload) state monotonically, left rows
    emit with the state current AT their timestamp."""
    rts, rv = st
    out = []
    ts_us = rows["ts"].astype("datetime64[us]").astype("int64").tolist()
    for t, et, eid, v in zip(
            ts_us, rows["event_type"].tolist(),
            rows["event_id"].tolist(), rows["value"].tolist()):
        if et == right_type:
            if rts is None or t >= rts:
                rts, rv = int(t), float(v)
        elif et == left_type:
            out.append((int(eid), int(t), float(v), rts, rv))
    return out, (rts, rv)


def asof_enrich_stream(events: DataFrame, left_type: str = "purchase",
                       right_type: str = "click") -> DataFrame:
    """Streaming as-of enrichment (the feature-store lookup-join):
    each ``left_type`` event is emitted with the most recent
    ``right_type`` event's (ts, value) for the same user — the
    streaming twin of :func:`operators.temporal.asof_join`, keyed
    state = two scalars per user.

    Within a micro-batch rows are processed in (ts, side) order (right
    rows first at equal timestamps — exact-match semantics), so any
    single batch is exact.  ACROSS batches the state is monotone:
    as long as each key's events arrive in timestamp order batch over
    batch (a per-key-ordered log, the Kafka-partitioned norm), the
    stream equals the batch as-of join; a right row arriving after a
    later-ts right row was folded is ignored (state never rewinds),
    and a left row arriving late is enriched with the newest state —
    the standard processing-time concession every unbuffered streaming
    lookup join makes.  Exactness-under-lateness would need
    watermark-horizon buffering of BOTH sides (the batch operator is
    the replay path for that).

    Scale: one shuffle on user_id per micro-batch; state O(keys) x two
    scalars; Arrow-batched Python, no per-row JVM<->Python chatter.
    """

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (uid,) = key
        st = state.get if state.exists else (None, None)
        batch = pd.concat(list(pdfs), ignore_index=True)
        out = []
        if len(batch):
            batch = batch.assign(
                __side=(batch["event_type"] == left_type).astype("int8")
            ).sort_values(["ts", "__side", "event_id"])
            out, st = _asof_fold(batch, st, left_type, right_type)
        if st[0] is not None:
            state.update((int(st[0]), float(st[1])))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(out),
                    "event_id": [o[0] for o in out],
                    "ts": pd.to_datetime([o[1] for o in out], unit="us"),
                    "value": [o[2] for o in out],
                    "right_ts": pd.to_datetime(
                        [o[3] for o in out], unit="us"),
                    # nullable Float64: a plain list would coerce the
                    # no-match None to NaN, which Arrow keeps as NaN
                    # instead of NULL
                    "right_value": pd.array(
                        [o[4] for o in out], dtype="Float64"),
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, ASOF_OUT_SCHEMA, ASOF_STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout,
    )
