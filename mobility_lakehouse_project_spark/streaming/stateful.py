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
