"""Custom stateful streaming operator: per-key session windows via
applyInPandasWithState.

Beyond the reference's stateless filters (its only streaming operators,
SURVEY.md §2.9): groups an event stream by key and closes a session
when no event arrives within `gap` — the canonical custom-state shape
Spark lacks as a built-in aggregation (session_window exists for
aggregates; this operator emits arbitrary per-session records and
shows the GroupState pattern for anything stateful).

State per key: (session_start, last_ts, n_events, sum_value). A
processing-time timeout flushes idle keys; in availableNow/batch-test
mode sessions also close when a newer event exceeds the gap.

Trigger caveat (the round-9 compose lesson): with a pending
ProcessingTimeTimeout the engine keeps scheduling timeout-evaluation
micro-batches, so ``trigger(availableNow=True)`` NEVER terminates on
this operator — unlike the alert throttle, the timeout here is core
semantics (it is what closes the final session of each key), so it
cannot simply be disabled. Run sessionize with a continuous trigger
and stop the query explicitly (the pattern in
tests/test_streaming.py::test_sessionize_stateful_operator); for a
bounded backfill, use the batch twin (`event_session_windows` closes
sessions from the complete history without state).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), True),
        T.StructField("last_us", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
        T.StructField("sv", T.DoubleType(), True),
    ]
)


def sessionize(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
    timeout_ms: int = 60_000,
) -> DataFrame:
    """events(user_id long, ts timestamp, value double) ->
    closed sessions. Streaming-only (requires a streaming DataFrame)."""
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n, sv = state.get
                state.remove()
                yield _emit(user_id, start_us, last_us, n, sv)
            return
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values("ts")
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()
        vals = rows["value"].tolist()
        if state.exists:
            start_us, last_us, n, sv = state.get
        else:
            start_us, last_us, n, sv = None, None, 0, 0.0
        out = []
        for t, v in zip(ts_us, vals):
            if last_us is not None and t - last_us > gap_us:
                out.append((start_us, last_us, n, sv))
                start_us, last_us, n, sv = t, t, 1, float(v)
            else:
                start_us = t if start_us is None else start_us
                last_us = t
                n += 1
                sv += float(v)
        state.update((start_us, last_us, n, sv))
        state.setTimeoutDuration(timeout_ms)
        for s in out:
            yield _emit(user_id, *s)

    def _emit(user_id, start_us, last_us, n, sv) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
                "sum_value": [sv],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
