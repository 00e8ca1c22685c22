"""Stateful streaming alert throttle: the cross-batch twin of the
batch `event_alert_throttle` query — per (key) the operator remembers
the LAST FIRED event time in GroupState and emits an alert only when
the incoming event is at least ``cooldown`` past it; every suppressed
event EXTENDS nothing (fired-anchored semantics: a storm stays
suppressed until a full quiet cooldown past the last *emitted* alert,
matching the paging behavior operators actually want — no re-page
while the incident is ongoing).

State per key: one int64 (last fired epoch-us) — bounded by key
cardinality, the smallest possible stateful footprint. Late/out-of-
order events within a micro-batch are handled by sorting the batch
slice; cross-batch late events older than the fired anchor are
suppressed (they would not have re-paged anyway).

Note the deliberate semantic difference from the batch twin:
the BATCH query anchors islands on inter-EVENT gaps (it sees the
whole history and reconstructs storms), while this operator anchors
on the last EMITTED alert (streaming state must stay one scalar).
Both collapse storms; they differ on an event that arrives
cooldown-after-the-previous-event but within cooldown of the last
fired alert. Pick per use case; the tests pin both behaviors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("fired_at_us", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("last_fired_us", T.LongType(), True)]
)


def throttle_alerts(
    events: DataFrame,
    *,
    cooldown_seconds: int = 1800,
    timeout_ms: int | None = 3_600_000,
) -> DataFrame:
    """events(user_id long, event_type string, event_id long,
    ev_us long) -> throttled alerts. Streaming-only.

    ``timeout_ms`` controls idle-key state eviction. ``None`` disables
    eviction (GroupStateTimeout.NoTimeout) — REQUIRED for bounded
    replays run with ``trigger(availableNow=True)``: a pending
    ProcessingTimeTimeout makes the engine keep scheduling empty
    timeout-evaluation micro-batches after the data is exhausted, and
    since a long duration never fires in replay wall-time the query
    NEVER terminates (observed: 71 micro-batches for 2 input files,
    each one slower than the last). Wall-clock eviction is a
    CONTINUOUS-deployment concern; pass a duration there, where the
    trigger never terminates by design anyway."""
    cooldown_us = cooldown_seconds * 1_000_000
    evict = timeout_ms is not None

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id, event_type = key
        if state.hasTimedOut:
            # idle key: drop the anchor so state stays bounded by
            # ACTIVE keys (re-arming after a long quiet spell is the
            # desired paging behavior anyway)
            state.remove()
            return
        last = state.get[0] if state.exists else None
        out_ids, out_ts = [], []
        for pdf in pdfs:
            for _, row in pdf.sort_values(
                ["ev_us", "event_id"]
            ).iterrows():
                ev = int(row["ev_us"])
                if last is None or ev - last >= cooldown_us:
                    out_ids.append(int(row["event_id"]))
                    out_ts.append(ev)
                    last = ev
        if last is not None:
            state.update((last,))
            if evict:
                state.setTimeoutDuration(timeout_ms)
        if out_ids:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_ids),
                    "event_type": [event_type] * len(out_ids),
                    "event_id": out_ids,
                    "fired_at_us": out_ts,
                }
            )

    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        fn,
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if evict
            else GroupStateTimeout.NoTimeout
        ),
    )
