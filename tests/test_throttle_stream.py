"""Stateful streaming alert throttle (streaming/throttle_stream.py):
fired-anchored cooldown across micro-batches."""

from __future__ import annotations

import os
import time

from pyspark.sql import types as T


def test_streaming_throttle_fired_anchored(spark, tmp_path):
    from data_pipeline_mlops_spark.streaming.throttle_stream import (
        throttle_alerts,
    )

    src = str(tmp_path / "ev")
    os.makedirs(src)
    M = 60 * 1_000_000
    rows = [
        # user 7: event at t0 fires; t0+10m suppressed; t0+20m
        # suppressed (20m < 30m cooldown from FIRED anchor t0 — the
        # fired-anchored semantic); t0+40m fires (>=30m past t0)
        (7, "error", 1, 0 * M),
        (7, "error", 2, 10 * M),
        (7, "error", 3, 20 * M),
        (7, "error", 4, 40 * M),
        # user 8: independent key fires its own first alert
        (8, "error", 5, 0 * M),
    ]
    spark.createDataFrame(
        rows, "user_id long, event_type string, event_id long, ev_us long"
    ).coalesce(1).write.mode("overwrite").json(src)

    stream = spark.readStream.schema(
        T._parse_datatype_string(
            "user_id long, event_type string, event_id long, ev_us long"
        )
    ).json(src)
    alerts = throttle_alerts(
        stream, cooldown_seconds=1800, timeout_ms=3_600_000
    )
    q = (
        alerts.writeStream.format("memory")
        .queryName("throttle_out")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        got = []
        while time.time() < deadline:
            got = spark.sql("SELECT * FROM throttle_out").collect()
            if len(got) >= 3:
                break
            time.sleep(1)
    finally:
        q.stop()
    fired = {r.event_id for r in got}
    assert fired == {1, 4, 5}
