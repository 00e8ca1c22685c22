"""Kafka availability probe (S5/S6/K2 — reference
flink-jobs/flink_job_alert_detection_simple.py:24-59).

This container has NO Kafka surface at all (verified exhaustively
this round, and recorded in COVERAGE.md):

- no spark-sql-kafka connector jar and no kafka-clients jar anywhere
  under /opt/spark/jars (so readStream.format("kafka") cannot even
  resolve the datasource class);
- no broker binary, embedded or otherwise (no kafka-server-start, no
  KRaft test jars);
- no Python client (kafka-python / confluent-kafka not installed);
- package installs are forbidden in this environment.

A live Kafka round-trip is therefore IMPOSSIBLE here, not merely
inconvenient — the same conclusion as the Avro datasource probe in
test_formats.py. This probe pins the wiring anyway: in a
Kafka-equipped container (connector jar present) it validates the
source's schema contract and the sink's payload construction without
needing a broker; in this container it documents the gap as an
explicit skip instead of silently not testing.
"""

from __future__ import annotations

import pytest


def _kafka_datasource_available(spark) -> bool:
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:1"
        ).option("subscribe", "probe").load()
        return True
    except Exception as ex:  # noqa: BLE001 — classify, don't mask
        msg = str(ex)
        if "Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg:
            return False
        # the datasource resolved but complained about something else
        # (e.g. unreachable broker at planning time) — it IS installed
        return True


def test_kafka_source_schema_contract_or_documented_gap(spark):
    if not _kafka_datasource_available(spark):
        pytest.skip(
            "spark-sql-kafka datasource not in this container (no "
            "connector jar, no broker, no client libs, installs "
            "forbidden) — live Kafka round-trip impossible here; see "
            "module docstring + COVERAGE.md"
        )
    # Connector present: the raw kafka source must expose the columns
    # parse_cdc_json consumes (value) and offset bookkeeping.
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", "localhost:1")
        .option("subscribe", "probe")
        .load()
    )
    cols = set(raw.columns)
    assert {"key", "value", "topic", "partition", "offset"} <= cols


def test_kafka_sink_payload_shape(spark):
    """The K2 sink's payload construction (to_json(struct(*)) -> value)
    is broker-independent: validate it on a static frame so the sink's
    serialization is pinned even where Kafka itself cannot run."""
    import json

    from pyspark.sql import functions as F

    from data_pipeline_mlops_spark.streaming.alert_stream import (
        ALERT_OUTPUT_COLS,
    )

    df = spark.createDataFrame(
        [("o1", "c1", "widget", 20000.0, 2, "HIGH_VALUE_ORDER")],
        "order_id string, customer_id string, product_name string,"
        " total double, quantity int, alert_type string",
    )
    payload = df.select(F.to_json(F.struct("*")).alias("value")).collect()[
        0
    ]["value"]
    rec = json.loads(payload)
    assert set(ALERT_OUTPUT_COLS) <= set(rec)
    assert rec["alert_type"] == "HIGH_VALUE_ORDER"
    assert rec["total"] == 20000.0
