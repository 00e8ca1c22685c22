"""Structured Streaming alert engine (SURVEY.md §2.9 T1-T6, §3.3).

The reference splits this across Debezium -> Kafka -> two Flink jobs
(flink_job_alert_detection_simple.py + flink_job_telegram_sender.py).
Here it is ONE streaming query: source -> from_json -> the SAME rule
table used in batch (operators/alerts.py — stateless expressions are
trivially streamable) -> sinks. No watermark is needed for parity (the
reference is explicitly windowless, T2); checkpointing maps to
`checkpointLocation` (T3).

Sources/sinks are builders so tests run the identical pipeline from a
file source into a memory sink, while production wires Kafka on both
ends (S5/K2) — the pipeline in the middle is byte-for-byte the same.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_mlops_spark.operators.alerts import (
    AlertRule,
    classify_alerts,
)

# CDC row image consumed by the alert job — the Debezium-unwrapped
# orders record (FIXTURES.md §4; reference
# flink_job_alert_detection_simple.py:25-31, decimals degraded to
# double per the connector's decimal.handling.mode=double).
CDC_ORDER_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType(), True),
        T.StructField("total", T.DoubleType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("product_name", T.StringType(), True),
    ]
)

ALERT_OUTPUT_COLS = [
    "order_id",
    "customer_id",
    "product_name",
    "total",
    "quantity",
]


def parse_cdc_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """`value` bytes/string -> typed columns. PERMISSIVE + nulls on
    mismatch mirrors the reference's lenient JSON
    (json.ignore-parse-errors, flink_job_alert_detection_simple.py:39-40).
    """
    return raw.select(
        F.from_json(
            F.col(value_col).cast("string"), CDC_ORDER_SCHEMA
        ).alias("r")
    ).select("r.*")


def file_json_source(
    spark: SparkSession, path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based replay source (tests / backfill)."""
    reader = (
        spark.readStream.schema(CDC_ORDER_SCHEMA).format("json")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def kafka_source(
    spark: SparkSession,
    *,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka CDC source (S5). Requires the spark-sql-kafka package on
    the cluster; parsed with the same lenient JSON path."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_cdc_json(raw)


def alert_pipeline(
    orders: DataFrame, rules: list[AlertRule] | None = None
) -> DataFrame:
    """The streaming transformation: rule classification (first-match
    wins) + projection to the reference's alert output schema
    (flink_job_alert_detection_simple.py:45-52)."""
    from data_pipeline_mlops_spark.operators.alerts import (
        reference_order_rules,
    )

    return classify_alerts(
        orders,
        rules or reference_order_rules(),
        keep_cols=ALERT_OUTPUT_COLS,
    )


def run_to_memory(
    alerts: DataFrame, *, query_name: str = "alerts_test"
) -> None:
    """Drain all available input into an in-memory table (tests)."""
    q = (
        alerts.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def kafka_sink(
    alerts: DataFrame,
    *,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
):
    """K2: JSON alert records to Kafka, 60s-style checkpointing kept as
    an explicit checkpoint dir (reference flink checkpoint interval,
    docker-compose.yml:358-360)."""
    return (
        alerts.select(
            F.to_json(F.struct("*")).alias("value")
        )
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
        .start()
    )


def webhook_foreach_sink(
    alerts: DataFrame,
    *,
    send: Callable[[dict], None],
    checkpoint_location: str | None = None,
    query_name: str = "webhook",
):
    """K4/T6: per-record side-effect sink with at-least-once delivery
    and swallowed send errors — the reference's Telegram MapFunction
    shape (flink_job_telegram_sender.py:36-52) as a foreachBatch.

    Rows stream through the DRIVER (toLocalIterator) deliberately:
    alerts are the post-filter residue (a handful per batch), and a
    driver-side `send` keeps the callable an ordinary closure (rate
    limiting, shared session, test observability). If the alert volume
    ever approaches the input volume, switch to
    `batch_df.foreachPartition(...)` so sends fan out on executors —
    the callable then needs to be serializable and idempotent."""

    def process_batch(batch_df: DataFrame, _batch_id: int) -> None:
        for row in batch_df.toLocalIterator():
            try:
                send(row.asDict())
            except Exception:
                pass  # at-least-once, errors must not kill the stream

    writer = alerts.writeStream.foreachBatch(process_batch).queryName(
        query_name
    )
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    return writer.start()


def format_alert_message(alert: dict) -> str:
    """P14: the reference's Telegram HTML formats
    (flink_job_telegram_sender.py:54-102), condensed."""
    kind = alert.get("alert_type", "UNKNOWN")
    templates = {
        "HIGH_VALUE_ORDER": (
            "🚨 <b>High value order</b>: {order_id} — ${total:,.2f}"
        ),
        "SUSPICIOUS_QUANTITY": (
            "⚠️ <b>Suspicious quantity</b>: {order_id} — qty {quantity}"
        ),
        "NEGATIVE_PRICE": (
            "❌ <b>Negative price</b>: {order_id} — ${price:,.2f}"
        ),
        "INVALID_QUANTITY": (
            "❌ <b>Invalid quantity</b>: {order_id} — qty {quantity}"
        ),
    }
    tmpl = templates.get(
        kind, "ℹ️ {alert_type}: {order_id}"
    )
    # None-coalesce numeric fields: CDC_ORDER_SCHEMA allows null
    # total/price/quantity, and an explicit None in `alert` would
    # override a defaults dict and crash the ',.2f' format spec.
    defaults = {"price": 0.0, "quantity": 0, "total": 0.0}
    kwargs = {**defaults, **alert}
    for key, fallback in defaults.items():
        if kwargs.get(key) is None:
            kwargs[key] = fallback
    return tmpl.format(**kwargs)


def windowed_rapid_orders(
    orders: DataFrame,
    *,
    ts_col: str = "event_ts",
    threshold: int = 3,
    window_duration: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T4 (beyond-strict-parity, flagged): the vestigial RAPID_ORDERS
    rule the reference formats but never computes
    (flink_job_telegram_sender.py:76-83) — N orders per customer per
    5-minute window, built properly with event time + watermark."""
    return (
        orders.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            "customer_id",
        )
        .agg(F.count(F.lit(1)).alias("order_count"))
        .where(F.col("order_count") >= threshold)
        .select(
            F.lit("RAPID_ORDERS").alias("alert_type"),
            "customer_id",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "order_count",
        )
    )


def write_corpus(path: str, rows: list[dict]) -> None:
    """Helper to drop a JSON-lines replay corpus for the file source."""
    import os

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "corpus.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
