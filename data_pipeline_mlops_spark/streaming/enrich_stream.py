"""Stream-stream join: orders enriched with their payment as both
arrive (beyond the reference's stateless filters, SURVEY.md §2.9 —
its Flink jobs never join streams).

Spark buffers both sides in state and emits a match whenever the
partner arrives. Unbounded state is the scale killer, so both sides
carry watermarks AND the join condition bounds the payment's event
time relative to the order's — that pair of constraints is what lets
Spark evict state (an order older than watermark + max_delay can never
match a future payment). State size is O(in-flight window), not
O(stream history): the 100 TB/day requirement.

Inner join = only paid orders; left-outer emits unpaid orders with
null payment once the watermark passes (used for unpaid-order alerts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_mlops_spark.timeutil import epoch_us

ORDER_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType(), True),
        T.StructField("order_ts", T.TimestampType(), True),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("total", T.DoubleType(), True),
    ]
)

PAYMENT_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("pay_order_id", T.StringType(), True),
        T.StructField("pay_ts", T.TimestampType(), True),
        T.StructField("method", T.StringType(), True),
        T.StructField("amount", T.DoubleType(), True),
    ]
)


def order_file_source(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(ORDER_EVENT_SCHEMA).format("json").load(path)


def payment_file_source(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(PAYMENT_EVENT_SCHEMA).format("json").load(path)
    )


def join_orders_payments(
    orders: DataFrame,
    payments: DataFrame,
    *,
    watermark: str = "10 minutes",
    max_delay_sec: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Each order matched to payments arriving within ``max_delay_sec``
    of it. Both watermarks + the event-time range bound are REQUIRED —
    they are the state-eviction contract, not decoration."""
    o = orders.withWatermark("order_ts", watermark)
    p = payments.withWatermark("pay_ts", watermark)
    cond = F.expr(
        "order_id = pay_order_id"
        " AND pay_ts >= order_ts"
        f" AND pay_ts <= order_ts + interval {max_delay_sec} seconds"
    )
    joined = o.join(p, cond, how)
    return joined.select(
        "order_id",
        "order_ts",
        "customer_id",
        "total",
        "method",
        "amount",
        (
            epoch_us("pay_ts") - epoch_us("order_ts")
        ).alias("pay_latency_us"),
    )


def dedup_orders(
    orders: DataFrame, *, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exactly-once-ish dedup: CDC delivery is at-least-once,
    so replayed order events are normal. dropDuplicatesWithinWatermark
    keeps one row per order_id while holding state only for the
    watermark horizon — a plain dropDuplicates on a stream would keep
    every id ever seen (unbounded state, the 100 TB/day killer)."""
    return orders.withWatermark(
        "order_ts", watermark
    ).dropDuplicatesWithinWatermark(["order_id"])
