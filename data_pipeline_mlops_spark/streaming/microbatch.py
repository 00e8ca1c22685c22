"""Micro-batch dashboard refresh (SURVEY.md §2.9 T5, §3.2).

The reference's 1-minute Airflow cron recomputes five metric tables
from today's orders and publishes snapshots + a Redis notify
(dags/micro_batch_dashboard.py). Here it is one function over a batch
OR streaming DataFrame — the five aggregations are all
filter+groupBy, so the same code serves:
  - cron parity: call `dashboard_metrics` on a batch frame, write
    snapshots with `write_snapshots`;
  - streaming: `foreachBatch(refresh_dashboard(...))` on a
    processingTime="60 seconds" trigger.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.operators.aggregate import (
    hourly_stats,
    overall_metrics,
)
from data_pipeline_mlops_spark.operators.exact import (
    long_count,
    money_sum,
)
from data_pipeline_mlops_spark.operators.topk import top_k


def dashboard_metrics(
    orders: DataFrame,
    *,
    ts_col: str,
    amount_col: str,
    customer_col: str,
    product_col: str,
    category_col: str,
    region_col: str,
    qty_col: str,
    statuses: list[str] | None = None,
    status_col: str | None = None,
    include_hourly_series: bool = False,
    include_candles: bool = False,
) -> dict[str, DataFrame]:
    """The five dashboard tables (A3-A7,
    reference dags/micro_batch_dashboard.py:95-133).

    ``include_hourly_series=True`` adds a sixth, beyond-parity table:
    a CONTIGUOUS per-hour-bucket series (time_bucket_gapfill,
    step="1 hour", counts/revenue zero-filled, synthesized rows
    marked). The reference's hourly chart groups by hour-of-day and
    silently skips empty hours; dashboards that plot a time axis need
    the gap-filled form. ``include_candles=True`` adds a seventh:
    hourly order-value candlesticks per category
    (operators/ohlc.py — one hash aggregation, no window pass).
    Parity default stays exactly five tables."""
    df = orders
    if statuses and status_col:
        df = df.where(F.col(status_col).isin(statuses))  # P7
    top_products = top_k(
        df.groupBy(F.col(product_col).alias("product_name")).agg(
            long_count("order_count"),
            F.sum(qty_col).alias("quantity_sold"),
            money_sum(amount_col, "revenue"),
        ),
        [F.col("revenue").desc(), F.col("product_name").asc()],
        10,
    )
    category_stats = df.groupBy(F.col(category_col).alias("category")).agg(
        long_count("order_count"),
        money_sum(amount_col, "revenue"),
        F.sum(qty_col).alias("quantity_sold"),
    )
    regional_stats = df.groupBy(F.col(region_col).alias("region")).agg(
        long_count("order_count"),
        money_sum(amount_col, "revenue"),
    )
    out = {
        "overall_metrics": overall_metrics(
            df, amount_col=amount_col, customer_col=customer_col
        ),
        "top_products": top_products,
        "category_stats": category_stats,
        "regional_stats": regional_stats,
        "hourly_stats": hourly_stats(df, ts_col=ts_col, amount_col=amount_col),
    }
    if include_hourly_series:
        from data_pipeline_mlops_spark.operators.gapfill import (
            time_bucket_gapfill,
        )

        agg = df.groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("bucket")
        ).agg(
            long_count("order_count"),
            money_sum(amount_col, "revenue"),
        )
        out["hourly_series"] = time_bucket_gapfill(
            agg,
            group_cols=[],
            bucket_col="bucket",
            zero_cols=["order_count", "revenue"],
            step="1 hour",
        )
    if include_candles:
        from data_pipeline_mlops_spark.operators.ohlc import ohlc_agg

        # seventh, beyond-parity table: hourly order-value
        # candlesticks per category (open/high/low/close + decimal
        # volume) — one struct-edge hash aggregation per refresh, no
        # window pass (operators/ohlc.py).
        out["hourly_candles"] = ohlc_agg(
            df.withColumn("__cat", F.col(category_col)),
            group_cols=["__cat"],
            ts_col=ts_col,
            value_col=amount_col,
            bucket="hour",
            tiebreak_col=product_col,
        ).withColumnRenamed("__cat", "category")
    return out


def write_snapshots(
    metrics: dict[str, DataFrame], base_path: str
) -> None:
    """K1-style fixed-key snapshot overwrite
    (reference dags/micro_batch_dashboard.py:144-151). coalesce(1):
    these are tiny summary tables; one file per snapshot is the
    contract, not a scalability concern."""
    for name, df in metrics.items():
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{base_path}/{name}"
        )


def refresh_dashboard(
    *,
    base_path: str,
    notify: Callable[[dict], None] | None = None,
    metric_kwargs: dict,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: recompute + snapshot + notify (K3 — the
    Redis publish/marker writes become a pluggable callback)."""

    def body(batch_df: DataFrame, batch_id: int) -> None:
        metrics = dashboard_metrics(batch_df, **metric_kwargs)
        write_snapshots(metrics, base_path)
        if notify is not None:
            head = metrics["overall_metrics"].collect()
            notify(
                {
                    "batch_id": batch_id,
                    "overall": head[0].asDict() if head else {},
                }
            )

    return body
