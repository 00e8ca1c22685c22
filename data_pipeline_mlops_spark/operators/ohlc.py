"""OHLC / candlestick bucket aggregation (hypertable tier).

TimescaleDB ``candlestick_agg`` / ``ohlc`` parity: per (series, time
bucket), the opening value (value at the earliest timestamp), the
high, the low, the closing value (value at the latest timestamp), the
tick count, and the exact volume sum.  The reference's dashboard layer
only ships plain AVG/COUNT rollups (dags/micro_batch_dashboard.py);
candlesticks are the standard downsampled-series view of the same
stream.

Open/close are selected with ONE aggregation, not a second window
pass: Spark orders structs lexicographically by field position, so
``min(struct(ts, tiebreak, value))`` is exactly "the value at the
earliest (ts, tiebreak)" — deterministic under timestamp ties, fully
map-side combinable, one shuffle on the (series, bucket) key, no
row_number materialization.  DuckDB replays the same selection with
two ROW_NUMBER windows in the oracle (registry) — same semantics,
different engine idiom.

Volume sums route through DECIMAL(38,6) (operators/exact.py
discipline) so the distributed sum is associative and bit-identical
at any parallelism.

At 100 TB: a single hash aggregation keyed on (series, bucket) with
partial aggregation map-side; cardinality is |series| x |buckets|
(output-sized, never input-sized).  No window, no join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.operators.exact import MONEY_DECIMAL


def ohlc_agg(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    bucket: str = "day",
    tiebreak_col: str | None = None,
    scale: int = 2,
) -> DataFrame:
    """Per (group_cols..., bucket) candlestick row:
    ``(group_cols..., bucket_<bucket>, open, high, low, close,
    n_ticks, volume)``.

    ``bucket`` is a ``date_trunc`` unit (``day``/``hour``/...).
    ``tiebreak_col`` (e.g. the event id) makes open/close
    deterministic when timestamps repeat within a bucket.
    """
    group_cols = list(group_cols)
    b = F.date_trunc(bucket, F.col(ts_col)).alias(f"bucket_{bucket}")
    edge_fields = [F.col(ts_col).alias("t")]
    if tiebreak_col is not None:
        edge_fields.append(F.col(tiebreak_col).alias("i"))
    edge = F.struct(*edge_fields, F.col(value_col).alias("v"))
    return (
        df.groupBy(*group_cols, b)
        .agg(
            F.min(edge).getField("v").alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max(edge).getField("v").alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.round(
                F.sum(F.col(value_col).cast(MONEY_DECIMAL)), scale
            )
            .cast("double")
            .alias("volume"),
        )
    )
