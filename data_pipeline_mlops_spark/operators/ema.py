"""Exponential moving average over bucketed series (hypertable tier).

EMA is the standard monitoring smoother (Grafana/Prometheus dashboards;
pandas ``ewm(adjust=False)``): ``ema_0 = x_0``,
``ema_i = alpha * x_i + (1 - alpha) * ema_{i-1}``.  The recurrence is
inherently sequential, so the Spark-first shape splits the work:

1. The CORPUS-SIZED part — bucketing and averaging the raw stream —
   is one distributed, map-side-combinable groupBy with the decimal-
   exact mean discipline (``CAST(SUM(CAST(v AS DECIMAL(38,6))) AS
   DOUBLE) / COUNT(*)`` — exact sum, one conversion, one division, so
   any parallelism yields the same doubles).
2. The OUTPUT-SIZED part — the recurrence over |buckets| rows per
   series — runs in an ``applyInPandas`` kernel over the series key.
   Per-group memory is |buckets| (calendar-bounded, like the gapfill
   spine), never the fact-row count, so unlike LTTB this needs no
   parity-only label: a trillion-row series still reduces to its
   bucket series before the sequential pass.

Cross-engine determinism: each step is the fixed expression
``(alpha * x) + (beta * ema)`` where ``beta = 1.0 - alpha`` is
computed ONCE in IEEE here and both float literals are templated into
the oracle via ``repr`` (e.g. 1.0 - 0.7 is 0.30000000000000004 in
IEEE, NOT the decimal literal 0.3 — templating the repr keeps DuckDB
on the identical double whenever 1 - alpha is inexact).  Same operands + same DAG = bit-identical at any
parallelism; no rounding is applied to the reported values.

Reference parity: the reference's dashboard recomputes raw hourly
AVGs (dags/micro_batch_dashboard.py); EMA is the smoothing tier over
the same buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_mlops_spark.operators.exact import MONEY_DECIMAL
from data_pipeline_mlops_spark.timeutil import epoch_s


def bucketed_ema(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    bucket: str = "hour",
) -> DataFrame:
    """Per (group, time bucket): the decimal-exact bucket mean and its
    EMA along the series' observed buckets (missing buckets are
    skipped, not zero-filled — compose with
    operators/gapfill.py::time_bucket_gapfill first for a contiguous
    recurrence).  Returns
    ``(group_cols..., bucket_s, bucket_avg, ema)`` with ``bucket_s``
    as epoch seconds of the ``date_trunc(bucket)`` boundary."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    group_cols = list(group_cols)
    beta = 1.0 - alpha
    in_schema = {f.name: f.dataType for f in df.schema.fields}
    out_schema = T.StructType(
        [T.StructField(c, in_schema[c]) for c in group_cols]
        + [
            T.StructField("bucket_s", T.LongType()),
            T.StructField("bucket_avg", T.DoubleType()),
            T.StructField("ema", T.DoubleType()),
        ]
    )
    hourly = (
        df.groupBy(
            *group_cols,
            epoch_s(F.date_trunc(bucket, F.col(ts_col))).alias(
                "bucket_s"
            ),
        )
        .agg(
            (
                F.sum(F.col(value_col).cast(MONEY_DECIMAL)).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("bucket_avg")
        )
    )

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("bucket_s").reset_index(drop=True)
        ema = []
        e = None
        for x in pdf["bucket_avg"]:
            x = float(x)
            e = x if e is None else (alpha * x) + (beta * e)
            ema.append(e)
        pdf["ema"] = ema
        return pdf[group_cols + ["bucket_s", "bucket_avg", "ema"]]

    return hourly.groupBy(*group_cols).applyInPandas(kernel, out_schema)


def holt_linear(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    gamma: float,
    bucket: str = "hour",
) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing over the
    bucketed series — the trend-aware extension of :func:`bucketed_ema`
    (Holt 1957; the standard monitoring forecaster)::

        level_0 = x_0,  trend_0 = 0            (zero-initialized trend:
                                                 deterministic for any
                                                 series length; converges
                                                 within a few steps)
        level_i = (alpha * x_i) + ((1-alpha) * (level_{i-1} + trend_{i-1}))
        trend_i = (gamma * (level_i - level_{i-1})) + ((1-gamma) * trend_{i-1})

    Returns ``(group_cols..., bucket_s, bucket_avg, level, trend,
    forecast_next)`` with ``forecast_next = level + trend`` (the
    one-step-ahead forecast).  Same Spark-first split and determinism
    contract as :func:`bucketed_ema` — the 1-alpha/1-gamma complements
    are computed once in IEEE and must be repr-templated into any
    SQL replay."""
    if not (0.0 < alpha <= 1.0) or not (0.0 < gamma <= 1.0):
        raise ValueError("alpha and gamma must be in (0, 1]")
    group_cols = list(group_cols)
    a_c, g_c = 1.0 - alpha, 1.0 - gamma
    in_schema = {f.name: f.dataType for f in df.schema.fields}
    out_schema = T.StructType(
        [T.StructField(c, in_schema[c]) for c in group_cols]
        + [
            T.StructField("bucket_s", T.LongType()),
            T.StructField("bucket_avg", T.DoubleType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("forecast_next", T.DoubleType()),
        ]
    )
    bucketed = (
        df.groupBy(
            *group_cols,
            epoch_s(F.date_trunc(bucket, F.col(ts_col))).alias(
                "bucket_s"
            ),
        )
        .agg(
            (
                F.sum(F.col(value_col).cast(MONEY_DECIMAL)).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("bucket_avg")
        )
    )

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("bucket_s").reset_index(drop=True)
        lvl, trd, fc = [], [], []
        level = trend = None
        for x in pdf["bucket_avg"]:
            x = float(x)
            if level is None:
                level, trend = x, 0.0
            else:
                prev = level
                level = (alpha * x) + (a_c * (level + trend))
                trend = (gamma * (level - prev)) + (g_c * trend)
            lvl.append(level)
            trd.append(trend)
            fc.append(level + trend)
        pdf["level"] = lvl
        pdf["trend"] = trd
        pdf["forecast_next"] = fc
        return pdf[
            group_cols
            + ["bucket_s", "bucket_avg", "level", "trend",
               "forecast_next"]
        ]

    return bucketed.groupBy(*group_cols).applyInPandas(
        kernel, out_schema
    )
