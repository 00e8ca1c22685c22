"""Time-weighted aggregation over irregular series (hypertable tier).

A plain AVG over an irregularly-sampled gauge over-weights bursts: ten
readings in one minute count ten times a reading that held for an
hour. Timeseries stores ship a first-class answer (TimescaleDB
``time_weight('LOCF')`` + ``average``); this module is the Spark-first
equivalent over the same LOCF weighting:

- Each observation holds its value until the NEXT observation in its
  group (``lead`` over a (ts, tiebreak)-ordered group window), so its
  weight is that interval in whole seconds — exact longs from the
  shared ``epoch_s`` floor both engines reproduce.
- The group's last observation has no following interval and is
  EXCLUDED (no extrapolation past the observed range — the same edge
  posture as gap-fill interpolation).
- Determinism at any parallelism: the per-row contribution
  ``value * seconds`` is ONE IEEE-double product (bit-identical on
  any engine), cast to DECIMAL(38,6) before the distributed sum —
  decimal addition is associative, so 32 threads or 1000 executors
  produce the same total (operators/exact.py discipline).

At 100 TB: the window partitions on the series key (entity/device/
event_type) — per-partition size is the series length, never the
corpus; the aggregation is one map-side-combinable groupBy on the
same key, so the whole operator is a single shuffle on the series
key.

Reference parity: the reference averages event values arithmetically
(dags/micro_batch_dashboard.py hourly AVG); the time-weighted form is
part of the at-scale hypertable extension surface alongside
operators/gapfill.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.operators.exact import MONEY_DECIMAL
from data_pipeline_mlops_spark.timeutil import epoch_s


def time_weighted_avg(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    scale: int = 6,
) -> DataFrame:
    """Per-group LOCF time-weighted average. Returns one row per group:
    (group_cols..., twa_value, total_seconds, n_intervals). Groups with
    fewer than two observations produce no row (no interval exists).

    ``tiebreak_col`` breaks ``ts`` ties deterministically (pass the
    event/row id when timestamps can repeat within a group)."""
    group_cols = list(group_cols)
    order: list[Column] = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    t_s = epoch_s(F.col(ts_col))
    dt = F.lead(t_s).over(w) - t_s
    contrib = (F.col(value_col) * dt.cast("double")).cast(MONEY_DECIMAL)
    rows = df.select(
        *group_cols, dt.alias("__dt"), contrib.alias("__contrib")
    ).where(F.col("__dt").isNotNull())
    return rows.groupBy(*group_cols).agg(
        F.round(
            F.sum("__contrib").cast("double") / F.sum("__dt"), scale
        )
        .cast("double")
        .alias("twa_value"),
        F.sum("__dt").cast("long").alias("total_seconds"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def counter_increase(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    scale: int = 6,
) -> DataFrame:
    """Monotonic-counter increase with reset handling (PromQL
    ``increase()`` / TimescaleDB ``counter_agg -> delta``): per group,
    successive samples ordered by (ts, tiebreak); a sample BELOW its
    predecessor is a counter reset, contributing its full value (the
    counter restarted from zero and climbed back); otherwise the
    contribution is the plain difference. Returns one row per group:
    (group_cols..., total_increase, n_resets, n_samples). Groups with
    one sample produce no row (no interval).

    Determinism: each contribution is one IEEE subtraction (or the
    stored value itself), cast to DECIMAL(38,6) before the
    distributed sum — same exact-aggregation discipline as
    :func:`time_weighted_avg`. Scale shape: identical to TWA — one
    group-keyed window + one map-side-combinable groupBy, a single
    shuffle on the series key."""
    group_cols = list(group_cols)
    order: list[Column] = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    prev = F.lag(F.col(value_col)).over(w)
    contrib = F.when(
        F.col(value_col) >= prev, F.col(value_col) - prev
    ).otherwise(F.col(value_col))
    rows = df.select(
        *group_cols,
        contrib.cast(MONEY_DECIMAL).alias("__inc"),
        (F.col(value_col) < prev).cast("int").alias("__reset"),
        prev.isNotNull().alias("__has_prev"),
    ).where(F.col("__has_prev"))
    return rows.groupBy(*group_cols).agg(
        F.round(F.sum("__inc"), scale)
        .cast("double")
        .alias("total_increase"),
        F.sum("__reset").cast("long").alias("n_resets"),
        F.count(F.lit(1)).alias("n_samples"),
    )
