"""Time-bucket gap-fill over a grouped time series (hypertable rollup).

The reference's dashboards aggregate per-day metrics straight off the
daily DAG output (dags/daily_pipeline.py:149-156 daily summary;
analytics charts read it as a contiguous series) — days with no rows
simply vanish, and every chart/window downstream silently skips them.
Timeseries stores make the contiguous form a first-class operator
(TimescaleDB ``time_bucket_gapfill`` + ``locf``/``interpolate``); this
module is the Spark-first equivalent:

- Build the bucket SPINE executor-side: ``sequence(lo, hi)`` exploded
  per group — one row per (group, bucket) with no driver loop and no
  UDF. The spine is calendar-bounded (|groups| x days), independent of
  fact-table row count, so it does NOT grow with data scale.
- LEFT-join the aggregated actuals on (group, bucket) — one shuffle on
  a key whose cardinality equals the output, never the input.
- Fill policies per column: ``zero_cols`` coalesce to a typed zero
  (counts/sums over an empty bucket ARE zero), ``locf_cols``
  last-observation-carried-forward via ``last(col, ignorenulls=True)``
  over a group-partitioned, bucket-ordered running frame (gauges keep
  their last reading). Columns in neither list stay NULL for filled
  rows, matching TimescaleDB's default.
- ``mark_col`` labels synthesized rows so downstream consumers can
  distinguish "measured zero" from "absent bucket".

At 100 TB the shape holds: the heavy aggregation happens BEFORE this
operator on the fact table's natural partitioning; gap-fill itself
touches only the aggregated series (|groups| x buckets rows), and the
LOCF window partitions by group with a calendar-bounded partition size
— no skew, no corpus-sized window.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.timeutil import epoch_s

_PRESENT = "__gf_present"

# interval bodies accepted for `step` — a count + unit keyword only
# (the string is inlined into an expr; the allowlist keeps it inert)
_INTERVAL_BODY = re.compile(
    r"\d+ (second|minute|hour|day|week)s?", re.IGNORECASE
)


def time_bucket_gapfill(
    agg_df: DataFrame,
    *,
    group_cols: Sequence[str],
    bucket_col: str,
    zero_cols: Sequence[str] = (),
    locf_cols: Sequence[str] = (),
    interp_cols: Sequence[str] = (),
    step: str | None = None,
    mark_col: str | None = "filled",
) -> DataFrame:
    """Gap-fill an already-aggregated series ``agg_df`` holding one row
    per (group, bucket). ``bucket_col`` must be a DateType (default —
    ``sequence`` steps one day) or, with ``step`` set to a SQL
    interval body (``"1 hour"``, ``"15 minutes"``), a TimestampType
    bucket already truncated to that width (``date_trunc``); the spine
    spans the GLOBAL [min, max] bucket so every group covers the same
    range (TimescaleDB's explicit-range semantics — a group with late
    onset gets leading filled rows). ``group_cols`` may be empty for a
    single ungrouped series (dashboard charts): the spine is then the
    bare calendar and the fill windows run unpartitioned over it —
    safe because the partition is calendar-bounded, never fact-sized.

    Fill policies: ``zero_cols`` -> typed zero, ``locf_cols`` -> last
    observation carried forward, ``interp_cols`` -> LINEAR
    interpolation between the surrounding actual observations
    (TimescaleDB ``interpolate``): prev + (next - prev) * elapsed /
    span, evaluated in that exact association so any IEEE-double
    engine reproduces it bit-for-bit. Rows before the first or after
    the last observation stay NULL (no extrapolation)."""
    zero_cols = list(zero_cols)
    locf_cols = list(locf_cols)
    interp_cols = list(interp_cols)
    group_cols = list(group_cols)
    value_cols = [
        c for c in agg_df.columns
        if c not in group_cols and c != bucket_col
    ]
    # fail at construction, not at the eventual read: a typo'd fill
    # column would otherwise silently leave NULLs on filled rows
    for name, cols in (
        ("zero_cols", zero_cols),
        ("locf_cols", locf_cols),
        ("interp_cols", interp_cols),
    ):
        unknown = [c for c in cols if c not in value_cols]
        if unknown:
            raise ValueError(
                f"{name} not value columns of the input: {unknown} "
                f"(value columns: {value_cols})"
            )
    claimed = zero_cols + locf_cols + interp_cols
    dupes = {c for c in claimed if claimed.count(c) > 1}
    if dupes:
        raise ValueError(
            f"columns assigned to more than one fill policy: {sorted(dupes)}"
        )
    if step is not None and not _INTERVAL_BODY.fullmatch(step):
        raise ValueError(
            f"step must be a SQL interval body like '1 hour', got {step!r}"
        )
    bounds = agg_df.select(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    groups = agg_df.select(*group_cols).distinct()
    seq = (
        F.sequence(F.col("__lo"), F.col("__hi"))
        if step is None
        else F.expr(f"sequence(__lo, __hi, interval {step})")
    )
    spine = groups.crossJoin(F.broadcast(bounds)).select(
        *group_cols,
        F.explode(seq).alias(bucket_col),
    )
    actual = agg_df.withColumn(_PRESENT, F.lit(True))
    out = spine.join(actual, [*group_cols, bucket_col], "left")

    types = dict(agg_df.dtypes)
    filled_cols = []
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    for c in value_cols:
        col = F.col(c)
        if c in zero_cols:
            col = F.coalesce(col, F.lit(0).cast(types[c]))
        elif c in locf_cols:
            col = F.last(col, ignorenulls=True).over(w)
        elif c in interp_cols:
            prev_v = F.last(col, ignorenulls=True).over(w)
            next_v = F.first(col, ignorenulls=True).over(wn)
            obs_day = F.when(col.isNotNull(), F.col(bucket_col))
            prev_d = F.last(obs_day, ignorenulls=True).over(w)
            next_d = F.first(obs_day, ignorenulls=True).over(wn)
            if step is None:
                elapsed = F.datediff(F.col(bucket_col), prev_d)
                span = F.datediff(next_d, prev_d)
            else:
                # timestamp buckets: elapsed/span in epoch seconds —
                # exact longs, same ratio any engine reproduces
                elapsed = epoch_s(F.col(bucket_col)) - epoch_s(prev_d)
                span = epoch_s(next_d) - epoch_s(prev_d)
            frac = elapsed.cast("double") / span.cast("double")
            col = (
                F.when(col.isNotNull(), col)
                .when(prev_v.isNull() | next_v.isNull(), F.lit(None))
                .otherwise(prev_v + (next_v - prev_v) * frac)
            )
        filled_cols.append(col.alias(c))
    cols = [*group_cols, bucket_col, *filled_cols]
    if mark_col is not None:
        cols.append(F.col(_PRESENT).isNull().alias(mark_col))
    return out.select(*cols)
