"""M4 series downsampling (Jugel et al., "M4: A Visualization-Oriented
Time Series Data Aggregation", VLDB 2014).

Given a target width of ``n_buckets`` pixels per series, M4 keeps per
bucket the FIRST, LAST, MIN and MAX points — the minimal set that
makes the downsampled line render pixel-identically to the full
series.  This is the standard dashboard-scale downsampler
(Grafana/ClickHouse ship it as first-class); the reference's dashboard
layer re-plots full hourly aggregates instead
(dags/micro_batch_dashboard.py), which stops scaling long before
100 TB.

Shape (two stages, both single-shuffle on the series key):

1. Per-series bounds ``(t0, t1)`` via one map-side-combinable groupBy,
   broadcast-joined back (the bounds table is |series|-sized — tiny
   relative to the fact stream).
2. Bucket id ``k = min(n-1, (t - t0) * n DIV (t1 - t0 + 1))`` in pure
   BIGINT arithmetic — exact floor division on nonnegative longs, so
   Spark and DuckDB agree bit-for-bit (no IEEE rounding in the bucket
   boundary).  Then ONE hash aggregation on (series, k): first/last
   points via lexicographic ``min/max(struct(t, tiebreak, v))``,
   min/max points via ``min/max(struct(v, t, tiebreak))`` — all
   map-side combinable, deterministic under ts and value ties, no
   window pass and no row_number materialization.

Output is output-sized: |series| x n_buckets rows regardless of input
volume.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.timeutil import epoch_s


def m4_downsample(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    n_buckets: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per (group_cols..., bucket) M4 row::

        (group_cols..., bucket, t_first_s, v_first, t_last_s, v_last,
         v_min, t_min_s, v_max, t_max_s, n_points)

    ``bucket`` partitions the series' OBSERVED range [t0, t1] into
    ``n_buckets`` equal-width cells (integer epoch-second arithmetic;
    a single-instant series collapses into bucket 0).  ``tiebreak_col``
    (e.g. the event id) makes every selected point deterministic when
    timestamps or values repeat.
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    group_cols = list(group_cols)
    t_s = epoch_s(F.col(ts_col))
    pts = df.select(
        *group_cols,
        t_s.alias("__t"),
        F.col(value_col).alias("__v"),
        *(
            [F.col(tiebreak_col).alias("__i")]
            if tiebreak_col is not None
            else []
        ),
    )
    bounds = pts.groupBy(*group_cols).agg(
        F.min("__t").alias("__t0"), F.max("__t").alias("__t1")
    )
    joined = pts.join(F.broadcast(bounds), group_cols)
    k = F.least(
        F.lit(n_buckets - 1),
        F.expr(
            f"(__t - __t0) * {int(n_buckets)}"
            " DIV (__t1 - __t0 + 1)"
        ),
    ).cast("long")
    tie = [F.col("__i")] if tiebreak_col is not None else []
    time_edge = F.struct(F.col("__t"), *tie, F.col("__v").alias("v"))
    val_edge = F.struct(F.col("__v").alias("v"), F.col("__t"), *tie)
    return (
        joined.withColumn("bucket", k)
        .groupBy(*group_cols, "bucket")
        .agg(
            F.min(time_edge).getField("__t").alias("t_first_s"),
            F.min(time_edge).getField("v").alias("v_first"),
            F.max(time_edge).getField("__t").alias("t_last_s"),
            F.max(time_edge).getField("v").alias("v_last"),
            F.min(val_edge).getField("v").alias("v_min"),
            F.min(val_edge).getField("__t").alias("t_min_s"),
            F.max(val_edge).getField("v").alias("v_max"),
            F.max(val_edge).getField("__t").alias("t_max_s"),
            F.count(F.lit(1)).alias("n_points"),
        )
    )
