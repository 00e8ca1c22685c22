"""State-duration and liveness aggregation over irregular event series
(hypertable tier, alongside operators/timeweight.py and gapfill.py).

Two first-class timeseries-store aggregates the reference's dashboard
layer approximates with plain counts (dags/micro_batch_dashboard.py
hourly GROUP BY):

- :func:`duration_in_state` — TimescaleDB ``state_agg`` →
  ``duration_in`` parity: a categorical column is treated as a state
  machine per series; each observation's state HOLDS until the next
  observation of the same series (LOCF, exactly the posture of
  operators/timeweight.py), and the aggregate is the total number of
  seconds each (series, state) pair was held.  The last observation of
  a series carries no interval and is excluded (no extrapolation).
- :func:`heartbeat_uptime` — TimescaleDB ``heartbeat_agg`` →
  ``uptime``/``num_live_ranges`` parity: each observation asserts the
  series is live for ``liveness_seconds`` after it; the aggregate is
  the LENGTH OF THE UNION of those intervals (overlaps merged), the
  number of merged live segments, and the observed span — the classic
  gaps-and-islands form.

Determinism and exactness: every quantity is integer seconds derived
from the shared ``epoch_s`` floor (timeutil.py), so sums are exact
longs at any parallelism — no decimal routing is needed.  Ratios
(``coverage``) are a single IEEE division of two exact longs, rounded
once, so they are bit-identical on any engine.

At 100 TB: both operators are one window over the series key followed
by one map-side-combinable groupBy on (a superset of) the same key —
a single shuffle on the series key, per-partition state bounded by the
series length, never the corpus.  The islands pass in
:func:`heartbeat_uptime` uses a running MAX over an unbounded-preceding
frame, which Spark evaluates streamingly within the partition (O(1)
memory per row).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.timeutil import epoch_s


def _series_order(
    ts_col: str, tiebreak_col: str | None
) -> list[Column]:
    order: list[Column] = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    return order


def duration_in_state(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    ts_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Seconds each (group, state) was held under LOCF semantics.

    Returns one row per (group_cols..., state) observed with at least
    one following observation: ``(group_cols..., <state_col>,
    state_seconds, n_intervals)``.  A series with a single observation
    produces no row.  Tied timestamps hold for zero seconds in
    ``tiebreak_col`` order (pass the event id when ts can repeat).
    """
    group_cols = list(group_cols)
    w = Window.partitionBy(*group_cols).orderBy(
        *_series_order(ts_col, tiebreak_col)
    )
    t_s = epoch_s(F.col(ts_col))
    dt = F.lead(t_s).over(w) - t_s
    rows = df.select(
        *group_cols, state_col, dt.alias("__dt")
    ).where(F.col("__dt").isNotNull())
    return rows.groupBy(*group_cols, state_col).agg(
        F.sum("__dt").cast("long").alias("state_seconds"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def heartbeat_uptime(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    ts_col: str,
    liveness_seconds: int,
    coverage_scale: int = 6,
) -> DataFrame:
    """Union length of per-observation liveness intervals, per group.

    Each observation at epoch ``t`` asserts liveness over
    ``[t, t + liveness_seconds)``.  Overlapping/adjacent intervals
    merge (an interval starting exactly at a running end extends the
    segment — half-open semantics); the result per group is::

        (group_cols..., uptime_seconds, n_segments,
         first_seen_s, last_seen_s, coverage)

    where ``coverage = round(uptime / (last_seen + liveness -
    first_seen), scale)`` — the live fraction of the padded observed
    span (1.0 for a gap-free series).  Duplicate timestamps are
    harmless (same interval twice merges to itself).
    """
    if liveness_seconds <= 0:
        raise ValueError("liveness_seconds must be positive")
    group_cols = list(group_cols)
    t_s = epoch_s(F.col(ts_col))
    pts = df.select(*group_cols, t_s.alias("__t"))
    w = Window.partitionBy(*group_cols).orderBy(F.col("__t").asc())
    prev_end = F.max(F.col("__t") + F.lit(liveness_seconds)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_seg = F.when(
        prev_end.isNull() | (F.col("__t") > prev_end), F.lit(1)
    ).otherwise(F.lit(0))
    segs = pts.select(
        *group_cols,
        F.col("__t"),
        F.sum(new_seg).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("__seg"),
    )
    per_seg = segs.groupBy(*group_cols, "__seg").agg(
        F.min("__t").alias("__start"),
        (F.max("__t") + F.lit(liveness_seconds)).alias("__end"),
    )
    span = (
        F.max("__end") - F.min("__start")
    ).cast("double")
    return per_seg.groupBy(*group_cols).agg(
        F.sum(F.col("__end") - F.col("__start"))
        .cast("long")
        .alias("uptime_seconds"),
        F.count(F.lit(1)).alias("n_segments"),
        F.min("__start").cast("long").alias("first_seen_s"),
        (F.max("__end") - F.lit(liveness_seconds))
        .cast("long")
        .alias("last_seen_s"),
        F.round(
            F.sum(F.col("__end") - F.col("__start")).cast("double")
            / span,
            coverage_scale,
        ).alias("coverage"),
    )
