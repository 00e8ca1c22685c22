"""Gold-layer aggregation family (SURVEY.md §2.5 A1-A11).

Every aggregation the reference computes — daily summaries
(dags/daily_pipeline.py:149-163), the five dashboard metric tables
(dags/micro_batch_dashboard.py:95-133), data-quality counts
(scripts/setup_source_db.py:305-314) — as parameterized groupBy/agg
operators. Catalyst compiles each to partial (map-side) + final hash
aggregation automatically; money sums go through exact decimals
(operators.exact) so results are order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.operators.exact import (
    cond_count,
    long_count,
    money_avg,
    money_sum,
)


def daily_summary(
    df: DataFrame,
    *,
    ts_col: str,
    amount_col: str,
    customer_col: str,
) -> DataFrame:
    """A1: per-day order count / revenue / distinct customers
    (reference dags/daily_pipeline.py:149-156)."""
    return df.groupBy(F.to_date(ts_col).alias("order_date")).agg(
        long_count("total_orders"),
        money_sum(amount_col, "total_revenue"),
        F.countDistinct(customer_col).alias("unique_customers"),
    )


def group_performance(
    df: DataFrame,
    *,
    group_col: str,
    order_col: str,
    amount: Column,
) -> DataFrame:
    """A2/A5: per-group order count + revenue
    (reference dags/daily_pipeline.py:158-163)."""
    return df.groupBy(F.col(group_col)).agg(
        F.countDistinct(order_col).alias("order_count"),
        money_sum(amount, "revenue"),
    )


def overall_metrics(
    df: DataFrame, *, amount_col: str, customer_col: str
) -> DataFrame:
    """A3: ungrouped dashboard headline metrics, div-by-zero-safe via
    coalesce (reference dags/micro_batch_dashboard.py:95-101)."""
    return df.agg(
        long_count("total_orders"),
        F.coalesce(money_sum(amount_col, "total_revenue"), F.lit(0.0)).alias(
            "total_revenue"
        ),
        F.coalesce(money_avg(amount_col, "avg_order_value"), F.lit(0.0)).alias(
            "avg_order_value"
        ),
        F.countDistinct(customer_col).alias("unique_customers"),
    )


def hourly_stats(
    df: DataFrame, *, ts_col: str, amount_col: str
) -> DataFrame:
    """A7: per-hour counts + value
    (reference dags/micro_batch_dashboard.py:127-133)."""
    return df.groupBy(F.hour(ts_col).cast("long").alias("hour")).agg(
        long_count("event_count"),
        money_sum(amount_col, "total_value"),
    )


def quality_counts(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """A10: one-row conditional-aggregation data-quality report
    (reference scripts/setup_source_db.py:305-314). `rules` maps output
    column name -> boolean Column."""
    return df.agg(
        long_count("total_rows"),
        *[cond_count(cond, name) for name, cond in rules.items()],
    )


def cascade_rollup(
    df: DataFrame,
    *,
    ts_col: str,
    keys: list[str],
    value_col: str,
    levels: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """Hypertable-style continuous aggregate: roll up through time
    resolutions where each level aggregates the PREVIOUS level's rows,
    never the raw data — at 100 TB the hourly job reads the (tiny)
    minutely aggregate, and a backfill recomputes one fine-grained
    window instead of rescanning history.

    Correctness rests on decomposability: COUNT and DECIMAL(38,6) SUM
    are exactly associative (operators/exact.py discipline), so the
    cascade is bit-identical to aggregating raw data directly — which
    is exactly what the registry oracle checks. Averages/ratios must be
    derived from the composed sums at read time, never cascaded.

    Returns (bucket, *keys, n_events, __sv) at the coarsest level with
    the decimal sum unrounded; callers round/rename at the edge.
    """
    dec = F.col(value_col).cast("decimal(38,6)")
    cur = df.groupBy(
        F.date_trunc(levels[0], ts_col).alias("bucket"), *keys
    ).agg(F.count(F.lit(1)).alias("n_events"), F.sum(dec).alias("__sv"))
    for lvl in levels[1:]:
        cur = cur.groupBy(
            F.date_trunc(lvl, "bucket").alias("bucket"), *keys
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("__sv").alias("__sv"),
        )
    return cur


def funnel_counts(
    events: DataFrame,
    *,
    stages: list[tuple[str, Column]],
    user_col: str,
    ts_col: Column,
) -> DataFrame:
    """Ordered funnel analysis: how many users performed stage 1, then
    stage 2 STRICTLY AFTER their first stage-1 event, then stage 3
    after that, ... Emits one row per stage: (stage, n_users), where
    stage is '<i>_<name>' so the funnel sorts naturally.

    ``stages`` is an ordered list of (name, predicate-Column); the
    timestamp expression ``ts_col`` must be epoch-comparable
    (timeutil.epoch_us for NTZ safety).

    Shape: each stage is one filtered aggregation on the user key
    joined to the previous frontier — k stages cost k user-key
    shuffles over progressively SHRINKING user sets (the funnel
    property), never a per-event window. The frontier frames are
    (user, ts) pairs — broadcast-eligible once the funnel narrows.
    """
    ev = events.select(
        F.col(user_col).alias("__u"), ts_col.alias("__ts"), "*"
    )
    frontier = None
    out_rows = []
    for i, (name, pred) in enumerate(stages, 1):
        stage_ev = ev.where(pred)
        if frontier is None:
            frontier = stage_ev.groupBy("__u").agg(
                F.min("__ts").alias("__t")
            )
        else:
            frontier = (
                stage_ev.join(
                    frontier.withColumnRenamed("__t", "__prev_t"), "__u"
                )
                .where(F.col("__ts") > F.col("__prev_t"))
                .groupBy("__u")
                .agg(F.min("__ts").alias("__t"))
            )
        out_rows.append(
            frontier.agg(
                F.count(F.lit(1)).cast("long").alias("n_users")
            ).select(F.lit(f"{i}_{name}").alias("stage"), "n_users")
        )
    out = out_rows[0]
    for o in out_rows[1:]:
        out = out.unionByName(o)
    return out
