"""Sort / limit / top-k operators (SURVEY.md §2.7 O1-O6).

Global top-k (O3, reference dags/micro_batch_dashboard.py:110) compiles
to TakeOrderedAndProject — each partition keeps k rows, only k*partitions
rows reach the driver, so it scales to any input size. Per-group top-k
(O4, the recommender's argsort head, reference
dags/daily_pipeline.py:522-524) is a rank window: one shuffle on the
group key. Both take explicit tiebreakers so results are deterministic
under ties (floats rounded upstream can collide).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """O3: global top-k. Pass a deterministic ordering (measure desc +
    unique key asc)."""
    return df.orderBy(*order_cols).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """O4: per-group top-k with the rank kept as a column."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
