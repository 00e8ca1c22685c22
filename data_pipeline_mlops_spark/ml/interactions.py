"""Interaction extraction + train/eval split (SURVEY.md §2.10 M1-M3).

M1: distinct (user, item) pairs from the cleaned fact
(reference dags/daily_pipeline.py:200-210). M2: the reference's
sklearn stratified 80/20 split (dags/daily_pipeline.py:217-224) is not
bit-reproducible distributed; parity is defined distributionally
(SURVEY.md §7 hard part 1) — we stratify by user with a seeded,
hash-based deterministic split so the same row always lands on the same
side regardless of partitioning (critical for incremental re-runs at
scale). M3: eval accumulation = union + keep-latest dedup
(operators.dedup.dedup_keep_latest with explicit date ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.operators.dedup import (
    dedup_keep_latest,
    distinct_pairs,
)
from data_pipeline_mlops_spark.operators.setops import union_all


def extract_interactions(
    df: DataFrame, *, user_col: str, item_col: str, ts_col: str | None = None
) -> DataFrame:
    """M1: distinct (user, item) pairs; keeps latest ts when given."""
    if ts_col is None:
        return distinct_pairs(df, [user_col, item_col])
    return df.groupBy(user_col, item_col).agg(F.max(ts_col).alias(ts_col))


def split_train_eval(
    interactions: DataFrame,
    *,
    user_col: str,
    item_col: str,
    eval_fraction: float = 0.2,
    seed: int = 42,
    method: str = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """M2: deterministic stratified-ish split.

    Hash (user, item, seed) -> [0, 1); rows under the eval fraction go
    to eval. Unlike `randomSplit` this is stable under repartitioning
    and re-runs — at 100 TB, re-computing the split must not reshuffle
    membership. Guarantees train ∪ eval = all, train ∩ eval = ∅.

    `method`: "xxhash64" (fast JVM hash, production default) or "md5"
    (same guarantees, reproducible in any engine with md5 — used by the
    DuckDB oracle; see split_side_md5).
    """
    if method == "md5":
        tagged = interactions.withColumn(
            "__is_eval",
            split_side_md5(user_col, item_col, seed, eval_fraction),
        )
    else:
        bucket = (
            F.abs(F.xxhash64(F.col(user_col), F.col(item_col), F.lit(seed)))
            / F.lit(float(2**63))
        )
        tagged = interactions.withColumn("__is_eval", bucket < eval_fraction)
    train = tagged.where(~F.col("__is_eval")).drop("__is_eval")
    ev = tagged.where(F.col("__is_eval")).drop("__is_eval")
    return train, ev


def split_side_md5(
    user_col: str, item_col: str, seed: int, eval_fraction: float
) -> "F.Column":
    """Engine-portable split predicate: 60-bit integer from the first
    15 hex chars of md5("user|item|seed"), eval iff below the integer
    threshold floor(eval_fraction * 2^60). Pure integer comparison —
    bit-identical in Spark and DuckDB
    (('0x'||substring(md5(...),1,15))::BIGINT on the oracle side)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col(user_col).cast("string"),
                    F.col(item_col).cast("string"),
                    F.lit(str(seed)),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return h < int(eval_fraction * (2**60))


def accumulate_eval(
    eval_sets: list[DataFrame],
    *,
    user_col: str,
    item_col: str,
    order_col: str,
) -> DataFrame:
    """M3: union all historical eval sets, keep the latest row per
    (user, item) by `order_col` (reference dags/daily_pipeline.py:248-284,
    with the concat-order dependence replaced by explicit ordering)."""
    unioned = union_all(eval_sets)
    return dedup_keep_latest(
        unioned, [user_col, item_col], [F.col(order_col).desc()]
    )


def with_stratum(
    df: DataFrame, *, user_col: str, min_count: int = 2
) -> DataFrame:
    """The reference's stratification fix: customers with fewer than
    `min_count` interactions collapse into an 'other' stratum so a
    stratified split never sees singleton classes
    (reference dags/daily_pipeline.py:221-223)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col)
    return df.withColumn(
        "stratum",
        F.when(
            F.count(F.lit(1)).over(w) >= min_count, F.col(user_col)
        ).otherwise(F.lit("other")),
    )
