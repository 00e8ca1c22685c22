"""Bucketed-table support for shuffle-free co-located joins.

At 100 TB the repeated join of facts on a shared key (orders ⋈ lineitem
on orderkey, interactions ⋈ interactions on user) dominates shuffle
volume. Writing both sides bucketed by the join key with the same
bucket count lets SortMergeJoin read co-located buckets with NO
Exchange on either side — the one-time write cost is amortized over
every subsequent join. (Spark bucketing requires saveAsTable — the
metastore records the bucket spec.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    *,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """`path` makes the table external at that location — needed when
    the session's static warehouse dir isn't writable/desired."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs the physical plan has no Exchange (verify with
    .explain)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def plan_has_shuffle(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
