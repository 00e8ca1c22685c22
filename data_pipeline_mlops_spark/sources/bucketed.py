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
from pyspark.sql import functions as F


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


def ensure_bucketed_fact_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> tuple[str, str]:
    """Write orders + lineitem bucketed by orderkey (once per session
    per sf_dir; the in-memory catalog makes this self-cleaning across
    driver runs). Both sides carry the join key under the SAME name —
    bucket pruning requires the join condition to be on the bucket
    columns. Returns the (orders, lineitem) table names."""
    from data_pipeline_mlops_spark.sources.tables import load_table

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    t_orders, t_lineitem = f"b_orders_{tag}", f"b_lineitem_{tag}"
    if not (
        spark.catalog.tableExists(t_orders)
        and spark.catalog.tableExists(t_lineitem)
    ):
        # the default warehouse dir outlives the in-memory catalog: a
        # table written by a previous session leaves its location behind
        # and saveAsTable refuses to reuse it — clear stale leftovers
        import shutil
        from urllib.parse import urlparse

        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for t in (t_orders, t_lineitem):
            if not spark.catalog.tableExists(t):
                shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        lineitem = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"),
            "l_extendedprice",
            "l_quantity",
        )
        write_bucketed(
            orders, table=t_orders, bucket_col="o_orderkey",
            n_buckets=n_buckets,
        )
        write_bucketed(
            lineitem, table=t_lineitem, bucket_col="o_orderkey",
            n_buckets=n_buckets,
        )
    return t_orders, t_lineitem
