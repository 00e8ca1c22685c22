"""JDBC source/sink builders (SURVEY.md §2.1 S1-S2, §2.2 K6).

The reference embeds predicates in SQL strings shipped to Postgres
(dags/daily_pipeline.py:54-66). In Spark the same pushdown comes from
Catalyst: express filters on the DataFrame and they are translated into
the JDBC WHERE clause (verify via .explain 'PushedFilters'). Partition
options parallelize the scan — the reference's single-connection
pandas read is the one-partition degenerate case.

Untestable in this container (no database); kept thin and
config-driven so the query logic stays in the operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_jdbc_table(
    spark: SparkSession,
    *,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    return reader.load()


def daily_orders_extract(
    orders: DataFrame,
    *,
    ds: str,
    ts_col: str = "order_date",
    status_col: str = "status",
    statuses: tuple[str, ...] = ("completed", "processing"),
) -> DataFrame:
    """S1: the reference's daily extract predicate
    (dags/daily_pipeline.py:54-66) as composable filters — Catalyst
    pushes both to the source (JDBC WHERE or parquet row groups)."""
    return (
        orders.where(F.to_date(F.col(ts_col)) == F.lit(ds))
        .where(F.col(status_col).isin(*statuses))
        .orderBy(ts_col)
    )


def write_jdbc_append(
    df: DataFrame,
    *,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    batchsize: int = 1000,
) -> None:
    """K6: chunked append (the reference's 1000-row to_sql chunks,
    scripts/setup_source_db.py:264-270, as JDBC batchsize)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchsize)
        .mode("append")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
