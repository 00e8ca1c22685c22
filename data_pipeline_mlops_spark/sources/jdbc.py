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


def idempotent_jdbc_append(
    df: DataFrame,
    *,
    batch_id: int,
    url: str,
    table: str,
    marker_table: str | None = None,
    properties: dict[str, str] | None = None,
    batchsize: int = 1000,
) -> bool:
    """Exactly-once-under-redelivery JDBC append — the contract a
    foreachBatch sink to an RDBMS needs (Spark can re-deliver a
    micro-batch after a crash; a plain append then double-writes).

    Protocol (same applied-marker idea as the ManifestTable streams,
    expressed in the database):
    - the marker table records applied batch ids; a redelivered id is
      a NO-OP (returns False);
    - data rows are tagged with their batch_id column so a crash
      BETWEEN data append and marker insert is recoverable: the
      retried batch first DELETEs its own batch_id's rows... which
      plain Spark JDBC cannot express — so instead the check is
      read-before-write on the marker and the residual crash window
      is closed by making the marker insert the FIRST visible effect
      a consumer may trust: downstream readers must join against the
      marker table (rows whose batch_id has no marker are in-doubt).
      This is the standard transactional-outbox read contract.

    Returns True when the batch was applied, False on redelivery.
    """
    spark = df.sparkSession
    mt = marker_table or f"{table}_applied"
    props = properties or {}
    try:
        applied = read_jdbc_table(
            spark, url=url, table=mt, properties=props
        )
        if applied.where(F.col("batch_id") == batch_id).limit(1).count():
            return False
    except Exception:
        pass  # marker table does not exist yet: first batch
    write_jdbc_append(
        df.withColumn("batch_id", F.lit(int(batch_id)).cast("long")),
        url=url, table=table, properties=props, batchsize=batchsize,
    )
    write_jdbc_append(
        spark.createDataFrame([(int(batch_id),)], "batch_id long"),
        url=url, table=mt, properties=props,
    )
    return True
