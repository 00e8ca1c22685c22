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


# SQLSTATEs for "table does not exist" / "table already exists"
# across the dialects this sink targets (Derby, Postgres, MySQL/
# SQLServer). Anything NOT in these sets propagates: a transient
# connection failure while probing state must FAIL the batch (Spark
# retries it), never be misread as "first batch" — that misread was
# a silent double-append.
_MISSING_TABLE_STATES = {"42X05", "42P01", "42S02", "S0002", "42Y55"}
_EXISTS_TABLE_STATES = {"X0Y32", "42P07", "42S01"}


def _sqlstate(exc: Exception) -> str | None:
    je = getattr(exc, "java_exception", None)
    while je is not None:
        try:
            state = je.getSQLState()
        except Exception:
            state = None
        if state:
            return str(state)
        try:
            je = je.getCause()
        except Exception:
            return None
    return None


def _driver_connection(spark: SparkSession, url: str, props: dict):
    """One driver-side JDBC connection for the transactional publish
    step. Only metadata DDL and set-oriented INSERT..SELECT run on it
    — no row data crosses the driver."""
    jvm = spark._sc._gateway.jvm
    if "driver" in props:
        jvm.java.lang.Class.forName(props["driver"])
    jprops = jvm.java.util.Properties()
    for k in ("user", "password"):
        if k in props:
            jprops.setProperty(k, props[k])
    return jvm.java.sql.DriverManager.getConnection(url, jprops)


def _qcol(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def _exec_ignoring(conn, sql: str, states: set[str]) -> bool:
    st = conn.createStatement()
    try:
        st.executeUpdate(sql)
        return True
    except Exception as exc:  # noqa: BLE001 — filtered by SQLSTATE
        if _sqlstate(exc) in states:
            return False
        raise
    finally:
        st.close()


def idempotent_jdbc_append(
    df: DataFrame,
    *,
    batch_id: int,
    url: str,
    table: str,
    marker_table: str | None = None,
    properties: dict[str, str] | None = None,
    batchsize: int = 1000,
    staging_table: str | None = None,
) -> bool:
    """Exactly-once-under-redelivery JDBC append — the contract a
    foreachBatch sink to an RDBMS needs (Spark can re-deliver a
    micro-batch after a crash; a plain append then double-writes).

    Protocol (staged publish — every crash window is closed, unlike
    the earlier marker-read-before-write version whose data/marker
    gap leaked duplicates that CARRIED an applied batch_id):

    1. marker probe on a driver JDBC connection — a redelivered
       batch_id is a no-op (returns False). Only SQLSTATEs meaning
       "table missing" are treated as first-run; transient errors
       propagate and fail the batch so Spark retries it.
    2. Spark writes the batch to a per-sink STAGING table in
       ``overwrite`` mode — idempotent under any retry.
    3. the publish is ONE database transaction on the driver
       connection: ``INSERT INTO target SELECT .. FROM staging`` +
       ``INSERT INTO marker VALUES (batch_id)``, then COMMIT. A crash
       anywhere before the commit leaves target and marker untouched;
       a crash after it is a completed batch the retry skips at (1).
    4. staging drop is best-effort cleanup (a leftover is overwritten
       by the next batch).

    At 100 TB the Spark staging write is the distributed bulk path
    (batched inserts from every executor); the publish INSERT..SELECT
    is set-oriented inside the database — no row data ever moves
    through the driver.

    Returns True when the batch was applied, False on redelivery.
    """
    spark = df.sparkSession
    mt = marker_table or f"{table}_applied"
    st_table = staging_table or f"{table}_stage"
    props = properties or {}
    tagged = df.withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
    cols = ", ".join(_qcol(c) for c in tagged.columns)

    conn = _driver_connection(spark, url, props)
    try:
        _exec_ignoring(
            conn,
            f'CREATE TABLE {mt} ("batch_id" BIGINT)',
            _EXISTS_TABLE_STATES,
        )
        probe = conn.createStatement()
        rs = probe.executeQuery(
            f'SELECT 1 FROM {mt} WHERE "batch_id" = {int(batch_id)}'
        )
        seen = rs.next()
        rs.close()
        probe.close()
        if seen:
            _exec_ignoring(
                conn, f"DROP TABLE {st_table}", _MISSING_TABLE_STATES
            )
            return False

        writer = (
            tagged.write.format("jdbc")
            .option("url", url)
            .option("dbtable", st_table)
            .option("batchsize", batchsize)
            .mode("overwrite")
        )
        for k, v in props.items():
            writer = writer.option(k, v)
        writer.save()

        _exec_ignoring(
            conn,
            f"CREATE TABLE {table} AS SELECT {cols} FROM {st_table}"
            " WITH NO DATA",
            _EXISTS_TABLE_STATES,
        )
        conn.setAutoCommit(False)
        try:
            stmt = conn.createStatement()
            stmt.executeUpdate(
                f"INSERT INTO {table} ({cols})"
                f" SELECT {cols} FROM {st_table}"
            )
            stmt.executeUpdate(
                f'INSERT INTO {mt} ("batch_id") VALUES ({int(batch_id)})'
            )
            stmt.close()
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.setAutoCommit(True)
        _exec_ignoring(
            conn, f"DROP TABLE {st_table}", _MISSING_TABLE_STATES
        )
        return True
    finally:
        conn.close()
