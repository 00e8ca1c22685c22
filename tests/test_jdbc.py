"""Live JDBC integration (SURVEY.md §2.1 S1, §2.2 K6) against embedded
Apache Derby — the one JDBC engine shipped in Spark's own jars
($SPARK_HOME/jars/derby*.jar, present for the Hive metastore).

The reference's JDBC surface is a Postgres extract with the predicate
evaluated IN the database (reference dags/daily_pipeline.py:54-66) and
a chunked seed write (scripts/setup_source_db.py:246-272). No Postgres
exists in this container; Derby-over-JDBC exercises the same Spark code
paths — DriverRegistry, JDBCRelation filter pushdown, batched
INSERT — so sources/jdbc.py is tested, not merely declared.
"""

from __future__ import annotations

import pytest

from data_pipeline_mlops_spark.sources.jdbc import (
    daily_orders_extract,
    read_jdbc_table,
    write_jdbc_append,
)

DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_roundtrip_append_and_read(spark, derby_url):
    """K6 -> S1: batched append then full read-back preserves rows,
    types, and the 1000-row batch contract (reference to_sql
    chunksize=1000)."""
    from pyspark.sql import functions as F

    df = spark.range(2500).select(
        F.col("id").cast("int").alias("order_id"),
        (F.col("id") % 7).cast("int").alias("quantity"),
        (F.col("id") * 1.5).cast("double").alias("price"),
        F.when(F.col("id") % 2 == 0, "completed")
        .otherwise("processing")
        .alias("status"),
    )
    write_jdbc_append(
        df, url=derby_url, table="orders_rt", properties=PROPS,
        batchsize=1000,
    )
    back = read_jdbc_table(
        spark, url=derby_url, table="orders_rt", properties=PROPS
    )
    assert back.count() == 2500
    assert {f.name.lower() for f in back.schema.fields} == {
        "order_id", "quantity", "price", "status",
    }
    total = back.agg(F.sum("quantity")).collect()[0][0]
    assert total == sum(i % 7 for i in range(2500))
    # append mode really appends (second write doubles the rows)
    write_jdbc_append(
        df.limit(10), url=derby_url, table="orders_rt", properties=PROPS
    )
    assert (
        read_jdbc_table(
            spark, url=derby_url, table="orders_rt", properties=PROPS
        ).count()
        == 2510
    )


def test_jdbc_filter_pushdown_reaches_source(spark, derby_url):
    """S1: Catalyst pushes the isin + comparison predicates into the
    JDBC scan (the reference embeds them in the SQL string shipped to
    Postgres; here .where() compiles to the same WHERE clause —
    visible as PushedFilters on the JDBCRelation scan)."""
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.col("id").cast("int").alias("order_id"),
        F.when(F.col("id") % 3 == 0, "completed")
        .when(F.col("id") % 3 == 1, "processing")
        .otherwise("cancelled")
        .alias("status"),
    )
    # Spark maps StringType to Derby CLOB by default, and Derby cannot
    # evaluate predicates on CLOB — pin VARCHAR so the pushed WHERE is
    # executable in the database (same reason the reference's DDL uses
    # VARCHAR(n), scripts/setup_source_db.py:48-93)
    write_jdbc_append(
        df,
        url=derby_url,
        table="orders_pd",
        properties={**PROPS, "createTableColumnTypes": "status VARCHAR(32)"},
    )
    scan = read_jdbc_table(
        spark, url=derby_url, table="orders_pd", properties=PROPS
    )
    q = scan.where(
        F.col("status").isin("completed", "processing")
    ).where(F.col("order_id") < 100)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "In(STATUS" in plan or "In(status" in plan
    assert "LessThan(ORDER_ID,100)" in plan or "LessThan(order_id,100)" in plan
    # and the pushed plan returns exactly the right rows
    assert q.count() == sum(1 for i in range(100) if i % 3 != 2)


def test_jdbc_partitioned_parallel_read(spark, derby_url):
    """S1 at scale: partitionColumn splits the extract into N
    concurrent range queries (the reference's single-connection pandas
    read is the numPartitions=1 degenerate case)."""
    from pyspark.sql import functions as F

    df = spark.range(4000).select(
        F.col("id").cast("int").alias("order_id"),
        (F.col("id") % 100).cast("int").alias("quantity"),
    )
    write_jdbc_append(
        df, url=derby_url, table="orders_part", properties=PROPS
    )
    scan = read_jdbc_table(
        spark,
        url=derby_url,
        table="orders_part",
        properties=PROPS,
        partition_column="ORDER_ID",
        num_partitions=4,
        lower_bound=0,
        upper_bound=4000,
    )
    assert scan.rdd.getNumPartitions() == 4
    assert scan.count() == 4000


def test_jdbc_daily_extract_predicate_on_live_table(spark, derby_url):
    """S1 end-to-end: the reference's exact daily-extract shape
    (date truncation + status membership + sort) evaluated against a
    live JDBC table via daily_orders_extract."""
    from datetime import datetime

    rows = [
        (1, datetime(2024, 3, 1, 9, 0), "completed"),
        (2, datetime(2024, 3, 1, 12, 0), "processing"),
        (3, datetime(2024, 3, 1, 15, 0), "cancelled"),  # wrong status
        (4, datetime(2024, 3, 2, 9, 0), "completed"),  # wrong day
    ]
    df = spark.createDataFrame(
        rows, "order_id int, order_date timestamp, status string"
    )
    write_jdbc_append(
        df,
        url=derby_url,
        table="orders_daily",
        properties={**PROPS, "createTableColumnTypes": "status VARCHAR(32)"},
    )
    scan = read_jdbc_table(
        spark, url=derby_url, table="orders_daily", properties=PROPS
    )
    # Spark quotes identifiers at table creation, so names round-trip
    # in their original (lower) case
    out = daily_orders_extract(scan, ds="2024-03-01").collect()
    assert [r["order_id"] for r in out] == [1, 2]


def test_idempotent_append_exactly_once(spark, derby_url):
    from data_pipeline_mlops_spark.sources.jdbc import (
        idempotent_jdbc_append,
        read_jdbc_table,
    )

    df = spark.createDataFrame([(1, "x"), (2, "y")], "id bigint, s string")
    assert idempotent_jdbc_append(
        df, batch_id=0, url=derby_url, table="sink_eo", properties=PROPS
    )
    # redelivery: no-op, no duplicate rows
    assert not idempotent_jdbc_append(
        df, batch_id=0, url=derby_url, table="sink_eo", properties=PROPS
    )
    got = read_jdbc_table(
        spark, url=derby_url, table="sink_eo", properties=PROPS
    )
    assert got.count() == 2
    # next batch lands
    assert idempotent_jdbc_append(
        spark.createDataFrame([(3, "z")], "id bigint, s string"),
        batch_id=1, url=derby_url, table="sink_eo", properties=PROPS,
    )
    assert got.count() == 3
    # the transactional-outbox read contract: trusted rows join the
    # marker table
    markers = read_jdbc_table(
        spark, url=derby_url, table="sink_eo_applied", properties=PROPS
    )
    trusted = got.join(markers, "batch_id", "left_semi")
    assert trusted.count() == 3


def test_idempotent_append_crash_windows(spark, derby_url):
    """Every crash window of the staged-publish protocol:
    (a) crash AFTER staging, BEFORE publish — retry overwrites the
        stage and publishes exactly one copy;
    (b) crash AFTER commit, BEFORE staging drop — retry sees the
        marker, returns False, and cleans the leftover stage;
    (c) a non-missing-table error during the marker probe PROPAGATES
        (it must fail the batch, not be misread as 'first batch')."""
    from pyspark.sql import functions as F

    from data_pipeline_mlops_spark.sources.jdbc import (
        idempotent_jdbc_append,
        read_jdbc_table,
    )

    df = spark.createDataFrame([(10, "a"), (11, "b")], "id bigint, s string")

    # (a) simulate the stage-then-crash state: only the staging write
    # ran (same shape the real function writes), no publish happened.
    staged = df.withColumn("batch_id", F.lit(7).cast("long"))
    (
        staged.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "sink_cw_stage")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .mode("overwrite")
        .save()
    )
    assert idempotent_jdbc_append(
        df, batch_id=7, url=derby_url, table="sink_cw", properties=PROPS
    )
    got = read_jdbc_table(
        spark, url=derby_url, table="sink_cw", properties=PROPS
    )
    assert got.count() == 2  # exactly one copy despite the pre-stage

    # (b) leftover stage + applied marker == crash after commit:
    (
        staged.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "sink_cw_stage")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .mode("overwrite")
        .save()
    )
    assert not idempotent_jdbc_append(
        df, batch_id=7, url=derby_url, table="sink_cw", properties=PROPS
    )
    assert got.count() == 2
    with pytest.raises(Exception):
        read_jdbc_table(  # stage was cleaned up
            spark, url=derby_url, table="sink_cw_stage", properties=PROPS
        ).count()

    # (c) a genuine SQL error (invalid marker-table identifier) is NOT
    # swallowed as "first batch":
    with pytest.raises(Exception):
        idempotent_jdbc_append(
            df, batch_id=8, url=derby_url, table="sink_cw",
            marker_table="1 bogus !", properties=PROPS,
        )
