"""Regression: timestamp helpers must work on both TIMESTAMP and
TIMESTAMP_NTZ.  The driver testdata stores ``ts`` as timestamp[us]
without a timezone (read as NTZ on Spark 4.x), and round-3 broke three
queries by calling LTZ-only ops (unix_micros / cast("long")) on it."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.timeutil import epoch_s, epoch_us

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def ntz_parquet(tmp_path_factory):
    """Parquet with a truly timezone-less timestamp column (what the
    driver testdata looks like)."""
    path = str(tmp_path_factory.mktemp("ntz") / "events.parquet")
    ts = pa.array(
        [T0, T0 + datetime.timedelta(seconds=1, microseconds=500_000)],
        type=pa.timestamp("us"),  # no tz -> TIMESTAMP_NTZ in Spark
    )
    pq.write_table(pa.table({"ts": ts, "v": pa.array([1, 2])}), path)
    return path


def test_epoch_us_on_ntz_parquet(spark, ntz_parquet):
    df = spark.read.parquet(ntz_parquet)
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    rows = (
        df.select(epoch_us("ts").alias("us"), epoch_s("ts").alias("s"))
        .orderBy("us")
        .collect()
    )
    base_us = int(T0.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6)
    assert [r.us for r in rows] == [base_us, base_us + 1_500_000]
    # epoch_s truncates (matches DuckDB date_diff('second') semantics)
    assert [r.s for r in rows] == [base_us // 10**6, base_us // 10**6 + 1]


def test_epoch_us_on_ltz_column(spark):
    df = spark.createDataFrame([(T0,)], "ts timestamp")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    got = df.select(epoch_us("ts").alias("us")).collect()[0].us
    assert got == int(
        T0.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6
    )


def test_epoch_us_ntz_independent_of_session_timezone(spark, ntz_parquet):
    """The external driver supplies a plain session (no pinned UTC);
    NTZ epochs must not shift with the session zone."""
    df = spark.read.parquet(ntz_parquet)
    base_us = int(T0.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6)
    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = df.select(epoch_us("ts").alias("us")).orderBy("us").collect()
        assert [r.us for r in got] == [base_us, base_us + 1_500_000]
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)


def test_epoch_diff_type_agnostic(spark, ntz_parquet):
    """Differences (the operators' actual use) agree across flavors."""
    ntz = spark.read.parquet(ntz_parquet)
    gap_ntz = (
        ntz.select(
            (epoch_us("ts") - F.lit(0)).alias("e")
        ).agg(F.max("e") - F.min("e")).collect()[0][0]
    )
    assert gap_ntz == 1_500_000
