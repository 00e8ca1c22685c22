"""Parquet table sources over the driver testdata layout.

Mirrors the reference's medallion parquet reads (S3/K1 in SURVEY.md §2.1,
reference dags/daily_pipeline.py:102-103) but via Spark's vectorized
parquet reader, so partition pruning / predicate pushdown / column
pruning come from Catalyst instead of boto3 point-reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    reader rejects; read nanos as long (legacy conf) and convert to a
    microsecond TimestampType with exact integer division (ns since
    epoch exceed 2^53, so float division would corrupt them)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` works ad hoc
    (the role Trino plays for the reference lake)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
