"""SparkSession factory.

The reference wires Airflow + pandas + Flink + Trino into one stack
(reference docker-compose.yml); here a single Spark runtime plays every
role. Local-mode defaults are tuned for the driver's test harness
(local[32], small data) while staying valid on a real cluster: AQE on,
dynamic partition overwrite (reference overwrites one date= partition
per run, dags/daily_pipeline.py:80-90), UTC session time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data-pipeline-mlops-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Shuffle partitions default to the core count: on tiny local data the
    classic 200 default just adds task-scheduling overhead, and AQE
    coalescing handles the rest. On a real cluster callers pass an
    explicit value sized to the data (or rely on AQE).
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = str(
        shuffle_partitions
        or os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
