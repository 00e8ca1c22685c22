"""Driver contract for the spark-graft builder (PySpark target).

`queries()` / `oracle_sql()` are backed by
data_pipeline_mlops_spark.registry — one entry per implemented operator
from SURVEY.md §2 plus the training-data-pipeline extensions. The only
entries without an oracle are the Spark ML model tiers
(recommendations_als, similar_items_als, ann_pca_topk): ALS/eigensolves
are not bit-stable across partitionings, so they are recorded as
rows-only checks here and value-gated by the eval-harness tests in
tests/test_ml.py instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: regional revenue with
    per-region top customers — exercises the star join (broadcast dims),
    exact decimal aggregation, and the O4 rank window."""
    from data_pipeline_mlops_spark.registry import q_top_customers_per_region

    return q_top_customers_per_region(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from data_pipeline_mlops_spark.registry import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    from data_pipeline_mlops_spark.registry import oracle_queries

    return oracle_queries()
