"""SQL-surface registration: the engine's core idioms as Spark SQL
functions, so an ad-hoc ``spark.sql`` user gets the same NTZ-safe,
engine-portable semantics the DataFrame operators enforce — without
Python in the loop (every function below is a SQL *expression*
function compiled by Catalyst, not a UDF).

Uses Spark's SQL scalar functions (``CREATE OR REPLACE TEMPORARY
FUNCTION ... RETURNS ... RETURN <expr>``, the SQL-UDF surface added
publicly in Spark 3.5): zero serialization boundary, full codegen,
and visible in EXPLAIN as inlined expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_mlops_spark.sources.txn import ManifestTable

_FUNCS = {
    # NTZ-safe epoch micros (timeutil.epoch_us's SQL twin)
    "engine_epoch_us": (
        "(t TIMESTAMP_NTZ) RETURNS BIGINT RETURN "
        "timestampdiff(MICROSECOND, "
        "TIMESTAMP_NTZ '1970-01-01 00:00:00', t)"
    ),
    # portable 60-bit hash (the md5-60 idiom every sampler/sketch uses)
    "engine_hash60": (
        "(s STRING) RETURNS BIGINT RETURN "
        "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)"
    ),
    # whitespace token count (text.token_count)
    "engine_token_count": (
        "(s STRING) RETURNS BIGINT RETURN "
        "CAST(size(split(trim(s), '\\\\s+')) AS BIGINT)"
    ),
    # confusable-skeleton dedup key (text.skeleton_key)
    "engine_skeleton": (
        "(s STRING) RETURNS STRING RETURN "
        "trim(regexp_replace(translate(translate(lower(s), "
        "'​‌‍﻿', ''), "
        "'аеорсхіѕук',"
        " 'aeopcxisyk'), '\\\\s+', ' '))"
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the engine SQL functions; returns the names."""
    for name, body in _FUNCS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    return sorted(_FUNCS)


def register_manifest_view(
    spark: SparkSession,
    table: ManifestTable,
    name: str,
    *,
    version: int | None = None,
) -> DataFrame:
    """Expose a ManifestTable snapshot to ``spark.sql`` as a temp view
    (pin ``version`` for AS-OF queries — the view stays on that
    snapshot's files regardless of later commits)."""
    df = table.read(spark, version=version)
    df.createOrReplaceTempView(name)
    return df
