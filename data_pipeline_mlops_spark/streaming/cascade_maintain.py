"""Incremental maintenance of the cascade rollup from a stream.

Continuous-aggregate pattern for `operators/aggregate.cascade_rollup`:
each micro-batch writes its MINUTELY partial aggregate as a delta
partition keyed by batch_id; coarser resolutions are derived at read
time by merging deltas (decomposable COUNT + DECIMAL SUM, the same
identity the batch cascade oracles). Two properties carry the design:

- **Idempotent replays.** A replayed batch OVERWRITES its own
  `__batch=` partition (dynamic partition overwrite) instead of
  double-adding — the delta-log trick that makes additive aggregation
  safe under at-least-once foreachBatch, where a MERGE-ADD sink would
  not be.
- **O(batch) write cost.** A batch writes only its own minutely
  partial (tiny — bounded by distinct (minute, key) pairs in the
  batch), never touches history. Delta partitions accrete; fold old
  ones into a base with `sources/layout.compact_partition` on a
  schedule, exactly like any log-structured store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def minutely_delta_writer(
    *, path: str, keys: list[str], ts_col: str, value_col: str
):
    """foreachBatch body: aggregate the batch to minutely partials and
    overwrite this batch's delta partition."""

    def body(batch_df: DataFrame, batch_id: int) -> None:
        dec = F.col(value_col).cast("decimal(38,6)")
        partial = batch_df.groupBy(
            F.date_trunc("minute", ts_col).alias("bucket"), *keys
        ).agg(F.count(F.lit(1)).alias("n_events"), F.sum(dec).alias("sv"))
        (
            partial.withColumn("__batch", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch")
            .parquet(path)
        )

    return body


def read_rollup(
    spark: SparkSession,
    *,
    path: str,
    keys: list[str],
    level: str = "day",
) -> DataFrame:
    """Merge all delta partitions and roll up to `level`. Returns
    (bucket, *keys, n_events, total_value) with the value rounded at
    this final edge only — identical to running cascade_rollup over
    the full raw history (the invariant the test pins)."""
    deltas = spark.read.parquet(path)
    merged = deltas.groupBy(
        F.date_trunc(level, "bucket").alias("bucket"), *keys
    ).agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("sv").alias("__sv"),
    )
    return merged.select(
        "bucket",
        *keys,
        "n_events",
        F.round("__sv", 2).cast("double").alias("total_value"),
    )
