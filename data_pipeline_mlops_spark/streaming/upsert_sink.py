"""Incremental keyed upsert sink: MERGE INTO for plain parquet.

Each micro-batch merges into a partitioned parquet table by key:
existing rows for the batch's keys are replaced, other rows survive,
new keys append. Without a table format with row-level merge (Delta/
Iceberg), the honest unit of rewrite is the PARTITION: the sink reads
ONLY the partitions the batch touches, unions the batch in, keeps the
winning row per key, and rewrites just those partitions (dynamic
partition overwrite). Untouched partitions are never read or written —
at 100 TB the cost per batch is O(touched partitions), not O(table).

Winner per key = highest (order_col, batch precedence): a batch row
beats an equal-order existing row, so replays converge (idempotent —
required for at-least-once foreachBatch delivery).

Constraint: ``partition_col`` must be a pure function of the key
(e.g. a hash bucket or an immutable attribute). If a key could move
between partitions, its old row would survive in a partition the
batch doesn't touch — the standard contract for partition-scoped
MERGE without a table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_batch(
    batch_df: DataFrame,
    *,
    path: str,
    key_cols: list[str],
    order_col: str,
    partition_col: str,
) -> None:
    spark = batch_df.sparkSession
    batch = batch_df.withColumn("__src", F.lit(1))
    touched = [
        r[0] for r in batch.select(partition_col).distinct().collect()
    ]
    if not touched:
        return
    from pyspark.errors import AnalysisException

    try:
        existing = (
            spark.read.parquet(path)
            .where(F.col(partition_col).isin(touched))
            .withColumn("__src", F.lit(0))
        )
        merged = existing.unionByName(batch)
    except AnalysisException as ex:
        # ONLY the first-batch case (table not created yet) may fall
        # through to a plain write; any other analysis error (schema
        # drift, corrupt footer) must fail the batch — swallowing it
        # would silently drop the table's history from the merge.
        if "PATH_NOT_FOUND" not in str(ex) and "Path does not exist" not in str(ex):
            raise
        merged = batch
    # Final tiebreak: two rows with the same key AND equal (order_col,
    # __src) — e.g. duplicate keys within one batch — would otherwise
    # tie completely and row_number would pick a nondeterministic
    # winner, so replaying the same batch need not converge. A stable
    # hash of the full payload makes the choice a pure function of row
    # content (bit-identical duplicate rows still tie, but then every
    # candidate winner IS the same row).
    # Hash via to_json(struct(...)): xxhash64 directly on columns is
    # prohibited for MapType (DATATYPE_MISMATCH.HASH_MAP_TYPE), and a
    # map-typed payload column is a perfectly normal upsert table.
    # JSON serialization is deterministic for a replayed batch (the
    # same computation rebuilds the same map entry order).
    payload_cols = [c for c in merged.columns if c != "__src"]
    merged = merged.withColumn(
        "__tb", F.xxhash64(F.to_json(F.struct(*payload_cols)))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(), F.col("__src").desc(), F.col("__tb").desc()
    )
    winners = (
        merged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__src", "__tb")
        # the window repartitions by key; localCheckpoint materializes
        # the winners BEFORE the overwrite starts deleting the very
        # partitions the plan still needs to read
        .localCheckpoint()
    )
    (
        winners.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def upsert_foreach_batch(
    *, path: str, key_cols: list[str], order_col: str, partition_col: str
):
    """foreachBatch adapter: `stream.writeStream.foreachBatch(this)`."""

    def body(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch(
            batch_df,
            path=path,
            key_cols=key_cols,
            order_col=order_col,
            partition_col=partition_col,
        )

    return body
