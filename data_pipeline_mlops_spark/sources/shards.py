"""Training-shard export: deterministic global shuffle + fixed shard
assignment for a finished corpus.

The last-mile operator of a training-data pipeline: once documents are
cleaned/deduped/packed, the trainer wants the corpus (a) shuffled
globally so each shard is an unbiased sample (no source/time locality
— consecutive docs from one crawl segment poison SGD batches), (b)
split into a fixed number of shards with a deterministic, reproducible
membership and order, so a resumed/restarted training run reads the
exact same byte stream.

Both properties come from one hash: ``shard = h(id) % n_shards``,
``order within shard = (h(id), id)``. No RNG, no driver state — the
assignment is a pure column expression, so it is identical at 32
threads or 4000 cores and across reruns.

Scale shape: assignment is map-side; the only wide operation is the
write-side ``repartition(n_shards, shard)`` (one shuffle of the final
corpus — unavoidable for a global shuffle, and exactly one). Sort
within partitions keeps Spark's external sorter per-shard (no global
sort barrier). The reference has no shard-export stage (its corpus
fits in pandas); this extends the training-data surface per the
LLM-pipeline brief.

Two hash tiers, same discipline as the dedup family:
- ``hash_method="xxhash64"`` — production (one streaming hash pass);
- ``hash_method="md5"`` — the engine-portable twin the registry
  oracle replays bit-for-bit (dedup_text._md5_60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.functions.dedup_text import _md5_60


def _shard_hash(col: F.Column, hash_method: str) -> F.Column:
    if hash_method == "md5":
        return _md5_60(col.cast("string"))
    if hash_method == "xxhash64":
        return F.xxhash64(col)
    raise ValueError(f"unknown hash_method: {hash_method}")


def assign_shards(
    df: DataFrame,
    *,
    id_col: str,
    n_shards: int,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Add (shard, pos): deterministic shard membership and 0-based
    position within the shard's global read order."""
    h = _shard_hash(F.col(id_col), hash_method)
    with_shard = df.withColumn("__h", h).withColumn(
        "shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("__h").asc(), F.col(id_col).asc()
    )
    return with_shard.withColumn(
        "pos", (F.row_number().over(w) - 1).cast("long")
    ).drop("__h")


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str,
    n_shards: int,
    hash_method: str = "xxhash64",
) -> None:
    """Write the corpus as ``path/shard=K/`` parquet, rows of each
    shard stored in their deterministic read order. One shuffle
    (repartition on shard), per-shard external sort, no global
    barrier."""
    out = assign_shards(
        df, id_col=id_col, n_shards=n_shards, hash_method=hash_method
    )
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
