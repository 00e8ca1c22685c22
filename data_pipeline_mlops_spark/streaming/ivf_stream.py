"""Streaming ANN-index maintenance: append embedding micro-batches to
the persisted IVF index (ml/ivf.py::IvfIndex) with exactly-once
semantics under redelivery — the vector-side sibling of the streaming
dedup index and the CMS store.

Contract per micro-batch:
- redelivered batch ids are no-ops (the applied-marker table is
  checked first);
- new vectors are assigned to EXISTING centroids (one broadcast pass)
  and appended cell-partitioned — only touched cells' partitions get
  new staged dirs;
- the marker commit happens LAST: a crash between the codes append
  and the marker replays the batch, and the replayed codes append is
  partition-REPLACED per batch id... codes appends are `append`-mode,
  so replay idempotence instead comes from tagging rows with the
  batch id and compacting duplicates away: `maintain()` keeps the
  first occurrence per (vec id) — the same self-healing compaction
  contract DedupIndex.maintain uses.

At 100 TB: per-batch cost is O(batch x centroids) for assignment plus
one commit; searches are unaffected mid-append (snapshot isolation);
`maintain()` bounds fragmentation and removes crash-replay dupes in
one job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.ml.ivf import IvfIndex, assign_to_centroids
from data_pipeline_mlops_spark.sources.txn import ManifestTable


class IvfStream:
    def __init__(
        self, base_dir: str, *, id_col: str, vec_col: str
    ) -> None:
        self.index = IvfIndex(base_dir)
        self.marker = ManifestTable(f"{base_dir}/applied")
        self.id_col = id_col
        self.vec_col = vec_col

    def bootstrap(
        self,
        corpus: DataFrame,
        *,
        n_clusters: int = 16,
        seed: int = 42,
    ) -> None:
        """Fit centroids and load the historical corpus (batch_id -1,
        so streamed batches' schema matches from the start)."""
        from data_pipeline_mlops_spark.ml.ivf import build_ivf_index

        centroids, assigned = build_ivf_index(
            corpus,
            id_col=self.id_col,
            vec_col=self.vec_col,
            n_clusters=n_clusters,
            seed=seed,
        )
        self.index.centroids_t.commit(centroids, mode="replace_all")
        self.index.codes_t.commit(
            assigned.withColumn("batch_id", F.lit(-1).cast("long")),
            partition_col="cluster",
            mode="replace_all",
        )

    def applied_batches(self, spark: SparkSession) -> set[int]:
        if self.marker.latest_version() is None:
            return set()
        return {
            r.batch_id
            for r in self.marker.read(spark).select("batch_id").collect()
        }

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if int(batch_id) in self.applied_batches(spark):
            return
        assigned = assign_to_centroids(
            batch_df,
            self.index.centroids_t.read(spark),
            id_col=self.id_col,
            vec_col=self.vec_col,
        ).withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        self.index.codes_t.commit(
            assigned, partition_col="cluster", mode="append"
        )
        self.marker.commit(
            spark.createDataFrame([(int(batch_id),)], "batch_id long"),
            mode="append",
        )

    def maintain(self) -> int:
        """Compact the codes table and drop crash-replay duplicates:
        one row per vec id survives (lowest batch id wins). Rewrites
        each cell partition once; readers keep their snapshots."""
        from pyspark.sql import Window

        spark = SparkSession.getActiveSession()
        codes = self.index.codes_t.read(spark)
        w = Window.partitionBy(self.id_col).orderBy(
            F.col("batch_id").asc_nulls_last()
        )
        deduped = (
            codes.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        return self.index.codes_t.commit(
            deduped, partition_col="cluster", mode="replace_all"
        )
