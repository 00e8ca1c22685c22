"""Incremental count-min sketch maintenance: a persisted frequency
sketch updated one micro-batch at a time.

A live dashboard over a 100 TB event stream cannot recount exact
per-key frequencies every refresh; it maintains a SKETCH whose update
cost is per-batch and whose size is fixed. CMS is the right structure
because it merges by ADDITION (functions/sketch.py's merge-property
test): each batch contributes a delta sketch, and the current sketch
is the columnwise sum of all deltas — so persistence is an append-only
ManifestTable of delta rows and reads are one fixed-size aggregation.

Exactly-once under foreachBatch's at-least-once redelivery: CMS
addition is NOT idempotent (a replayed delta double-counts), so every
commit carries its micro-batch id and ``applied()`` consults the
table before updating — a redelivered batch becomes a no-op. Batch
ids in Structured Streaming are monotone and only the tail is ever
redelivered, so compaction (``maintain``) can fold all deltas into
one summary plus a WATERMARK row (max folded batch id): the applied
check is then `id <= watermark OR id in unfolded deltas`. Everything
lands in ONE table so each batch is a single atomic manifest commit —
no torn state between a counts table and an applied-log table.

Rows: (kind, batch_id, d, bucket, cnt) where kind is 'delta',
'summary', or 'watermark' (d = -1 sentinel on watermark rows).

Reference: the reference's Flink jobs recount dashboards from scratch
per refresh (flink-jobs/flink_job_alert_detection_simple.py writes
raw alerts; dashboard/app.py re-aggregates); this is the sketch-tier
equivalent that survives stream volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.functions import sketch
from data_pipeline_mlops_spark.sources.txn import ManifestTable

_SCHEMA = (
    "kind string, batch_id long, d int, bucket long, cnt long"
)


class CmsStore:
    """Persisted CMS over a key column; every mutation is one atomic
    manifest commit."""

    def __init__(self, root: str, *, depth: int = 4, width: int = 1024):
        self.table = ManifestTable(root)
        self.depth = depth
        self.width = width

    def _rows(self, spark: SparkSession) -> DataFrame | None:
        if self.table.latest_version() is None:
            return None
        return self.table.read(spark)

    def applied(self, spark: SparkSession, batch_id: int) -> bool:
        rows = self._rows(spark)
        if rows is None:
            return False
        hit = rows.where(
            (
                (F.col("kind") == "watermark")
                & (F.col("batch_id") >= batch_id)
            )
            | (
                (F.col("kind") == "delta")
                & (F.col("batch_id") == batch_id)
            )
        )
        return not hit.isEmpty()

    def update(
        self, batch_df: DataFrame, key_col: str, *, batch_id: int
    ) -> bool:
        """Add one batch's delta sketch; returns False (no-op) if this
        batch id was already applied (redelivery)."""
        spark = batch_df.sparkSession
        if self.applied(spark, batch_id):
            return False
        delta = sketch.cms_build(
            batch_df, key_col, depth=self.depth, width=self.width
        ).select(
            F.lit("delta").alias("kind"),
            F.lit(batch_id).cast("long").alias("batch_id"),
            "d",
            "bucket",
            "cnt",
        )
        self.table.commit(delta, mode="append")
        return True

    def read_sketch(self, spark: SparkSession) -> DataFrame:
        """The current sketch: (d, bucket, cnt) — sum of all deltas
        and summaries, at most depth*width rows."""
        rows = self._rows(spark)
        if rows is None:
            return spark.createDataFrame([], "d int, bucket long, cnt long")
        return (
            rows.where(F.col("kind") != "watermark")
            .groupBy("d", "bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )

    def estimate(self, keys: DataFrame, key_col: str) -> DataFrame:
        return sketch.cms_lookup(
            self.read_sketch(keys.sparkSession),
            keys,
            key_col,
            depth=self.depth,
            width=self.width,
        )

    def maintain(self, spark: SparkSession) -> None:
        """Fold all counted rows into one summary + a watermark row;
        one replace_all commit (readers on older snapshots are
        untouched; the applied() contract is preserved because folded
        batch ids sit under the new watermark)."""
        rows = self._rows(spark)
        if rows is None:
            return
        summary = (
            rows.where(F.col("kind") != "watermark")
            .groupBy("d", "bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .select(
                F.lit("summary").alias("kind"),
                F.lit(-1).cast("long").alias("batch_id"),
                "d",
                "bucket",
                "cnt",
            )
        )
        watermark = rows.agg(
            F.max("batch_id").cast("long").alias("batch_id")
        ).select(
            F.lit("watermark").alias("kind"),
            "batch_id",
            F.lit(-1).cast("int").alias("d"),
            F.lit(-1).cast("long").alias("bucket"),
            F.lit(0).cast("long").alias("cnt"),
        )
        self.table.commit(
            summary.unionByName(watermark), mode="replace_all"
        )


def cms_foreach_batch(
    *,
    root: str,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    maintain_every: int = 32,
):
    """foreachBatch adapter: `stream.writeStream.foreachBatch(this)`.
    Every ``maintain_every`` applied batches the store self-compacts
    (0 disables)."""
    store = CmsStore(root, depth=depth, width=width)

    def body(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if store.update(batch_df, key_col, batch_id=batch_id):
            if (
                maintain_every
                and batch_id > 0
                and batch_id % maintain_every == 0
            ):
                store.maintain(batch_df.sparkSession)

    return body
