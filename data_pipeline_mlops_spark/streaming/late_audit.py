"""Late-data audit gate: never let the watermark drop rows silently.

Structured Streaming's watermark DISCARDS rows older than
(max event time seen - delay) once they reach a stateful operator —
correct for state bounds, but invisible: the rows simply vanish from
the aggregates. For a pipeline that feeds training data or billing,
silent loss is the failure mode; the fix is the same never-drop split
the DQ gate uses, applied to LATENESS:

- a persisted high-watermark table carries max(event_time) - delay
  across batches (streaming state the operator owns, same
  ManifestTable idiom as the dedup index / CMS store);
- each micro-batch splits into (on_time, late) against the watermark
  AS OF THE PREVIOUS BATCH — the same frontier the engine's stateful
  operators would apply — and the late rows land in a quarantine
  table with their lateness recorded, instead of vanishing;
- commits follow the DqGate crash-contract: quarantine and output are
  partition-replaced by batch_id, the watermark commit is LAST and is
  the applied-marker, so redelivered batches replay idempotently.

At 100 TB the frontier is ONE row of state; the split is a map-side
comparison against a broadcast scalar. Downstream can reconcile
quarantined late rows on whatever cadence the business needs —
which is exactly what the silent drop forecloses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.sources.txn import ManifestTable
from data_pipeline_mlops_spark.timeutil import epoch_us


class LateAuditGate:
    """foreachBatch body: split on the persisted watermark, quarantine
    late rows, advance the watermark transactionally."""

    def __init__(
        self,
        base_dir: str,
        *,
        ts_col: str,
        delay_us: int,
        retain_batches: int = 100,
        compact_every: int = 8,
        ts_is_epoch_us: bool = False,
        publish=None,
    ) -> None:
        self.ts_col = ts_col
        self.delay_us = int(delay_us)
        # ts_col may already BE epoch microseconds (e.g. the throttle
        # operator's fired_at_us) — skip the timestamp conversion then.
        self.ts_is_epoch_us = bool(ts_is_epoch_us)
        # Optional downstream publish step, called with
        # (on_time_df, batch_id) AFTER the quarantine commits and
        # BEFORE the watermark/applied-marker commit. Because the
        # marker lands last, a crash inside publish replays the whole
        # batch — so publish MUST be idempotent under identical input
        # (a keyed merge/upsert is; a blind append is not). This is
        # how a transactional sink composes with the gate without a
        # second marker table.
        self.publish = publish
        # Bounded marker horizon, like Spark's own commit-log retention
        # (minBatchesToRetain): the engine only ever redelivers the
        # LAST uncommitted batch, so retaining the newest N markers
        # keeps the replay guard while letting compaction bound the
        # wm table — without it, per-batch driver work and manifest
        # count grew with STREAM LIFETIME, not state size.
        # compact_every bounds the wm table's FRAGMENT count: the gate
        # reads wm once per batch, and each append adds a staged dir,
        # so the read unions up to compact_every scans before the fold
        # resets it to one (measured: tail/head per-batch cost 2.3x
        # over 24 batches at the old cadence of 32 — the fold is what
        # keeps per-batch cost flat over stream lifetime).
        self.retain_batches = int(retain_batches)
        self.compact_every = int(compact_every)
        self.on_time = ManifestTable(f"{base_dir}/on_time")
        self.late = ManifestTable(f"{base_dir}/late")
        self.wm = ManifestTable(f"{base_dir}/watermark")

    # -- state -------------------------------------------------------------

    def current_watermark_us(self, spark: SparkSession) -> int | None:
        return self._wm_state(spark)[0]

    def applied_batches(self, spark: SparkSession) -> set[int]:
        return self._wm_state(spark)[1]

    def _wm_state(self, spark: SparkSession) -> tuple[int | None, set[int]]:
        """ONE scan of the wm table returning (frontier, applied batch
        ids) — the gate needs both every micro-batch, and the table's
        fragment count (bounded by compact_every) prices each read."""
        if self.wm.latest_version() is None:
            return None, set()
        rows = self.wm.read(spark).collect()
        applied = {int(r.batch_id) for r in rows}
        wms = [int(r.watermark_us) for r in rows if r.watermark_us is not None]
        return (max(wms) if wms else None), applied

    # -- the gate ----------------------------------------------------------

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # The batch is consumed by up to five actions (validation
        # traversal, two table commits, publish, frontier agg): persist
        # so the upstream plan — possibly a stateful operator with
        # per-execution state-store loads — runs ONCE and the rest read
        # the cached micro-batch (the pattern Spark's foreachBatch
        # docs recommend for multi-action batches).
        batch_df.persist()
        try:
            self._apply(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    def _apply(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # One full traversal FIRST, unconditionally: the engine
        # validates that foreachBatch consumed every partition (state-
        # store commit check, STATE_STORE_COMMIT_VALIDATION_FAILED
        # otherwise), so the early-out paths below must still have
        # walked the batch — a bare return after a metadata probe
        # fails the query on redelivery. This is also what fills the
        # persist() cache.
        n_rows = batch_df.count()
        wm_us, applied = self._wm_state(spark)
        if int(batch_id) in applied:
            return  # redelivery: already fully committed
        if n_rows == 0:
            # Empty micro-batch (idle continuous trigger, or a
            # stateful operator's timeout-evaluation batch): commit
            # NOTHING — no output partitions, no marker, no watermark
            # row. Without this, every idle trigger appended a
            # manifest version to three tables and per-batch gate cost
            # grew with stream LIFETIME (the r8 composed-pipeline
            # stall's cost amplifier). Replay safety is unaffected: a
            # redelivered empty batch is empty again and skips again.
            return
        ev_expr = (
            F.col(self.ts_col).cast("long")
            if self.ts_is_epoch_us
            else epoch_us(self.ts_col)
        )
        ev = batch_df.withColumn("__ev_us", ev_expr)

        if wm_us is None:
            on_time = ev
            late = ev.limit(0)
        else:
            on_time = ev.where(F.col("__ev_us") >= F.lit(wm_us))
            late = ev.where(F.col("__ev_us") < F.lit(wm_us))
        late = late.withColumn(
            "lateness_us",
            F.lit(wm_us if wm_us is not None else 0) - F.col("__ev_us"),
        )

        bid = F.lit(int(batch_id)).cast("long")
        self.on_time.commit(
            on_time.drop("__ev_us").withColumn("batch_id", bid),
            partition_col="batch_id",
            mode="replace_partitions",
        )
        self.late.commit(
            late.drop("__ev_us").withColumn("batch_id", bid),
            partition_col="batch_id",
            mode="replace_partitions",
        )
        if self.publish is not None:
            self.publish(on_time.drop("__ev_us"), int(batch_id))
        # frontier advance: new watermark = max(old, max(ev) - delay).
        # Computed from ON-TIME rows only (late rows must not move the
        # frontier). One scalar row per batch; committed LAST as the
        # applied marker.
        stats = on_time.agg(F.max("__ev_us").alias("mx")).collect()[0]
        new_wm = wm_us
        if stats.mx is not None:
            cand = int(stats.mx) - self.delay_us
            new_wm = cand if new_wm is None else max(new_wm, cand)
        # JVM-only one-row plan (spark.range + lit), not
        # createDataFrame: a parallelized Python list spins up python
        # workers for a single scalar write inside every micro-batch
        wm_row = spark.range(1).select(
            F.lit(int(batch_id)).alias("batch_id"),
            F.lit(new_wm).cast("long").alias("watermark_us"),
        )
        self.wm.commit(wm_row, mode="append")
        if len(self.wm.versions()) >= self.compact_every:
            self._compact(spark)

    def _compact(self, spark: SparkSession) -> None:
        """Fold the wm table to its newest ``retain_batches`` markers
        and drop old manifest versions. The per-batch watermark is
        monotone (each commit takes max(old, new)), so the newest
        marker carries the global frontier — nothing is lost by
        truncating history. Safe to vacuum with zero retention here:
        the gate is foreachBatch-serialized, the table's only writer.

        The on_time/late OUTPUT tables get retention maintenance on
        the same cadence: every batch appends one manifest version,
        and without vacuum the version listing (read per commit) grew
        with stream LIFETIME. Superseded manifests and orphaned
        re-delivery dirs are reclaimed behind a one-hour retention
        horizon so concurrent snapshot READERS of these product tables
        are never pulled off their resolved files (the wm table has no
        external readers, hence its zero horizon)."""
        kept = (
            self.wm.read(spark)
            .orderBy(F.col("batch_id").desc())
            .limit(self.retain_batches)
        )
        self.wm.commit(kept, mode="replace_all")
        self.wm.vacuum(keep_versions=1, retention_seconds=0.0)
        for table in (self.on_time, self.late):
            table.vacuum(
                keep_versions=self.retain_batches,
                retention_seconds=3600.0,
            )
