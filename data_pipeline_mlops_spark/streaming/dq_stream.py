"""Streaming data-quality gate: expectation-suite enforcement inside
a foreachBatch sink, with quarantine.

The batch DQ suite (operators/expectations.py) generalizes the
reference's quality gate (dags/daily_pipeline.py); real pipelines also
need it ON THE STREAM — every micro-batch is split into clean rows
(delivered to the target table) and violating rows (delivered to a
quarantine table, tagged with which constraints failed), plus one
report row per constraint per batch appended to an audit table. Bad
rows are never dropped silently and never block the stream — the
at-least-once contract the reference's alert webhook uses (SURVEY.md
§2.9 T6), applied to DQ.

Scale shape:
- the row-level split is ONE pass over the micro-batch: each
  predicate becomes a boolean column, the violation tag is an
  array-filter over those booleans — no second scan, no shuffle;
- the per-batch report reuses run_expectations (shared single
  aggregation for all row checks);
- sinks are ManifestTable transactional appends (sources/txn.py), so
  a crashed batch re-runs idempotently: the quarantine/target commits
  carry the batch id, and replayed batch ids are skipped — the same
  exactly-once-via-manifest pattern as streaming/sketch_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.operators.expectations import (
    RowCheck,
    run_expectations,
)
from data_pipeline_mlops_spark.sources.txn import ManifestTable


def split_by_expectations(
    df: DataFrame, checks: list[RowCheck]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): rows failing ANY predicate land in
    quarantine with a `violated` array naming the failed constraints.
    One projection; predicate NULL counts as a violation (IS NOT TRUE
    semantics, matching run_expectations)."""
    flags = df.select(
        "*",
        F.array(
            *[
                F.when(c.predicate, F.lit(None)).otherwise(F.lit(c.name))
                for c in checks
            ]
        ).alias("__flags"),
    ).withColumn(
        "violated", F.filter("__flags", lambda x: x.isNotNull())
    ).drop("__flags")
    clean = flags.where(F.size("violated") == 0).drop("violated")
    quarantine = flags.where(F.size("violated") > 0)
    return clean, quarantine


class DqGate:
    """foreachBatch body enforcing a row-check suite with transactional
    target/quarantine/report tables."""

    def __init__(
        self,
        base_dir: str,
        checks: list[RowCheck],
        *,
        compact_every: int = 32,
    ) -> None:
        self.checks = checks
        self.compact_every = int(compact_every)
        self.target = ManifestTable(f"{base_dir}/target")
        self.quarantine = ManifestTable(f"{base_dir}/quarantine")
        self.report = ManifestTable(f"{base_dir}/report")

    def applied_batches(self, spark) -> set[int]:
        if self.report.latest_version() is None:
            return set()
        return {
            r.batch_id
            for r in self.report.read(spark)
            .select("batch_id")
            .distinct()
            .collect()
        }

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if int(batch_id) in self.applied_batches(spark):
            return  # redelivered micro-batch: already committed
        clean, quarantine = split_by_expectations(batch_df, self.checks)
        rep = run_expectations(batch_df, row_checks=self.checks).select(
            F.lit(int(batch_id)).cast("long").alias("batch_id"),
            "constraint_name",
            "total",
            "violations",
            "passed",
        )
        # order matters for crash recovery: the report commit is LAST
        # and is the applied() marker — a crash before it replays the
        # whole batch; target/quarantine re-commits replace their
        # batch_id partition, so the replay is idempotent.
        self.target.commit(
            clean.withColumn("batch_id", F.lit(int(batch_id))),
            partition_col="batch_id",
            mode="replace_partitions",
        )
        self.quarantine.commit(
            quarantine.withColumn(
                "violated", F.array_join("violated", ",")
            ).withColumn("batch_id", F.lit(int(batch_id))),
            partition_col="batch_id",
            mode="replace_partitions",
        )
        self.report.commit(rep, mode="append")
        # Lifetime-bounded maintenance (same cadence idea as the
        # late-audit gate, round 9): the report is read EVERY batch by
        # applied_batches and appends one staged dir per batch, so
        # without a fold its scan cost grew with stream lifetime.
        # Report rows are tiny (n_checks x n_batches) — the fold
        # rewrites them into one dir; superseded manifests/dirs of all
        # three tables reclaim behind a one-hour horizon (product
        # tables may have snapshot readers).
        if len(self.report.versions()) >= self.compact_every:
            self.report.commit(
                self.report.read(spark), mode="replace_all"
            )
            self.report.vacuum(
                keep_versions=1, retention_seconds=3600.0
            )
            for t in (self.target, self.quarantine):
                t.vacuum(keep_versions=64, retention_seconds=3600.0)
