"""End-to-end composed streaming pipeline: CDC orders -> rule
classification -> stateful alert throttle -> late-audit gate ->
transactional keyed upsert, as ONE Structured Streaming query.

The pieces each carry their own exactly-once/idempotence contract
(SURVEY.md §2.9; reference alert job
flink-jobs/flink_job_alert_detection_simple.py is the classify stage
only — everything after it is the operational hardening the reference
defers to Kafka/ops). This module proves the contracts COMPOSE:

- classify (`operators/alerts.py`) is stateless, trivially replayable;
- throttle (`throttle_stream.py`) keeps one scalar per key in the
  engine's state store — on a crash the state store rolls back to the
  last committed batch and recomputation is deterministic;
- the late-audit gate (`late_audit.py`) splits on its persisted
  watermark and quarantines late alerts instead of dropping them;
- the final table is a keyed `merge_into` upsert, which is idempotent
  under identical input — the gate invokes it through its `publish`
  hook BEFORE the applied-marker commit, so a crash anywhere replays
  the whole batch into the same end state.

At scale every stage is shuffle-bounded by its own keys: classify is
map-side; the throttle shuffles once on (user, type); the gate's split
is a map-side comparison against one broadcast scalar; the merge
rewrites only touched partitions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.operators.alerts import (
    classify_alerts,
    reference_order_rules,
)
from data_pipeline_mlops_spark.sources.merge import merge_into
from data_pipeline_mlops_spark.sources.txn import ManifestTable
from data_pipeline_mlops_spark.streaming.alert_stream import (
    ALERT_OUTPUT_COLS,
)
from data_pipeline_mlops_spark.streaming.late_audit import LateAuditGate
from data_pipeline_mlops_spark.streaming.throttle_stream import (
    throttle_alerts,
)


@dataclass
class ComposedAlertPipeline:
    """Handles for the running composition (query + its state tables)."""

    gate: LateAuditGate
    final: ManifestTable

    def start(
        self,
        orders: DataFrame,
        *,
        checkpoint_dir: str,
        cooldown_seconds: int = 1800,
        trigger_available_now: bool = True,
        idle_timeout_ms: int | None = None,
    ):
        """``idle_timeout_ms`` (wall-clock idle-key state eviction) must
        stay ``None`` for availableNow runs: a pending
        ProcessingTimeTimeout keeps the engine scheduling empty
        timeout-evaluation micro-batches after the source is drained,
        so ``awaitTermination`` never returns (the r8 'stall' — 71
        batches for 2 files, each re-running the full gate over a
        growing manifest). Continuous deployments pass a duration."""
        if trigger_available_now and idle_timeout_ms is not None:
            raise ValueError(
                "idle_timeout_ms requires a continuous trigger: with "
                "availableNow a pending processing-time timeout "
                "prevents the query from ever terminating"
            )
        throttled = composed_alert_stream(
            orders,
            cooldown_seconds=cooldown_seconds,
            idle_timeout_ms=idle_timeout_ms,
        )
        writer = throttled.writeStream.foreachBatch(self.gate).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def composed_alert_stream(
    orders: DataFrame,
    *,
    cooldown_seconds: int = 1800,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """classify -> throttle. ``orders`` carries the CDC order columns
    plus ``ev_us`` (event-time epoch microseconds — the Debezium
    envelope's source timestamp). String business keys are mapped to
    the throttle's int64 key space with xxhash64, the engine-wide
    shuffle-key idiom (int64 keys shuffle cheaper than strings and the
    mapping is deterministic, so the batch twin reproduces it).

    ``idle_timeout_ms=None`` (default) disables wall-clock state
    eviction so availableNow replays terminate; see
    :func:`data_pipeline_mlops_spark.streaming.throttle_stream.throttle_alerts`.
    """
    return throttle_alerts(
        _classified_keyed(orders),
        cooldown_seconds=cooldown_seconds,
        timeout_ms=idle_timeout_ms,
    )


def _classified_keyed(orders: DataFrame) -> DataFrame:
    alerts = classify_alerts(
        orders,
        reference_order_rules(),
        keep_cols=ALERT_OUTPUT_COLS + ["ev_us"],
    )
    return alerts.select(
        F.xxhash64("customer_id").alias("user_id"),
        F.col("alert_type").alias("event_type"),
        F.xxhash64("order_id").alias("event_id"),
        F.col("ev_us"),
    )


def build_composed_pipeline(
    base_dir: str, *, delay_us: int
) -> ComposedAlertPipeline:
    """Wire the gate and the final upsert table under ``base_dir``.

    The final table holds one row per fired alert key
    (user_id, event_type, event_id) — the merge makes redelivered
    batches converge to the same end state instead of double-paging.
    """
    final = ManifestTable(f"{base_dir}/final_alerts")

    def publish(on_time: DataFrame, batch_id: int) -> None:
        spark = on_time.sparkSession
        _ensure_final(spark, final)
        merge_into(
            spark,
            final,
            on_time.select(
                "user_id", "event_type", "event_id", "fired_at_us"
            ),
            on=["user_id", "event_type", "event_id"],
        )

    gate = LateAuditGate(
        f"{base_dir}/gate",
        ts_col="fired_at_us",
        delay_us=delay_us,
        ts_is_epoch_us=True,
        publish=publish,
    )
    return ComposedAlertPipeline(gate=gate, final=final)


def _ensure_final(spark: SparkSession, final: ManifestTable) -> None:
    if final.latest_version() is None:
        empty = spark.createDataFrame(
            [],
            "user_id long, event_type string, event_id long,"
            " fired_at_us long",
        )
        final.commit(empty, mode="replace_all")


def batch_twin_fired(
    orders: DataFrame, *, cooldown_seconds: int = 1800
) -> DataFrame:
    """The BATCH twin of classify->throttle: same rule set, same
    fired-anchored cooldown fold, run with applyInPandas over the
    complete history (no state store). Stream end state must satisfy
    final ∪ quarantined-late == batch_twin_fired (the gate never
    drops; it only routes)."""
    import pandas as pd

    keyed = _classified_keyed(orders)
    cooldown_us = cooldown_seconds * 1_000_000

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        last = None
        keep = []
        for _, row in pdf.sort_values(["ev_us", "event_id"]).iterrows():
            ev = int(row["ev_us"])
            if last is None or ev - last >= cooldown_us:
                keep.append(
                    (
                        int(row["user_id"]),
                        str(row["event_type"]),
                        int(row["event_id"]),
                        ev,
                    )
                )
                last = ev
        return pd.DataFrame(
            keep,
            columns=["user_id", "event_type", "event_id", "fired_at_us"],
        )

    return keyed.groupBy("user_id", "event_type").applyInPandas(
        fold,
        "user_id long, event_type string, event_id long, fired_at_us long",
    )
