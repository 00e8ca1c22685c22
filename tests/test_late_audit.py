"""LateAuditGate: watermark-late rows are quarantined with recorded
lateness, never dropped; the frontier advances from on-time rows only;
redeliveries replay idempotently."""

from __future__ import annotations

from datetime import datetime

from data_pipeline_mlops_spark.streaming.late_audit import LateAuditGate


def _batch(spark, rows):
    return spark.createDataFrame(rows, "event_id long, ts timestamp_ntz")


def _ts(s):
    return datetime.fromisoformat(s)


def test_late_rows_quarantined_not_dropped(spark, tmp_path):
    gate = LateAuditGate(
        str(tmp_path / "g"), ts_col="ts", delay_us=60_000_000  # 60 s
    )
    # batch 0: events up to 10:10 -> watermark = 10:09
    gate(
        _batch(spark, [
            (1, _ts("2026-01-01T10:00:00")),
            (2, _ts("2026-01-01T10:10:00")),
        ]),
        0,
    )
    # batch 1: one on-time row, one 9-minutes-late row
    gate(
        _batch(spark, [
            (3, _ts("2026-01-01T10:11:00")),
            (4, _ts("2026-01-01T10:00:00")),   # < 10:09 frontier
        ]),
        1,
    )
    on_time = {r.event_id for r in gate.on_time.read(spark).collect()}
    late = {
        r.event_id: r.lateness_us
        for r in gate.late.read(spark).collect()
    }
    assert on_time == {1, 2, 3}
    assert set(late) == {4}
    assert late[4] == 9 * 60 * 1_000_000  # 10:09 - 10:00


def test_late_rows_do_not_advance_watermark(spark, tmp_path):
    gate = LateAuditGate(
        str(tmp_path / "g2"), ts_col="ts", delay_us=60_000_000
    )
    gate(_batch(spark, [(1, _ts("2026-01-01T10:10:00"))]), 0)
    w0 = gate.current_watermark_us(spark)
    # a purely-late batch must leave the frontier unchanged
    gate(_batch(spark, [(2, _ts("2026-01-01T09:00:00"))]), 1)
    assert gate.current_watermark_us(spark) == w0
    assert {r.event_id for r in gate.late.read(spark).collect()} == {2}


def test_redelivery_is_noop(spark, tmp_path):
    gate = LateAuditGate(
        str(tmp_path / "g3"), ts_col="ts", delay_us=60_000_000
    )
    gate(_batch(spark, [(1, _ts("2026-01-01T10:10:00"))]), 0)
    v_on = gate.on_time.latest_version()
    v_wm = gate.wm.latest_version()
    gate(_batch(spark, [(1, _ts("2026-01-01T10:10:00"))]), 0)  # redelivered
    assert gate.on_time.latest_version() == v_on
    assert gate.wm.latest_version() == v_wm


def test_first_batch_has_no_frontier(spark, tmp_path):
    gate = LateAuditGate(
        str(tmp_path / "g4"), ts_col="ts", delay_us=60_000_000
    )
    gate(_batch(spark, [(1, _ts("2020-01-01T00:00:00"))]), 0)
    assert gate.late.read(spark).count() == 0
    assert {r.event_id for r in gate.on_time.read(spark).collect()} == {1}


def test_wm_table_compacts_bounded(spark, tmp_path):
    """Long-running stream: the watermark table must stay bounded —
    markers fold to the newest retain_batches rows, old manifest
    versions vacuum away, and the frontier + replay guard survive."""
    from datetime import datetime, timezone

    from data_pipeline_mlops_spark.streaming.late_audit import (
        LateAuditGate,
    )

    gate = LateAuditGate(
        str(tmp_path / "g"), ts_col="ts", delay_us=1_000_000,
        retain_batches=5, compact_every=4,
    )

    def batch(i):
        ts = datetime.fromtimestamp(1_700_000_000 + i * 10, tz=timezone.utc)
        return spark.createDataFrame([(i, ts)], "id long, ts timestamp")

    for i in range(12):
        gate(batch(i), i)

    wm_rows = gate.wm.read(spark).collect()
    assert len(wm_rows) <= 5 + 3  # retained fold + at most a few post-compact appends
    assert len(gate.wm.versions()) < 12  # old versions vacuumed
    # frontier survived compaction: max event time seen - delay
    assert gate.current_watermark_us(spark) == (
        (1_700_000_000 + 11 * 10) * 1_000_000 - 1_000_000
    )
    # replay guard: recent batch redelivery is still a no-op
    before = gate.on_time.read(spark).count()
    gate(batch(11), 11)
    assert gate.on_time.read(spark).count() == before


def test_output_table_manifests_bounded(spark, tmp_path):
    """Round 9: the on_time/late OUTPUT tables get retention
    maintenance on the compaction cadence too — superseded manifest
    versions must not accumulate with stream lifetime. (Retention
    horizon only reclaims dirs older than an hour, so here only the
    manifest version count shrinks — exactly the driver-side growth
    term.)"""
    from datetime import datetime, timezone

    from data_pipeline_mlops_spark.streaming.late_audit import (
        LateAuditGate,
    )

    gate = LateAuditGate(
        str(tmp_path / "g"), ts_col="ts", delay_us=1_000_000,
        retain_batches=3, compact_every=4,
    )

    def batch(i):
        ts = datetime.fromtimestamp(1_700_000_000 + i * 10, tz=timezone.utc)
        return spark.createDataFrame([(i, ts)], "id long, ts timestamp")

    for i in range(12):
        gate(batch(i), i)

    # 12 commits happened, but old manifests vacuum behind the fold
    assert len(gate.on_time.versions()) <= 3 + 4
    assert len(gate.late.versions()) <= 3 + 4
    # every batch's rows remain readable from the latest snapshot
    assert gate.on_time.read(spark).count() == 12
