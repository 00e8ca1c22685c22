"""Streaming DQ gate: clean/quarantine split, transactional commits,
redelivery idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_mlops_spark.operators.expectations import RowCheck
from data_pipeline_mlops_spark.streaming.dq_stream import (
    DqGate,
    split_by_expectations,
)

def _checks():
    return [
        RowCheck("pos:amount", F.col("amount") > 0),
        RowCheck("nn:user", F.col("user").isNotNull()),
    ]


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, amount double, user string")


def test_split_tags_every_failed_constraint(spark):
    df = _batch(
        spark,
        [(1, 5.0, "a"), (2, -1.0, "b"), (3, 2.0, None), (4, None, None)],
    )
    clean, quar = split_by_expectations(df, _checks())
    assert [r.id for r in clean.collect()] == [1]
    tags = {r.id: r.violated for r in quar.collect()}
    assert tags[2] == ["pos:amount"]
    assert tags[3] == ["nn:user"]
    # NULL predicate counts as violation; both constraints named
    assert tags[4] == ["pos:amount", "nn:user"]


def test_gate_commits_target_quarantine_report(spark, tmp_path):
    gate = DqGate(str(tmp_path / "dq"), _checks())
    gate(_batch(spark, [(1, 5.0, "a"), (2, -1.0, "b")]), 0)
    gate(_batch(spark, [(3, 1.0, "c"), (4, 2.0, None)]), 1)

    target = gate.target.read(spark)
    assert sorted(r.id for r in target.collect()) == [1, 3]
    quar = {r.id: r.violated for r in gate.quarantine.read(spark).collect()}
    assert quar == {2: "pos:amount", 4: "nn:user"}

    rep = gate.report.read(spark)
    assert rep.count() == 4  # 2 batches x 2 constraints
    b0 = {
        r.constraint_name: r.violations
        for r in rep.where(F.col("batch_id") == 0).collect()
    }
    assert b0 == {"pos:amount": 1, "nn:user": 0}


def test_redelivered_batch_is_noop(spark, tmp_path):
    gate = DqGate(str(tmp_path / "dq"), _checks())
    b = _batch(spark, [(1, 5.0, "a"), (2, -1.0, "b")])
    gate(b, 0)
    versions = (
        gate.target.latest_version(),
        gate.quarantine.latest_version(),
        gate.report.latest_version(),
    )
    gate(b, 0)  # redelivery: applied-batch marker short-circuits
    assert versions == (
        gate.target.latest_version(),
        gate.quarantine.latest_version(),
        gate.report.latest_version(),
    )
    assert gate.target.read(spark).count() == 1


def test_partial_crash_replay_is_idempotent(spark, tmp_path):
    """Crash after target/quarantine commits but BEFORE the report
    commit: the batch replays fully, and the partition-replace makes
    the duplicate commits invisible."""
    gate = DqGate(str(tmp_path / "dq"), _checks())
    b = _batch(spark, [(1, 5.0, "a"), (2, -1.0, "b")])
    clean, quar = split_by_expectations(b, _checks())
    # simulate the crashed half-run: data committed, no report marker
    gate.target.commit(
        clean.withColumn("batch_id", F.lit(0)),
        partition_col="batch_id",
        mode="replace_partitions",
    )
    gate(b, 0)  # replay: not in applied set, runs fully
    assert gate.target.read(spark).count() == 1
    assert gate.quarantine.read(spark).count() == 1
    assert gate.report.read(spark).where(F.col("batch_id") == 0).count() == 2


def test_report_table_stays_bounded_over_lifetime(spark, tmp_path):
    """Round 9: the report (the gate's applied-marker table, read
    every batch) folds on the compaction cadence so its fragment and
    manifest counts track the cadence, not stream lifetime — with all
    rows still present and the replay guard intact."""
    gate = DqGate(str(tmp_path / "dq"), _checks(), compact_every=4)
    for i in range(12):
        gate(_batch(spark, [(i, 1.0, "a")]), i)
    assert len(gate.report.versions()) <= 4
    assert gate.report.fragmentation() <= 4
    # all 12 batches' rows survived the folds
    assert gate.report.read(spark).select(
        "batch_id"
    ).distinct().count() == 12
    assert gate.applied_batches(spark) == set(range(12))
    # replay guard still a no-op
    v = gate.target.latest_version()
    gate(_batch(spark, [(99, 1.0, "a")]), 3)
    assert gate.target.latest_version() == v
