"""Composed streaming pipeline (streaming/compose.py): CDC orders ->
classify -> stateful throttle -> late-audit gate -> transactional
keyed upsert, with a mid-stream crash + forced batch redelivery.
Asserts the end state equals the batch twin: every batch-twin fired
alert lands in exactly one of {final table, late quarantine}, nothing
is dropped, nothing is doubled."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

M = 60 * 1_000_000  # one minute in epoch-us

SRC_SCHEMA = (
    "order_id string, total double, quantity int, price double,"
    " customer_id string, product_name string, ev_us long"
)


def _write_file(spark, src_dir: str, name: str, rows: list[tuple]) -> None:
    staging = os.path.join(src_dir, "_stage_" + name)
    spark.createDataFrame(rows, SRC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).json(staging)
    part = glob.glob(os.path.join(staging, "part-*.json"))[0]
    os.replace(part, os.path.join(src_dir, name + ".json"))


def _order(oid, cust, ev_us, *, total=100.0, qty=1, price=10.0):
    return (oid, total, qty, price, cust, "widget", ev_us)


def _run_available(pipe, spark, src_dir, ckpt):
    stream = (
        spark.readStream.schema(SRC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )
    q = pipe.start(stream, checkpoint_dir=ckpt, cooldown_seconds=1800)
    q.awaitTermination()


def test_composed_pipeline_crash_replay_matches_batch_twin(spark, tmp_path):
    from data_pipeline_mlops_spark.streaming.compose import (
        batch_twin_fired,
        build_composed_pipeline,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # cooldown 30 min, lateness delay 10 min. Event times are
    # monotone ACROSS files (arrival order == event order), so the
    # stream's per-batch fired-anchored fold equals the batch twin's
    # global fold.
    batch0 = [
        _order("o1", "c1", 0 * M, total=20000.0),  # HIGH_VALUE fires
        _order("o2", "c1", 5 * M, total=15000.0),  # suppressed (<30m)
        _order("o3", "c2", 40 * M, qty=100),       # SUSPICIOUS fires
        _order("o0", "c9", 41 * M),                # no rule matches
    ]
    batch1 = [
        _order("o4", "c1", 50 * M, total=30000.0),  # fires, on time
        # c3 first alert but fired_at 20m < wm 30m -> quarantined late
        _order("o5", "c3", 20 * M, price=-5.0),
        _order("o6", "c2", 55 * M, qty=70),         # suppressed (15m)
    ]
    batch2 = [
        _order("o7", "c1", 90 * M, total=12000.0),  # fires (40m gap)
        _order("o8", "c2", 75 * M, qty=200),        # fires (35m gap)
        # c4 first alert but 35m < wm 40m -> quarantined late
        _order("o9", "c4", 35 * M, qty=-1),
    ]

    pipe = build_composed_pipeline(
        str(tmp_path / "tables"), delay_us=10 * M
    )

    _write_file(spark, src, "f0", batch0)
    _write_file(spark, src, "f1", batch1)
    _run_available(pipe, spark, src, ckpt)  # processes f0, f1

    # -- forced crash: wipe the engine's commit for the LAST batch so
    # the restart REDELIVERS it (state store rolls back and recomputes
    # it; the gate's applied-marker must make the replay a no-op).
    commits = sorted(
        p
        for p in glob.glob(os.path.join(ckpt, "commits", "*"))
        if not os.path.basename(p).startswith(".")
    )
    os.remove(commits[-1])
    # the checkpoint manager writes a .N.crc checksum sibling; the
    # replayed commit's rename fails if it survives the "crash"
    crc = os.path.join(
        os.path.dirname(commits[-1]),
        f".{os.path.basename(commits[-1])}.crc",
    )
    if os.path.exists(crc):
        os.remove(crc)

    _write_file(spark, src, "f2", batch2)
    _run_available(pipe, spark, src, ckpt)  # replays f1, then f2

    final = {
        (r["user_id"], r["event_type"], r["event_id"]): r["fired_at_us"]
        for r in pipe.final.read(spark).collect()
    }
    late = {
        (r["user_id"], r["event_type"], r["event_id"]): r["lateness_us"]
        for r in pipe.gate.late.read(spark).collect()
    }

    batch_src = spark.createDataFrame(
        batch0 + batch1 + batch2, SRC_SCHEMA
    )
    twin = {
        (r["user_id"], r["event_type"], r["event_id"]): r["fired_at_us"]
        for r in batch_twin_fired(batch_src).collect()
    }

    def key_of(order_id, cust, alert_type):
        row = (
            spark.range(1)
            .select(
                F.xxhash64(F.lit(cust)).alias("u"),
                F.xxhash64(F.lit(order_id)).alias("e"),
            )
            .collect()[0]
        )
        return (row["u"], alert_type, row["e"])

    # batch twin fired exactly the 7 expected alerts
    assert len(twin) == 7
    # composition: every twin alert is in exactly one of final/late
    assert set(twin) == set(final) | set(late)
    assert not (set(final) & set(late))
    # the two late arrivals are the quarantined ones, with lateness
    k5 = key_of("o5", "c3", "NEGATIVE_PRICE")
    k9 = key_of("o9", "c4", "INVALID_QUANTITY")
    assert set(late) == {k5, k9}
    assert late[k5] == 10 * M  # wm 30m - fired 20m
    assert late[k9] == 5 * M   # wm 40m - fired 35m
    # fired timestamps survive the merge byte-exactly
    for k, ts in final.items():
        assert twin[k] == ts
    # replayed batch 1 did not double-apply: one final row per key
    assert len(final) == 5
    # watermark frontier ended at max fired (90m) - delay (10m)
    assert pipe.gate.current_watermark_us(spark) == 80 * M
    # suppressed events never reached the gate in EITHER path
    suppressed = {key_of("o2", "c1", "HIGH_VALUE_ORDER"),
                  key_of("o6", "c2", "SUSPICIOUS_QUANTITY")}
    assert not (suppressed & (set(final) | set(late)))
