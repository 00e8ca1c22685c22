"""Streaming alert engine tests: replay the reference's canonical
6-row CDC corpus (FIXTURES.md §4; reference scripts/test_cdc_alerts.py:34-50)
through the Structured Streaming pipeline — expect exactly 4 alerts
with first-match-wins types."""

from __future__ import annotations

import tempfile

from data_pipeline_mlops_spark.streaming import alert_stream, microbatch

# (order_id, total, quantity, price, expected alert type or None)
CORPUS = [
    ("O1001", 200.0, 2, 100.0, None),
    ("O1002", 450.0, 3, 150.0, None),
    ("O2001", 15000.0, 5, 3000.0, "HIGH_VALUE_ORDER"),
    ("O2002", 5000.0, 60, 83.0, "SUSPICIOUS_QUANTITY"),
    ("O2003", -500.0, 5, -100.0, "NEGATIVE_PRICE"),
    ("O2004", 999.0, 0, 999.0, "INVALID_QUANTITY"),
]


def _corpus_rows():
    return [
        {
            "order_id": oid,
            "total": total,
            "quantity": qty,
            "price": price,
            "customer_id": f"CUST{i:04d}",
            "product_name": f"Product {i}",
        }
        for i, (oid, total, qty, price, _) in enumerate(CORPUS, 1)
    ]


def test_streaming_alert_corpus(spark):
    with tempfile.TemporaryDirectory() as d:
        alert_stream.write_corpus(d, _corpus_rows())
        src = alert_stream.file_json_source(spark, d)
        assert src.isStreaming
        alerts = alert_stream.alert_pipeline(src)
        alert_stream.run_to_memory(alerts, query_name="alerts_corpus")
        got = {
            r["order_id"]: r["alert_type"]
            for r in spark.sql("SELECT * FROM alerts_corpus").collect()
        }
    expected = {oid: t for oid, _, _, _, t in CORPUS if t is not None}
    assert got == expected  # exactly 4 alerts, correct types, no extras


def test_batch_and_stream_rules_agree(spark):
    """The same rule objects drive batch and streaming (stateless
    expressions) — classify the corpus as a batch frame and compare."""
    batch = spark.createDataFrame(
        _corpus_rows(),
        schema=alert_stream.CDC_ORDER_SCHEMA,
    )
    out = alert_stream.alert_pipeline(batch).collect()
    got = {r["order_id"]: r["alert_type"] for r in out}
    expected = {oid: t for oid, _, _, _, t in CORPUS if t is not None}
    assert got == expected


def test_multi_rule_row_takes_first_match(spark):
    """CASE order matters (FIXTURES.md): a row matching every rule gets
    HIGH_VALUE_ORDER."""
    row = [
        {
            "order_id": "OALL",
            "total": 99999.0,
            "quantity": -5,
            "price": -1.0,
            "customer_id": "C1",
            "product_name": "P",
        }
    ]
    batch = spark.createDataFrame(row, schema=alert_stream.CDC_ORDER_SCHEMA)
    out = alert_stream.alert_pipeline(batch).collect()
    assert len(out) == 1 and out[0]["alert_type"] == "HIGH_VALUE_ORDER"


def test_malformed_json_rows_become_nulls_not_errors(spark):
    """Lenient JSON parity: garbage records parse to nulls (PERMISSIVE),
    they don't kill the stream."""
    from pyspark.sql import functions as F

    raw = spark.createDataFrame(
        [("not json at all",), ('{"order_id": "OK1", "total": 20000.0}',)],
        "value string",
    )
    parsed = alert_stream.parse_cdc_json(raw)
    rows = {r["order_id"] for r in parsed.collect()}
    assert rows == {None, "OK1"}
    alerts = alert_stream.alert_pipeline(parsed).collect()
    assert [r["order_id"] for r in alerts] == ["OK1"]


def test_format_alert_message():
    msg = alert_stream.format_alert_message(
        {
            "alert_type": "HIGH_VALUE_ORDER",
            "order_id": "O1",
            "total": 15000.0,
            "quantity": 5,
        }
    )
    assert "O1" in msg and "$15,000.00" in msg


def test_windowed_rapid_orders(spark):
    """T4 windowed rule (beyond-parity): 3 orders in 5 minutes fire."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("C1", base + dt.timedelta(minutes=m)) for m in (0, 1, 2)
    ] + [("C2", base), ("C2", base + dt.timedelta(minutes=30))]
    df = spark.createDataFrame(rows, "customer_id string, event_ts timestamp")
    out = alert_stream.windowed_rapid_orders(df, threshold=3).collect()
    assert len(out) == 1
    assert out[0]["customer_id"] == "C1" and out[0]["order_count"] == 3


def test_dashboard_microbatch_snapshots(spark, tmp_path):
    """§3.2 parity: five metric tables snapshot + notify callback."""
    import datetime as dt

    rows = [
        (
            f"O{i}",
            dt.datetime(2024, 1, 1, 10 + (i % 3)),
            f"C{i % 4}",
            f"P{i % 5}",
            "Electronics" if i % 2 else "Books",
            ["North", "South"][i % 2],
            float(100 * (i + 1)),
            i + 1,
            "completed",
        )
        for i in range(12)
    ]
    orders = spark.createDataFrame(
        rows,
        "order_id string, order_date timestamp, customer_id string,"
        "product_name string, category string, region string,"
        "total double, quantity int, status string",
    )
    notifications = []
    body = microbatch.refresh_dashboard(
        base_path=str(tmp_path),
        notify=notifications.append,
        metric_kwargs=dict(
            ts_col="order_date",
            amount_col="total",
            customer_col="customer_id",
            product_col="product_name",
            category_col="category",
            region_col="region",
            qty_col="quantity",
            statuses=["completed", "processing"],
            status_col="status",
        ),
    )
    body(orders, batch_id=7)
    for name in (
        "overall_metrics",
        "top_products",
        "category_stats",
        "regional_stats",
        "hourly_stats",
    ):
        snap = spark.read.parquet(f"{tmp_path}/{name}")
        assert snap.count() > 0, name
    overall = spark.read.parquet(f"{tmp_path}/overall_metrics").collect()[0]
    assert overall["total_orders"] == 12
    assert notifications and notifications[0]["batch_id"] == 7
    assert notifications[0]["overall"]["total_orders"] == 12


def test_checkpoint_resume_processes_only_new_rows(spark, tmp_path):
    """T3: checkpointed restart — rerunning after new files arrive must
    process only the unseen input (exactly-once source accounting)."""
    import json
    import os

    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src_dir)

    def write_file(name, rows):
        with open(os.path.join(src_dir, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def run_once():
        src = alert_stream.file_json_source(spark, src_dir)
        alerts = alert_stream.alert_pipeline(src)
        q = (
            alerts.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_file(
        "batch1.json",
        [{"order_id": "A1", "total": 20000.0, "quantity": 1, "price": 1.0,
          "customer_id": "C", "product_name": "P"}],
    )
    run_once()
    first = spark.read.parquet(out).count()
    assert first == 1

    write_file(
        "batch2.json",
        [{"order_id": "A2", "total": 30000.0, "quantity": 1, "price": 1.0,
          "customer_id": "C", "product_name": "P"}],
    )
    run_once()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2  # A1 not reprocessed, A2 appended
    assert {r["order_id"] for r in rows} == {"A1", "A2"}


def test_streaming_dashboard_foreachbatch(spark, tmp_path):
    """§3.2 as a real stream: file source -> foreachBatch dashboard
    refresh (the structured-streaming form of the 1-min cron)."""
    import datetime as dt
    import os

    from pyspark.sql import types as T

    src_dir = str(tmp_path / "orders_src")
    os.makedirs(src_dir)
    schema = (
        "order_id string, order_date timestamp, customer_id string,"
        "product_name string, category string, region string,"
        "total double, quantity int, status string"
    )
    rows = [
        (
            f"O{i}",
            dt.datetime(2024, 1, 1, 9 + (i % 2)),
            f"C{i % 3}",
            f"P{i % 2}",
            "Books",
            "North",
            50.0 * (i + 1),
            1,
            "completed",
        )
        for i in range(6)
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).json(src_dir)

    base = str(tmp_path / "dash")
    seen = []
    body = microbatch.refresh_dashboard(
        base_path=base,
        notify=seen.append,
        metric_kwargs=dict(
            ts_col="order_date",
            amount_col="total",
            customer_col="customer_id",
            product_col="product_name",
            category_col="category",
            region_col="region",
            qty_col="quantity",
        ),
    )
    stream = (
        spark.readStream.schema(T._parse_datatype_string(schema))
        .json(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(body)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "dash_ckpt"))
        .start()
    )
    q.awaitTermination()
    overall = spark.read.parquet(f"{base}/overall_metrics").collect()[0]
    assert overall["total_orders"] == 6
    assert seen and seen[0]["overall"]["total_orders"] == 6


def test_sessionize_stateful_operator(spark, tmp_path):
    """applyInPandasWithState session windows: a gap larger than
    gap_seconds splits sessions; idle state flushes via the
    processing-time timeout. The query never self-terminates (timeout
    batches keep it alive) — poll the sink, then stop."""
    import datetime as dt
    import os
    import time

    from pyspark.sql import types as T

    from data_pipeline_mlops_spark.streaming.sessionize import sessionize

    src = str(tmp_path / "ev")
    os.makedirs(src)
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 7: burst of 3 events, a 2-hour gap, then 1 event
        (7, base, 10.0),
        (7, base + dt.timedelta(minutes=5), 20.0),
        (7, base + dt.timedelta(minutes=10), 30.0),
        (7, base + dt.timedelta(hours=2), 40.0),
        # user 8: single burst
        (8, base, 5.0),
    ]
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    ).coalesce(1).write.mode("overwrite").json(src)

    stream = spark.readStream.schema(
        T._parse_datatype_string("user_id long, ts timestamp, value double")
    ).json(src)
    sessions = sessionize(stream, gap_seconds=1800, timeout_ms=2000)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        got = []
        while time.time() < deadline:
            got = spark.sql("SELECT * FROM sessions_out").collect()
            if len(got) >= 3:
                break
            time.sleep(2)
    finally:
        q.stop()
    by_key = {
        (r["user_id"], r["session_start"]): r for r in got
    }
    assert len(by_key) == 3  # u7 burst, u7 late event, u8 burst
    s1 = by_key[(7, base)]
    assert s1["n_events"] == 3 and s1["sum_value"] == 60.0
    assert s1["session_end"] == base + dt.timedelta(minutes=10)
    s2 = by_key[(7, base + dt.timedelta(hours=2))]
    assert s2["n_events"] == 1 and s2["sum_value"] == 40.0
    s3 = by_key[(8, base)]
    assert s3["n_events"] == 1 and s3["sum_value"] == 5.0


def test_kafka_sink_payload_shape(spark):
    """K2's transformation minus the transport: the alert record
    serializes to a single JSON `value` column with all fields."""
    import json

    from pyspark.sql import functions as F

    batch = spark.createDataFrame(
        [("HIGH_VALUE_ORDER", "O1", "C1", "P1", 15000.0, 5)],
        "alert_type string, order_id string, customer_id string,"
        "product_name string, total double, quantity int",
    )
    payload = batch.select(F.to_json(F.struct("*")).alias("value")).collect()
    assert payload[0].asDict().keys() == {"value"}
    parsed = json.loads(payload[0]["value"])
    assert parsed == {
        "alert_type": "HIGH_VALUE_ORDER",
        "order_id": "O1",
        "customer_id": "C1",
        "product_name": "P1",
        "total": 15000.0,
        "quantity": 5,
    }


def test_stream_stream_join_orders_payments(spark, tmp_path):
    """Stream-stream inner join with watermarks + event-time bound:
    payments within the delay window match; a payment outside the
    window and an unpaid order do not appear."""
    import json

    from data_pipeline_mlops_spark.streaming import enrich_stream

    odir, pdir = tmp_path / "orders", tmp_path / "payments"
    odir.mkdir(), pdir.mkdir()
    t0 = "2024-01-01T00:{m:02d}:00.000Z"
    orders = [
        {"order_id": "O1", "order_ts": t0.format(m=0),
         "customer_id": "C1", "total": 100.0},
        {"order_id": "O2", "order_ts": t0.format(m=5),
         "customer_id": "C2", "total": 200.0},
        {"order_id": "O3", "order_ts": t0.format(m=10),
         "customer_id": "C3", "total": 300.0},  # never paid
    ]
    payments = [
        {"pay_order_id": "O1", "pay_ts": t0.format(m=2),
         "method": "card", "amount": 100.0},   # in window
        {"pay_order_id": "O2", "pay_ts": t0.format(m=45),
         "method": "cash", "amount": 200.0},   # outside 30-min window
    ]
    (odir / "o.json").write_text(
        "\n".join(json.dumps(r) for r in orders)
    )
    (pdir / "p.json").write_text(
        "\n".join(json.dumps(r) for r in payments)
    )

    joined = enrich_stream.join_orders_payments(
        enrich_stream.order_file_source(spark, str(odir)),
        enrich_stream.payment_file_source(spark, str(pdir)),
        watermark="1 minute",
        max_delay_sec=1800,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("paid_orders")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = {r.order_id: r for r in spark.sql(
        "SELECT * FROM paid_orders").collect()}
    assert set(rows) == {"O1"}
    assert rows["O1"].method == "card"
    assert rows["O1"].pay_latency_us == 120_000_000


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Replayed CDC order events collapse to one row per order_id."""
    import json

    from data_pipeline_mlops_spark.streaming import enrich_stream

    odir = tmp_path / "orders"
    odir.mkdir()
    rows = [
        {"order_id": "O1", "order_ts": "2024-01-01T00:00:00.000Z",
         "customer_id": "C1", "total": 100.0},
        {"order_id": "O1", "order_ts": "2024-01-01T00:00:00.000Z",
         "customer_id": "C1", "total": 100.0},   # exact replay
        {"order_id": "O2", "order_ts": "2024-01-01T00:01:00.000Z",
         "customer_id": "C2", "total": 200.0},
    ]
    (odir / "o.json").write_text("\n".join(json.dumps(r) for r in rows))
    deduped = enrich_stream.dedup_orders(
        enrich_stream.order_file_source(spark, str(odir))
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_orders")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = [r.order_id for r in spark.sql(
        "SELECT order_id FROM dedup_orders").collect()]
    assert sorted(got) == ["O1", "O2"]


def test_upsert_sink_partition_level_merge(spark, tmp_path):
    """Keyed upsert into partitioned parquet: batch 2 updates one key,
    adds one, leaves other partitions untouched on disk; replaying
    batch 2 changes nothing (idempotent)."""
    import os

    from data_pipeline_mlops_spark.streaming.upsert_sink import upsert_batch

    path = str(tmp_path / "tbl")
    kw = dict(path=path, key_cols=["k"], order_col="v", partition_col="p")

    b1 = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, 30, "b")], "k long, v long, p string"
    )
    upsert_batch(b1, **kw)
    b_mtime = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(path, "p=b")) for f in fs
    )

    b2 = spark.createDataFrame(
        [(1, 11, "a"), (4, 40, "a")], "k long, v long, p string"
    )
    upsert_batch(b2, **kw)

    got = {(r.k, r.v, r.p) for r in spark.read.parquet(path).collect()}
    assert got == {(1, 11, "a"), (2, 20, "a"), (3, 30, "b"), (4, 40, "a")}
    # partition b was never read or rewritten
    b_mtime2 = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(path, "p=b")) for f in fs
    )
    assert b_mtime2 == b_mtime

    upsert_batch(b2, **kw)  # replay
    again = {(r.k, r.v, r.p) for r in spark.read.parquet(path).collect()}
    assert again == got


def test_upsert_sink_driven_by_real_stream(spark, tmp_path):
    """End-to-end: a file stream drives upsert_foreach_batch through
    writeStream; restarting with more data upserts instead of
    appending (the table holds the winning row per key)."""
    import json

    from data_pipeline_mlops_spark.streaming.upsert_sink import (
        upsert_foreach_batch,
    )

    src = tmp_path / "src"
    src.mkdir()
    table = str(tmp_path / "tbl")
    schema = "k LONG, v LONG, p STRING"

    def run_once(name):
        stream = (
            spark.readStream.schema(schema)
            .json(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(
                upsert_foreach_batch(
                    path=table, key_cols=["k"], order_col="v",
                    partition_col="p",
                )
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)

    (src / "f1.json").write_text(
        "\n".join(json.dumps(r) for r in [
            {"k": 1, "v": 10, "p": "a"},
            {"k": 2, "v": 20, "p": "b"},
        ])
    )
    run_once("first")
    got = {(r.k, r.v, r.p) for r in spark.read.parquet(table).collect()}
    assert got == {(1, 10, "a"), (2, 20, "b")}

    # second file: update k=1 (higher v), add k=3 — checkpoint makes
    # the restarted query process only the new file
    (src / "f2.json").write_text(
        "\n".join(json.dumps(r) for r in [
            {"k": 1, "v": 11, "p": "a"},
            {"k": 3, "v": 30, "p": "a"},
        ])
    )
    run_once("second")
    got = {(r.k, r.v, r.p) for r in spark.read.parquet(table).collect()}
    assert got == {(1, 11, "a"), (2, 20, "b"), (3, 30, "a")}


def test_incremental_cascade_matches_batch_rollup(spark, tmp_path):
    """Continuous-aggregate maintenance: minutely deltas written per
    micro-batch, daily derived at read time — after every batch the
    result equals the one-shot batch cascade over all events seen, and
    replaying a batch changes nothing (delta partitions are
    overwrite-idempotent)."""
    import json

    from data_pipeline_mlops_spark.operators.aggregate import cascade_rollup
    from data_pipeline_mlops_spark.streaming.cascade_maintain import (
        minutely_delta_writer,
        read_rollup,
    )

    src = tmp_path / "src"
    src.mkdir()
    deltas = str(tmp_path / "deltas")
    schema = "ts TIMESTAMP, event_type STRING, value DOUBLE"
    writer = minutely_delta_writer(
        path=deltas, keys=["event_type"], ts_col="ts", value_col="value"
    )

    def run_once():
        q = (
            spark.readStream.schema(schema).json(str(src))
            .writeStream.foreachBatch(writer)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)

    from pyspark.sql import functions as F

    def check():
        got = {
            (r.bucket, r.event_type): (r.n_events, r.total_value)
            for r in read_rollup(
                spark, path=deltas, keys=["event_type"], level="day"
            ).collect()
        }
        all_events = spark.read.schema(schema).json(str(src))
        want = {
            (r.bucket, r.event_type): (r.n, r.tv)
            for r in cascade_rollup(
                all_events, ts_col="ts", keys=["event_type"],
                value_col="value",
            )
            .select(
                F.date_trunc("day", "bucket").alias("bucket"),
                "event_type",
                F.col("n_events").cast("long").alias("n"),
                F.round("__sv", 2).cast("double").alias("tv"),
            )
            .collect()
        }
        assert got == want

    rows1 = [
        {"ts": "2024-03-01T10:00:30", "event_type": "view", "value": 1.5},
        {"ts": "2024-03-01T10:00:40", "event_type": "view", "value": 2.5},
        {"ts": "2024-03-01T23:59:59", "event_type": "buy", "value": 10.0},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows1))
    run_once()
    check()

    rows2 = [
        {"ts": "2024-03-01T10:01:00", "event_type": "view", "value": 4.0},
        {"ts": "2024-03-02T00:00:01", "event_type": "buy", "value": 7.25},
    ]
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in rows2))
    run_once()
    check()

    # at-least-once replay: the SAME batch redelivered with the SAME
    # batch_id (what a foreachBatch retry does) overwrites its own
    # delta partition instead of double-adding. (Wiping the checkpoint
    # would renumber batches — idempotence is per (checkpoint,
    # batch_id), the standard foreachBatch contract.)
    batch2 = spark.read.schema(schema).json(str(src / "b2.json"))
    writer(batch2, 1)
    check()


def test_upsert_sink_equal_order_tie_is_deterministic(spark, tmp_path):
    """Two rows with the same key AND equal order_col in one batch must
    resolve to a content-determined winner so replays converge: apply
    the identical batch to two fresh tables and after a replay — all
    three states must match."""
    from data_pipeline_mlops_spark.streaming.upsert_sink import upsert_batch

    rows = [(1, 5, "x", "a"), (1, 5, "y", "a"), (2, 7, "z", "a")]
    schema = "k long, v long, payload string, p string"
    kw = dict(key_cols=["k"], order_col="v", partition_col="p")

    states = []
    for name in ("t1", "t2"):
        path = str(tmp_path / name)
        b = spark.createDataFrame(rows, schema)
        upsert_batch(b, path=path, **kw)
        upsert_batch(b, path=path, **kw)  # replay of the same batch
        states.append(
            {(r.k, r.v, r.payload) for r in spark.read.parquet(path).collect()}
        )
    assert states[0] == states[1]
    assert len(states[0]) == 2  # one winner per key


def test_upsert_sink_map_column(spark, tmp_path):
    """Map-typed payload columns must upsert: hash functions reject
    MapType (HASH_MAP_TYPE), so the content tiebreak routes through
    to_json — a regression for the round-3 xxhash64(*cols) tiebreak."""
    from data_pipeline_mlops_spark.streaming.upsert_sink import upsert_batch

    path = str(tmp_path / "tbl")
    kw = dict(path=path, key_cols=["k"], order_col="v", partition_col="p")
    schema = "k long, v long, attrs map<string,string>, p string"
    b1 = spark.createDataFrame([(1, 1, {"a": "x"}, "d")], schema)
    upsert_batch(b1, **kw)
    b2 = spark.createDataFrame(
        [(1, 2, {"a": "y"}, "d"), (2, 1, {"b": "z"}, "d")], schema
    )
    upsert_batch(b2, **kw)  # second batch exercises the merge+tiebreak
    got = {(r.k, r.v, tuple(sorted(r.attrs.items())))
           for r in spark.read.parquet(path).collect()}
    assert got == {(1, 2, (("a", "y"),)), (2, 1, (("b", "z"),))}
