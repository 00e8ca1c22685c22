"""CandleStore: persisted incremental OHLC partials — incremental ==
batch equality, replay idempotence, compaction invariants, and an
end-to-end availableNow stream run (streaming/candle_stream.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_pipeline_mlops_spark.operators.ohlc import ohlc_agg
from data_pipeline_mlops_spark.streaming.candle_stream import (
    CandleStore,
    candle_foreach_batch,
)
from data_pipeline_mlops_spark.timeutil import epoch_s

T0 = dt.datetime(2024, 6, 1, 0, 0, 0)


def _events(spark, lo, hi):
    """Deterministic synthetic tick stream: 2 series, ~90-minute
    spread, value varies by id."""
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        (F.lit(T0) + F.make_interval(mins=(F.col("id") * 7) % 90))
        .alias("ts"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias(
            "series"
        ),
        ((F.col("id") * 13) % 97 / F.lit(4.0) + 1.0).alias("value"),
    )


def _batch_twin(spark, df):
    """Expected candle rows from the batch operator, aligned to the
    store's output shape."""
    out = ohlc_agg(
        df.withColumnRenamed("series", "event_type"),
        group_cols=["event_type"],
        ts_col="ts",
        value_col="value",
        bucket="hour",
        tiebreak_col="event_id",
    ).select(
        F.col("event_type").alias("series"),
        epoch_s(F.col("bucket_hour")).alias("bucket_s"),
        "open", "high", "low", "close", "n_ticks", "volume",
    )
    return sorted(map(tuple, out.collect()))


def _candles(store, spark):
    return sorted(map(tuple, store.read_candles(spark).collect()))


def test_incremental_updates_equal_batch_ohlc(spark, tmp_path):
    store = CandleStore(str(tmp_path / "candles"), bucket="hour")
    a, b, c = (
        _events(spark, 0, 40),
        _events(spark, 40, 70),
        _events(spark, 70, 100),
    )
    for i, part in enumerate([a, b, c]):
        assert store.update(
            part, series_col="series", ts_col="ts",
            value_col="value", tiebreak_col="event_id", batch_id=i,
        )
    whole = _events(spark, 0, 100)
    assert _candles(store, spark) == _batch_twin(spark, whole)


def test_replayed_batch_is_noop(spark, tmp_path):
    store = CandleStore(str(tmp_path / "candles"))
    a = _events(spark, 0, 30)
    assert store.update(
        a, series_col="series", ts_col="ts", value_col="value",
        tiebreak_col="event_id", batch_id=0,
    )
    before = _candles(store, spark)
    assert not store.update(
        a, series_col="series", ts_col="ts", value_col="value",
        tiebreak_col="event_id", batch_id=0,
    )
    assert _candles(store, spark) == before


def test_maintain_compacts_without_changing_candles(spark, tmp_path):
    store = CandleStore(str(tmp_path / "candles"))
    for i, (lo, hi) in enumerate([(0, 30), (30, 60), (60, 80)]):
        store.update(
            _events(spark, lo, hi), series_col="series", ts_col="ts",
            value_col="value", tiebreak_col="event_id", batch_id=i,
        )
    before = _candles(store, spark)
    store.maintain(spark)
    assert _candles(store, spark) == before
    # folded ids stay applied; replays stay no-ops
    for i in range(3):
        assert store.applied(spark, i)
        assert not store.update(
            _events(spark, 0, 5), series_col="series", ts_col="ts",
            value_col="value", tiebreak_col="event_id", batch_id=i,
        )
    # new batches apply on top of the summary
    assert store.update(
        _events(spark, 80, 100), series_col="series", ts_col="ts",
        value_col="value", tiebreak_col="event_id", batch_id=3,
    )
    assert _candles(store, spark) == _batch_twin(
        spark, _events(spark, 0, 100)
    )


def test_compaction_cadence_survives_restart(spark, tmp_path):
    """ADVICE r11: the compaction cadence must be derived from durable
    store state, not adapter-closure memory — a restart-heavy
    deployment where every streaming-query incarnation applies fewer
    than ``maintain_every`` batches would otherwise NEVER compact.
    Simulate restarts by building a FRESH adapter per batch."""
    root = str(tmp_path / "candles")
    batches = [(0, 25), (25, 50), (50, 75), (75, 100)]
    for i, (lo, hi) in enumerate(batches):
        # new incarnation each batch: closure state is lost every time
        body = candle_foreach_batch(
            root=root, series_col="series", ts_col="ts",
            value_col="value", tiebreak_col="event_id",
            bucket="hour", maintain_every=2,
        )
        body(_events(spark, lo, hi), i)
    store = CandleStore(root, bucket="hour")
    # cadence fired in-stream despite the restarts: after batch 3
    # (the 4th applied) pending hit 2 again and the store compacted —
    # only summary + watermark rows remain
    rows = store.table.read(spark)
    assert rows.where(F.col("kind") == "delta").isEmpty()
    assert store.pending_deltas(spark) == 0
    wm = rows.where(F.col("kind") == "watermark").collect()
    assert len(wm) == 1 and wm[0]["batch_id"] == 3
    # and candles are still exactly the batch twin
    assert _candles(store, spark) == _batch_twin(
        spark, _events(spark, 0, 100)
    )


def test_candle_stream_end_to_end(spark, tmp_path):
    import os

    src = tmp_path / "src"
    os.makedirs(src)
    # 4 files -> 4 applied batches, so maintain_every=2 compacts
    # IN-STREAM (after the 2nd and 4th applied batch), exercising the
    # applied-batch cadence from ADVICE r10.
    _events(spark, 0, 25).coalesce(1).write.parquet(str(src / "p1"))
    _events(spark, 25, 50).coalesce(1).write.parquet(str(src / "p2"))
    _events(spark, 50, 75).coalesce(1).write.parquet(str(src / "p3"))
    _events(spark, 75, 100).coalesce(1).write.parquet(str(src / "p4"))

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, series string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "p*"))
    )
    root = str(tmp_path / "candles")
    q = (
        stream.writeStream.foreachBatch(
            candle_foreach_batch(
                root=root, series_col="series", ts_col="ts",
                value_col="value", tiebreak_col="event_id",
                bucket="hour", maintain_every=2,
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    store = CandleStore(root, bucket="hour")
    assert _candles(store, spark) == _batch_twin(
        spark, _events(spark, 0, 100)
    )
    # the final in-stream maintain (4th applied batch) folded every
    # delta into summary rows + a watermark at the last batch id
    from pyspark.sql import functions as F

    rows = store.table.read(spark)
    assert rows.where(F.col("kind") == "delta").isEmpty()
    wm = rows.where(F.col("kind") == "watermark").collect()
    assert len(wm) == 1 and wm[0]["batch_id"] == 3
