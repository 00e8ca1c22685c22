"""Streaming candle store lifetime cost: per-batch update time must
stay FLAT as the delta log grows, because (a) the applied() probe and
read path fold at most |grid| + unfolded-delta rows and (b)
``maintain`` periodically compacts the log to one summary per
(series, bucket).  Measures 24 batches with maintain_every=8 and
reports head/tail mean batch times + the final incremental==batch
equality check.  Writes SCALING_r10c.json. Run alone."""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = 24
ROWS_PER_BATCH = 20_000
MAINTAIN_EVERY = 8


def main() -> None:
    from pyspark.sql import functions as F

    from data_pipeline_mlops_spark.operators.ohlc import ohlc_agg
    from data_pipeline_mlops_spark.session import get_spark
    from data_pipeline_mlops_spark.streaming.candle_stream import (
        CandleStore,
    )
    from data_pipeline_mlops_spark.timeutil import epoch_s

    spark = get_spark(app_name="candle-lifetime")
    spark.sparkContext.setLogLevel("ERROR")

    def events(lo: int, hi: int):
        return spark.range(lo, hi).select(
            F.col("id").alias("event_id"),
            (
                F.to_timestamp(F.lit("2024-06-01 00:00:00"))
                + F.make_interval(secs=(F.col("id") * 37) % 864000)
            ).alias("ts"),
            F.concat(F.lit("s"), (F.col("id") % 5).cast("string"))
            .alias("series"),
            ((F.col("id") * 13) % 9700 / F.lit(40.0) + 1.0)
            .alias("value"),
        )

    root = tempfile.mkdtemp(prefix="candle_life_")
    store = CandleStore(root, bucket="hour")
    times = []
    for b in range(BATCHES):
        lo = b * ROWS_PER_BATCH
        df = events(lo, lo + ROWS_PER_BATCH)
        t0 = time.monotonic()
        assert store.update(
            df, series_col="series", ts_col="ts", value_col="value",
            tiebreak_col="event_id", batch_id=b,
        )
        if MAINTAIN_EVERY and b > 0 and b % MAINTAIN_EVERY == 0:
            store.maintain(spark)
        times.append(round(time.monotonic() - t0, 3))

    head = statistics.mean(times[1:7])
    tail = statistics.mean(times[-6:])

    got = sorted(
        map(tuple, store.read_candles(spark).collect())
    )
    whole = events(0, BATCHES * ROWS_PER_BATCH)
    want = sorted(
        map(
            tuple,
            ohlc_agg(
                whole.withColumnRenamed("series", "event_type"),
                group_cols=["event_type"], ts_col="ts",
                value_col="value", bucket="hour",
                tiebreak_col="event_id",
            )
            .select(
                F.col("event_type").alias("series"),
                epoch_s(F.col("bucket_hour")).alias("bucket_s"),
                "open", "high", "low", "close", "n_ticks", "volume",
            )
            .collect(),
        )
    )
    report = {
        "metric": "candle_store_lifetime",
        "batches": BATCHES,
        "rows_per_batch": ROWS_PER_BATCH,
        "maintain_every": MAINTAIN_EVERY,
        "batch_times_sec": times,
        "head_mean_sec": round(head, 3),
        "tail_mean_sec": round(tail, 3),
        "tail_over_head": round(tail / head, 2),
        "final_equals_batch_ohlc": got == want,
        "grid_rows": len(got),
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_r10c.json",
    )
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
