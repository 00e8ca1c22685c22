"""Scaling evidence for the composed streaming pipeline
(streaming/compose.py) — the surface the r8 verdict marked weak.

Two axes, written to SCALING_r9.json:

1. volume: same batch count, 10x rows per batch — end-to-end wall
   ratio. The per-batch work is classify (map-side) + throttle (one
   shuffle on (user,type)) + gate split (broadcast-scalar compare) +
   keyed merge, all row-linear; ratio should sit well under 10 on a
   fixed-core box.
2. lifetime: fixed rows per batch across 3x more batches — mean
   per-batch wall of the LAST quarter vs the FIRST quarter. This is
   the axis the r8 stall lived on (per-batch cost grew with stream
   lifetime via manifest fan-out); with empty-batch skips, the
   persist()-backed single upstream execution, and wm compaction
   (compact_every) the tail/head ratio should stay near 1.

Run:  python scripts/compose_scaling.py   (one Spark JVM; ~3-5 min)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = 60 * 1_000_000
SRC_SCHEMA = (
    "order_id string, total double, quantity int, price double,"
    " customer_id string, product_name string, ev_us long"
)


def _write_batch_file(spark, src_dir, name, *, n_rows, base_minute):
    from pyspark.sql import functions as F

    df = (
        spark.range(n_rows)
        .select(
            F.concat(F.lit(f"o{name}_"), F.col("id")).alias("order_id"),
            # ~1/4 of rows trip a rule (HIGH_VALUE / SUSPICIOUS / ...)
            (F.when(F.col("id") % 4 == 0, 20000.0).otherwise(100.0)).alias(
                "total"
            ),
            F.lit(1).alias("quantity"),
            F.lit(10.0).alias("price"),
            F.concat(F.lit("c"), F.col("id") % 500).alias("customer_id"),
            F.lit("widget").alias("product_name"),
            (
                F.lit(base_minute).cast("long") * F.lit(M).cast("long")
                + (F.col("id") % 60).cast("long") * F.lit(M * 60)
            ).alias("ev_us"),
        )
    )
    staging = os.path.join(src_dir, "_stage_" + name)
    df.coalesce(1).write.mode("overwrite").json(staging)
    part = glob.glob(os.path.join(staging, "part-*.json"))[0]
    os.replace(part, os.path.join(src_dir, name + ".json"))


def run_pipeline(spark, *, n_batches, rows_per_batch, root):
    """Feed n_batches files through the composed pipeline; returns
    (total_wall_s, per_batch_wall_s list)."""
    from data_pipeline_mlops_spark.streaming.compose import (
        build_composed_pipeline,
        composed_alert_stream,
    )

    src = os.path.join(root, "src")
    os.makedirs(src)
    for i in range(n_batches):
        _write_batch_file(
            spark, src, f"f{i:03d}",
            n_rows=rows_per_batch, base_minute=i * 100,
        )
    pipe = build_composed_pipeline(
        os.path.join(root, "tables"), delay_us=10 * M
    )
    durations: list[float] = []
    gate = pipe.gate

    def timed_gate(df, bid):
        t0 = time.perf_counter()
        gate(df, bid)
        durations.append(time.perf_counter() - t0)

    stream = (
        spark.readStream.schema(SRC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    throttled = composed_alert_stream(stream, cooldown_seconds=1800)
    t0 = time.perf_counter()
    q = (
        throttled.writeStream.foreachBatch(timed_gate)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return time.perf_counter() - t0, durations


def main() -> None:
    from data_pipeline_mlops_spark.session import get_spark

    spark = get_spark(app_name="compose-scaling", cpus=8,
                      shuffle_partitions=8)
    out: dict = {"shapes": {}}
    work = tempfile.mkdtemp(prefix="compose_scale_")
    try:
        # axis 1: volume (8 batches; 5k vs 50k rows per batch)
        t1, _ = run_pipeline(
            spark, n_batches=8, rows_per_batch=5_000,
            root=os.path.join(work, "v1"),
        )
        t10, _ = run_pipeline(
            spark, n_batches=8, rows_per_batch=50_000,
            root=os.path.join(work, "v10"),
        )
        out["shapes"]["compose_volume_10x"] = {
            "wall_1x_s": round(t1, 2),
            "wall_10x_s": round(t10, 2),
            "ratio": round(t10 / t1, 2),
            "batches": 8,
        }
        # axis 2: lifetime (24 batches of 5k rows; head vs tail cost)
        _, per_batch = run_pipeline(
            spark, n_batches=24, rows_per_batch=5_000,
            root=os.path.join(work, "life"),
        )
        data_batches = per_batch[:24]
        head = sum(data_batches[:6]) / 6
        tail = sum(data_batches[-6:]) / 6
        out["shapes"]["compose_lifetime_24_batches"] = {
            "head_mean_s": round(head, 2),
            "tail_mean_s": round(tail, 2),
            "tail_over_head": round(tail / head, 2),
            "per_batch_s": [round(x, 2) for x in per_batch],
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
