"""Round-10 session-2 scaling spot-check: the continuous-aggregate
tier (OHLC, heartbeat uptime, M4, bucketed EMA) plus the forward
as-of join.

Claim under test: every operator's OUTPUT is bounded by series
structure (|series| x buckets / segments / selections), never by fact
rows — so a 10x-denser event stream (same 30-day span, same users,
same event types) must keep output row counts IDENTICAL (uptime
segment count may legitimately drop as gaps fill in; asserted
less-or-equal) while wall time grows at most ~linearly with the scan.

10x construction: 10 event_id-shifted copies of events.parquet —
denser series, identical span/keys (event_id shift keeps tiebreaks
unique).

Writes SCALING_r10b.json. Run alone — no concurrent Spark JVMs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 10
RUNS = 3


def _timed(fn) -> float:
    best = None
    for _ in range(RUNS):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from data_pipeline_mlops_spark.operators.asof import asof_join
    from data_pipeline_mlops_spark.operators.downsample import (
        m4_downsample,
    )
    from data_pipeline_mlops_spark.operators.ema import bucketed_ema
    from data_pipeline_mlops_spark.operators.ohlc import ohlc_agg
    from data_pipeline_mlops_spark.operators.stateagg import (
        heartbeat_uptime,
    )
    from data_pipeline_mlops_spark.session import get_spark

    spark = get_spark(app_name="r10-scaling2")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {
        "metric": "r10_scaling2",
        "copies": COPIES,
        "runs": RUNS,
        "sf_dir": BASE,
    }

    ev = spark.read.parquet(f"{BASE}/events.parquet")
    span = ev.agg(F.max("event_id")).collect()[0][0] + 1
    big = ev
    for i in range(1, COPIES):
        big = big.unionByName(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * span))
        )

    def shapes(name, build, invariant="equal"):
        r1 = build(ev).count()
        r10 = build(big).count()
        t1 = _timed(
            lambda: build(ev).write.format("noop").mode("overwrite").save()
        )
        t10 = _timed(
            lambda: build(big).write.format("noop").mode("overwrite").save()
        )
        ok = r1 == r10 if invariant == "equal" else r10 <= r1
        report[name] = {
            "out_rows_1x": r1,
            "out_rows_10x": r10,
            "output_invariant": ok,
            "t_1x_sec": t1,
            "t_10x_sec": t10,
            "ratio": round(t10 / t1, 2),
        }
        print(name, json.dumps(report[name]), file=sys.stderr)

    shapes(
        "ohlc",
        lambda df: ohlc_agg(
            df, group_cols=["event_type"], ts_col="ts",
            value_col="value", bucket="day", tiebreak_col="event_id",
        ),
    )
    # denser beats can only MERGE segments -> <= at 10x
    shapes(
        "heartbeat_uptime",
        lambda df: heartbeat_uptime(
            df, group_cols=["user_id"], ts_col="ts", liveness_seconds=600
        ),
    )
    shapes(
        "m4",
        lambda df: m4_downsample(
            df, group_cols=["event_type"], ts_col="ts",
            value_col="value", n_buckets=64, tiebreak_col="event_id",
        ),
    )
    shapes(
        "ema_hourly",
        lambda df: bucketed_ema(
            df, group_cols=["event_type"], ts_col="ts",
            value_col="value", alpha=0.3, bucket="hour",
        ),
    )

    # forward as-of: output = |left| (grows with copies by design);
    # report the time ratio only, normalized per left row.
    def nexterr(df):
        p = df.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"), "user_id", "ts"
        )
        er = df.where(F.col("event_type") == "error").select(
            "event_id", "user_id", "ts"
        )
        return asof_join(
            p, er, on="user_id", left_ts="ts", right_ts="ts",
            payload=["event_id"], tiebreak="event_id",
            direction="forward", payload_prefix="err_",
        )

    r1, r10 = nexterr(ev).count(), nexterr(big).count()
    t1 = _timed(
        lambda: nexterr(ev).write.format("noop").mode("overwrite").save()
    )
    t10 = _timed(
        lambda: nexterr(big).write.format("noop").mode("overwrite").save()
    )
    report["asof_forward"] = {
        "out_rows_1x": r1,
        "out_rows_10x": r10,
        "t_1x_sec": t1,
        "t_10x_sec": t10,
        "ratio": round(t10 / t1, 2),
        "ratio_per_left_row": round((t10 / r10) / (t1 / r1), 2),
    }
    print("asof_forward", json.dumps(report["asof_forward"]), file=sys.stderr)

    with open(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING_r10b.json"),
        "w",
    ) as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
