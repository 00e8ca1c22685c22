"""Round-10 scaling spot-check: the two new operator families.

1. time_bucket_gapfill — the claim is that gap-fill cost is bounded by
   the AGGREGATED series (|groups| x calendar days), not fact rows:
   a 10x fact table should move total time only by the aggregation's
   own scan/shuffle growth, and the operator's output row count must
   be IDENTICAL at 1x and 10x (same groups, same calendar).

2. SemDeDup LSH pair source (production xxhash64 buckets) — with
   FIXED planes, per-bucket occupancy grows linearly in N, so
   candidate pairs grow ~N^2/2^planes: the honest measurement shows
   the curve AND the knob. Planes scale with log2(N) to hold
   occupancy constant: at 10x we time both 6 planes (naive) and
   6+ceil(log2(10)) = 10 planes (occupancy-restored) with the same
   table count. The keep rule itself is output-sized (groupBy MIN +
   one join).

Writes SCALING_r10.json. Run alone — no concurrent Spark JVMs.
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

    from data_pipeline_mlops_spark.functions import similarity
    from data_pipeline_mlops_spark.operators.exact import (
        long_count,
        money_sum,
    )
    from data_pipeline_mlops_spark.operators.gapfill import (
        time_bucket_gapfill,
    )
    from data_pipeline_mlops_spark.session import get_spark

    spark = get_spark(app_name="r10-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"metric": "r10_scaling", "copies": COPIES, "runs": RUNS}

    # -- gap-fill: 10x fact rows, identical spine -------------------------
    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    pieces = [orders]
    okey_span = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    for i in range(1, COPIES):
        pieces.append(
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * okey_span)
            )
        )
    big = pieces[0]
    for p in pieces[1:]:
        big = big.unionByName(p)

    def gapfill_on(df):
        agg = df.groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderdate").cast("date").alias("day"),
        ).agg(
            long_count("n_orders"),
            money_sum("o_totalprice", "revenue"),
            F.max("o_totalprice").alias("peak_value"),
        )
        return time_bucket_gapfill(
            agg, group_cols=["prio"], bucket_col="day",
            zero_cols=["n_orders", "revenue"],
            locf_cols=["peak_value"],
        )

    rows_1x = gapfill_on(orders).count()
    rows_10x = gapfill_on(big).count()
    t1 = _timed(lambda: gapfill_on(orders).write.format("noop").mode(
        "overwrite").save())
    t10 = _timed(lambda: gapfill_on(big).write.format("noop").mode(
        "overwrite").save())
    report["gapfill"] = {
        "fact_rows_1x": orders.count(),
        "fact_rows_10x": big.count(),
        "out_rows_1x": rows_1x,
        "out_rows_10x": rows_10x,
        "spine_invariant": rows_1x == rows_10x,
        "t_1x_sec": t1,
        "t_10x_sec": t10,
        "ratio": round(t10 / t1, 2),
    }
    print(json.dumps(report["gapfill"]), file=sys.stderr)

    # -- SemDeDup LSH: fixed planes vs occupancy-restored planes ----------
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    vspan = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    epieces = [emb]
    for i in range(1, COPIES):
        epieces.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * vspan))
        )
    ebig = epieces[0]
    for p in epieces[1:]:
        ebig = ebig.unionByName(p)

    def semdedup_on(corpus, planes: int):
        pairs = similarity.cosine_near_dup_pairs(
            corpus, id_col="vec_id", vec_col="embedding",
            threshold=0.98, method="xxhash64",
            num_planes=planes, num_tables=8,
        )
        lowest = pairs.groupBy(F.col("id_b").alias("vec_id")).agg(
            F.min("id_a").alias("dup_of")
        )
        return corpus.select("vec_id").join(lowest, "vec_id", "left")

    te1 = _timed(lambda: semdedup_on(emb, 6).write.format("noop").mode(
        "overwrite").save())
    te10_naive = _timed(lambda: semdedup_on(ebig, 6).write.format(
        "noop").mode("overwrite").save())
    te10_restored = _timed(lambda: semdedup_on(ebig, 10).write.format(
        "noop").mode("overwrite").save())
    report["semdedup_lsh"] = {
        "vectors_1x": emb.count(),
        "vectors_10x": ebig.count(),
        "t_1x_p6_sec": te1,
        "t_10x_p6_sec": te10_naive,
        "t_10x_p10_sec": te10_restored,
        "ratio_fixed_planes": round(te10_naive / te1, 2),
        "ratio_occupancy_restored": round(te10_restored / te1, 2),
        "note": (
            "fixed planes: occupancy ~N/2^p per table-bucket, pairs "
            "~N^2/2^p (expected super-linear); planes+log2(scale) "
            "restores per-bucket occupancy and the ratio"
        ),
    }
    print(json.dumps(report["semdedup_lsh"]), file=sys.stderr)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_r10.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
