"""SCALING_r13b: three-point scale series for the warehouse / CF /
capped-graph family — the families SCALING_r12 measured only to 5x.

Fixtures: full-table 5x and 25x replicas of sf0.1 (sfw13_5x /
sfw13_25x) using scale_fixture_r12's structure-preserving transforms:
order/customer id offsets with the part catalog FIXED (traffic grows,
catalog doesn't — so the CF/graph pair sources grow in baskets, not
in catalog), documents word-suffixed per replica, embeddings
sign-flipped with the r13 vec_id offset fix (10M per replica; r12's
100k collided with the planted near-dup copy ids). 25x = 15M
lineitems / 37.5M events... events are copied as-is (the measured
family below doesn't read them).

Measured family (one fresh JVM per leg, cold run discarded, min-of-N):
- daily_summary            — scan + exact-decimal agg baseline
- bucketed_order_revenue   — fact-fact join
- customer_rolling_features— RANGE-frame window features
- recommendations_capped   — CF scale tier (basket cap 5)
- item_similarity_basket_capped — capped cosine item-item
- item_pagerank_capped     — capped co-purchase graph, iterative
- item_triangles_capped    — capped wedge join
- incremental_dedup_decisions — streaming index replay (documents)

Usage: python scripts/scale_fixture_r13b.py [--build-only] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
FIXTURES = {"/tmp/sfw13_5x": 5, "/tmp/sfw13_25x": 25}
OFF = {"c_custkey": 100_000, "o_orderkey": 1_000_000,
       "doc_id": 1_000_000, "vec_id": 10_000_000}

FAMILY = [
    "daily_summary",
    "bucketed_order_revenue",
    "customer_rolling_features",
    "recommendations_capped",
    "item_similarity_basket_capped",
    "item_pagerank_capped",
    "item_triangles_capped",
    "incremental_dedup_decisions",
]


def build_fixture(spark, root: str, replicas: int) -> None:
    import random

    from pyspark.sql import functions as F

    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)

    def wr(df, name, files=8):
        df.coalesce(files).write.mode("overwrite").parquet(
            f"{root}/{name}.parquet"
        )

    def union(parts):
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    for t in ["region", "nation", "part", "supplier", "events"]:
        src, dst = f"{SRC}/{t}.parquet", f"{root}/{t}.parquet"
        (shutil.copytree if os.path.isdir(src) else shutil.copy2)(src, dst)

    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    wr(union([
        cust.withColumn(
            "c_custkey", F.col("c_custkey") + F.lit(i * OFF["c_custkey"])
        )
        for i in range(replicas)
    ]), "customer")

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    wr(union([
        orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * OFF["o_orderkey"])
        ).withColumn(
            "o_custkey", F.col("o_custkey") + F.lit(i * OFF["c_custkey"])
        )
        for i in range(replicas)
    ]), "orders", files=min(32, 4 * replicas))

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    wr(union([
        li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * OFF["o_orderkey"])
        )
        for i in range(replicas)
    ]), "lineitem", files=min(32, 4 * replicas))

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    doc_parts = []
    for i in range(replicas):
        d = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * OFF["doc_id"])
        )
        if i > 0:
            d = d.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.lit(str(i))),
                    ),
                    " ",
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        doc_parts.append(d)
    wr(union(doc_parts), "documents", files=min(32, 4 * replicas))

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    emb_parts = []
    for i in range(replicas):
        e = emb.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * OFF["vec_id"])
        )
        if i > 0:
            rng = random.Random(i)
            signs = [float(rng.choice((-1.0, 1.0))) for _ in range(64)]
            e = e.withColumn(
                "embedding",
                F.zip_with(
                    "embedding",
                    F.array(*[F.lit(s) for s in signs]),
                    lambda v, s: (v * s).cast("float"),
                ),
            )
        emb_parts.append(e)
    wr(union(emb_parts), "embeddings", files=min(16, 2 * replicas))


def _release(spark) -> None:
    jsc = spark.sparkContext._jsc.sc()
    it = jsc.getPersistentRDDs().values().iterator()
    while it.hasNext():
        it.next().unpersist(True)


def time_queries(spark, sf_dir: str, runs: int) -> dict:
    from data_pipeline_mlops_spark.registry import QUERIES

    out = {}
    for name in FAMILY:
        fn = QUERIES[name].spark
        samples = []
        for i in range(runs + 1):
            _release(spark)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            if i > 0:
                samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples}
        print(f"# {sf_dir} {name}: {min(samples)}s", file=sys.stderr)
    return out


def plan_counts(spark, sf_dir: str) -> dict:
    from data_pipeline_mlops_spark.plans.diagnose import plan_summary
    from data_pipeline_mlops_spark.registry import QUERIES

    out = {}
    for name in FAMILY:
        try:
            s = plan_summary(QUERIES[name].spark(spark, sf_dir))
            out[name] = {
                "smj": s.n_sort_merge_joins,
                "bhj": s.n_broadcast_joins,
                "exchanges": s.n_exchanges,
                "single_partition": s.n_single_partition,
            }
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="SCALING_r13b.json")
    ap.add_argument("--time-sf", default=None)
    args = ap.parse_args()

    if args.time_sf:
        from data_pipeline_mlops_spark.session import get_spark

        spark = get_spark(app_name="scale-r13b-leg")
        spark.read.parquet(f"{args.time_sf}/lineitem.parquet").count()
        with open(args.out, "w") as fh:
            json.dump(time_queries(spark, args.time_sf, args.runs), fh)
        return

    from data_pipeline_mlops_spark.session import get_spark

    spark = get_spark(app_name="scale-fixture-r13b")
    for root, replicas in FIXTURES.items():
        if not os.path.exists(f"{root}/lineitem.parquet"):
            print(f"# building {root} ({replicas}x)...", file=sys.stderr)
            build_fixture(spark, root, replicas)
    if args.build_only:
        return

    spark.stop()

    legs = [SRC, *FIXTURES.keys()]
    timings = {}
    for sf_dir in legs:
        part = f"/tmp/scale_r13b_leg_{os.path.basename(sf_dir)}.json"
        print(f"# fresh-JVM leg: {sf_dir}", file=sys.stderr)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--time-sf", sf_dir, "--runs", str(args.runs),
             "--out", part],
            check=True,
        )
        with open(part) as fh:
            timings[sf_dir] = json.load(fh)

    result = {
        "legs": {leg: FIXTURES.get(leg, 1) for leg in legs},
        "runs": args.runs,
        "timings": timings,
    }
    exps = {}
    for name in FAMILY:
        t1 = timings[SRC][name]["min"]
        t5 = timings["/tmp/sfw13_5x"][name]["min"]
        t25 = timings["/tmp/sfw13_25x"][name]["min"]
        exps[name] = {
            "alpha_1_to_5x": round(math.log(t5 / t1) / math.log(5), 3)
            if t1 > 0 else None,
            "alpha_5x_to_25x": round(math.log(t25 / t5) / math.log(5), 3)
            if t5 > 0 else None,
        }
    result["exponents"] = exps

    spark = get_spark(app_name="scale-r13b-plans")
    plans_1 = plan_counts(spark, SRC)
    plans_25 = plan_counts(spark, "/tmp/sfw13_25x")
    result["plan_invariance"] = {
        name: {
            "sf0.1": plans_1[name],
            "sfx25": plans_25[name],
            "invariant": plans_1[name] == plans_25[name],
        }
        for name in FAMILY
    }

    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"out": args.out, "exponents": exps}))


if __name__ == "__main__":
    main()
