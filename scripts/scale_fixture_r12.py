"""SCALING_r12 (VERDICT r11 #5): one scale step beyond sf0.1.

Builds a 5x fixture ("sfx0.5") from sf0.1 by REPLICATION WITH
STRUCTURE-PRESERVING TRANSFORMS — each replica reproduces sf0.1's
internal statistics while staying disjoint from the others in exactly
the dimensions that matter per table:

- orders/customer: entity-id offsets (user/order space grows 5x —
  traffic growth), lineitem keeps the SAME part catalog (catalogs grow
  slower than traffic), so the CF/graph pair sources grow ~5x in
  baskets, not in catalog.
- documents: every word in replica i>0 gets an `i` suffix — per-doc
  length/vocab statistics and every PLANTED dup pair survive inside
  each replica, while shingle/fingerprint spaces are disjoint across
  replicas (no artificial cross-replica dup explosion: total pair
  count grows ~5x, the honest corpus-growth shape).
- embeddings: replica i multiplies every vector elementwise by a
  deterministic +-1 sign pattern (a diagonal orthogonal map): norms
  and ALL within-replica cosines are preserved EXACTLY, cross-replica
  cosines are scrambled toward 0 — ANN/near-dup structure per replica
  identical to sf0.1, total 5x.
- region/nation/part/supplier/events: copied as-is (dims, or unused
  by the measured tier).

Then times the 10 most expensive bench headliners at sf0.01 / sf0.1 /
sfx0.5 (fresh-JVM discipline: cold run discarded, min-of-N, persistent
RDDs released between runs), records per-query scaling exponents for
the 0.01->0.1 step (alpha = log10 t-ratio) and the 0.1->0.5x step
(alpha = log5 t-ratio), and captures plan invariance (SortMergeJoin /
broadcast / exchange counts at both SFs must match).

Usage: python scripts/scale_fixture_r12.py [--build-only] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "/tmp/sfx0.5"
REPLICAS = 5
OFFSETS = {
    "c_custkey": 100_000,
    "o_orderkey": 1_000_000,
    "doc_id": 100_000,
    "vec_id": 100_000,
}

TOP10 = [
    "recommendations_als",
    "incremental_dedup_decisions",
    "doc_dup_components_capped",
    "recommendations",
    "corpus_pipeline",
    "recommendations_capped",
    "doc_semdedup_fast",
    "embedding_near_dups_fast",
    "doc_winnowing_fps",
    # NOT image_dhash_near_dups (next by cost): its planted BMP grids
    # are a function of doc_id mod 251, so replication grows its
    # hash-equal clusters linearly and its PAIR COUNT quadratically —
    # a fixture-planting artifact, not an engine property. The next
    # honest headliner is the capped shingle tier.
    "ngram_jaccard_capped",
]


def build_fixture(spark, src: str = "/root/testdata/sf0.1") -> None:
    import random

    from pyspark.sql import functions as F

    if os.path.exists(FIXTURE):
        shutil.rmtree(FIXTURE)
    os.makedirs(FIXTURE)

    def wr(df, name):
        df.coalesce(8).write.mode("overwrite").parquet(
            f"{FIXTURE}/{name}.parquet"
        )

    for t in ["region", "nation", "part", "supplier", "events"]:
        wr(spark.read.parquet(f"{src}/{t}.parquet"), t)

    cust = spark.read.parquet(f"{src}/customer.parquet")
    wr(
        _union(
            [
                cust.withColumn(
                    "c_custkey",
                    F.col("c_custkey") + F.lit(i * OFFSETS["c_custkey"]),
                )
                for i in range(REPLICAS)
            ]
        ),
        "customer",
    )

    orders = spark.read.parquet(f"{src}/orders.parquet")
    wr(
        _union(
            [
                orders.withColumn(
                    "o_orderkey",
                    F.col("o_orderkey") + F.lit(i * OFFSETS["o_orderkey"]),
                ).withColumn(
                    "o_custkey",
                    F.col("o_custkey") + F.lit(i * OFFSETS["c_custkey"]),
                )
                for i in range(REPLICAS)
            ]
        ),
        "orders",
    )

    li = spark.read.parquet(f"{src}/lineitem.parquet")
    wr(
        _union(
            [
                li.withColumn(
                    "l_orderkey",
                    F.col("l_orderkey") + F.lit(i * OFFSETS["o_orderkey"]),
                )
                for i in range(REPLICAS)
            ]
        ),
        "lineitem",
    )

    docs = spark.read.parquet(f"{src}/documents.parquet")
    doc_parts = []
    for i in range(REPLICAS):
        d = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * OFFSETS["doc_id"])
        )
        if i > 0:
            suffixed = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.lit(str(i))),
                ),
                " ",
            )
            d = d.withColumn("text", suffixed).withColumn(
                "n_chars", F.length("text").cast("long")
            )
        doc_parts.append(d)
    wr(_union(doc_parts), "documents")

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    emb_parts = []
    for i in range(REPLICAS):
        e = emb.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * OFFSETS["vec_id"])
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
    wr(_union(emb_parts), "embeddings")


def _union(parts):
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _release(spark) -> None:
    jsc = spark.sparkContext._jsc.sc()
    it = jsc.getPersistentRDDs().values().iterator()
    while it.hasNext():
        it.next().unpersist(True)


def time_queries(spark, sf_dir: str, runs: int) -> dict:
    from bench import _EXTRA_FNS

    from data_pipeline_mlops_spark.registry import QUERIES

    out = {}
    for name in TOP10:
        fn = _EXTRA_FNS.get(name) or QUERIES[name].spark
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
    from bench import _EXTRA_FNS

    from data_pipeline_mlops_spark.plans.diagnose import plan_summary
    from data_pipeline_mlops_spark.registry import QUERIES

    out = {}
    for name in TOP10:
        fn = _EXTRA_FNS.get(name) or QUERIES[name].spark
        try:
            s = plan_summary(fn(spark, sf_dir))
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
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="SCALING_r12.json")
    ap.add_argument(
        "--time-sf",
        default=None,
        help="internal: time ONE sf dir in this (fresh) JVM and dump "
        "partial json to --out — the parent spawns one subprocess per "
        "SF so no leg inherits the previous leg's JVM residue "
        "(first single-JVM attempt inflated the middle leg's samples "
        "up to 4x: broadcast/shuffle accumulation survives the "
        "persistent-RDD release)",
    )
    args = ap.parse_args()

    if args.time_sf:
        from data_pipeline_mlops_spark.session import get_spark

        spark = get_spark(app_name="scale-r12-leg")
        spark.read.parquet(f"{args.time_sf}/lineitem.parquet").count()
        with open(args.out, "w") as fh:
            json.dump(time_queries(spark, args.time_sf, args.runs), fh)
        return

    import subprocess

    from data_pipeline_mlops_spark.session import get_spark

    spark = get_spark(app_name="scale-fixture-r12")
    if not os.path.exists(f"{FIXTURE}/lineitem.parquet"):
        print("# building fixture...", file=sys.stderr)
        build_fixture(spark)
    if args.build_only:
        return

    # one heavy JVM at a time on this box: park the parent's executor
    # threads while the timing legs run
    spark.stop()

    result = {"fixture": FIXTURE, "replicas": REPLICAS, "runs": args.runs}
    timings = {}
    for sf_dir in ["/root/testdata/sf0.01", "/root/testdata/sf0.1", FIXTURE]:
        part = f"/tmp/scale_r12_leg_{os.path.basename(sf_dir)}.json"
        print(f"# fresh-JVM leg: {sf_dir}", file=sys.stderr)
        subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--time-sf",
                sf_dir,
                "--runs",
                str(args.runs),
                "--out",
                part,
            ],
            check=True,
        )
        with open(part) as fh:
            timings[sf_dir] = json.load(fh)
    result["timings"] = timings

    exps = {}
    for name in TOP10:
        t001 = timings["/root/testdata/sf0.01"][name]["min"]
        t01 = timings["/root/testdata/sf0.1"][name]["min"]
        t05 = timings[FIXTURE][name]["min"]
        exps[name] = {
            "alpha_001_to_01": round(math.log10(t01 / t001), 3)
            if t001 > 0
            else None,
            "alpha_01_to_05x": round(
                math.log(t05 / t01) / math.log(REPLICAS), 3
            )
            if t01 > 0
            else None,
        }
    result["exponents"] = exps

    spark = get_spark(app_name="scale-r12-plans")
    plans_01 = plan_counts(spark, "/root/testdata/sf0.1")
    plans_05 = plan_counts(spark, FIXTURE)
    result["plan_invariance"] = {
        name: {
            "sf0.1": plans_01[name],
            "sfx0.5": plans_05[name],
            "invariant": plans_01[name] == plans_05[name],
        }
        for name in TOP10
    }

    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"out": args.out, "exponents": exps}))


if __name__ == "__main__":
    main()
