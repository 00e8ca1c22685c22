"""SCALING_r13c: three-point scale series (sf0.1 -> 5x -> 25x) for the
two round-13 late additions — ngram_containment_dups and
doc_ccnet_buckets — on the SAME structure-preserving fixtures as
SCALING_r13 (/tmp/sfx13_5x, /tmp/sfx13_25x; built by
scripts/scale_fixture_r13.py — run it with --build-only first if the
dirs are missing). Both queries read only `documents`, whose replicas
are word-suffixed (disjoint shingle spaces => containment pair
structure replicates linearly) and keep their lang column (=> CCNet
terciles rank a 25x-per-language corpus).

Protocol identical to SCALING_r13: one fresh JVM per leg, cold run
discarded, min-of-N, persistent RDDs released between runs;
per-step exponents alpha = log5(time ratio); plan counts at sf0.1 vs
25x with invariance asserted (both queries are fixed-shape — no
corpus-scaled knob widens their plans).

Usage: python scripts/scale_fixture_r13c.py [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
FIXTURES = {"/tmp/sfx13_5x": 5, "/tmp/sfx13_25x": 25}
FAMILY = ["ngram_containment_dups", "doc_ccnet_buckets"]


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
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
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
        s = plan_summary(QUERIES[name].spark(spark, sf_dir))
        out[name] = {
            "smj": s.n_sort_merge_joins,
            "bhj": s.n_broadcast_joins,
            "exchanges": s.n_exchanges,
            "single_partition": s.n_single_partition,
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="SCALING_r13c.json")
    ap.add_argument("--time-sf", default=None, help="internal: one leg")
    args = ap.parse_args()

    from data_pipeline_mlops_spark.session import get_spark

    if args.time_sf:
        spark = get_spark(app_name="scale-r13c-leg")
        spark.read.parquet(f"{args.time_sf}/documents.parquet").count()
        with open(args.out, "w") as fh:
            json.dump(time_queries(spark, args.time_sf, args.runs), fh)
        return

    for root in FIXTURES:
        if not os.path.exists(f"{root}/documents.parquet"):
            raise SystemExit(
                f"{root} missing - run scale_fixture_r13.py --build-only"
            )

    legs = [SRC, *FIXTURES.keys()]
    timings = {}
    for sf_dir in legs:
        part = f"/tmp/scale_r13c_leg_{os.path.basename(sf_dir)}.json"
        print(f"# fresh-JVM leg: {sf_dir}", file=sys.stderr)
        subprocess.run(
            [
                sys.executable, os.path.abspath(__file__),
                "--time-sf", sf_dir,
                "--runs", str(args.runs),
                "--out", part,
            ],
            check=True,
        )
        with open(part) as fh:
            timings[sf_dir] = json.load(fh)

    exps = {}
    for name in FAMILY:
        t1 = timings[SRC][name]["min"]
        t5 = timings["/tmp/sfx13_5x"][name]["min"]
        t25 = timings["/tmp/sfx13_25x"][name]["min"]
        exps[name] = {
            "alpha_1_to_5x": round(math.log(t5 / t1) / math.log(5), 3),
            "alpha_5x_to_25x": round(math.log(t25 / t5) / math.log(5), 3),
        }

    spark = get_spark(app_name="scale-r13c-plans")
    plans_1 = plan_counts(spark, SRC)
    plans_25 = plan_counts(spark, "/tmp/sfx13_25x")

    result = {
        "legs": {leg: FIXTURES.get(leg, 1) for leg in legs},
        "runs": args.runs,
        "timings": timings,
        "exponents": exps,
        "plan_invariance": {
            name: {
                "sf0.1": plans_1[name],
                "sfx25": plans_25[name],
                "invariant": plans_1[name] == plans_25[name],
                "invariant_expected": True,
            }
            for name in FAMILY
        },
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"out": args.out, "exponents": exps}))


if __name__ == "__main__":
    main()
