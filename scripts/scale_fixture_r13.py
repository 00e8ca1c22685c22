"""SCALING_r13 (VERDICT r12 #1/#4): three-point scale series for the
ANN/dedup family after the LSH occupancy knob went corpus-scaled.

Fixtures: sfx0.5 (5x sf0.1) and sfx2.5 (25x sf0.1 — ~125k docs / 50k
embeddings, two 5x steps) built by the same structure-preserving
replication as scripts/scale_fixture_r12.py, restricted to the tables
this family reads (documents, embeddings; the rest copied as-is):

- documents: replica i>0 word-suffixed with str(i) — per-replica
  length/vocab stats and planted-dup structure identical to sf0.1,
  shingle spaces disjoint across replicas (the sf0.1 vocabulary is
  digit-free — verified — so no suffix can collide with a base word
  or another replica's suffixing).
- embeddings: replica i>0 multiplied by a deterministic +-1 sign
  pattern (diagonal orthogonal map: norms and within-replica cosines
  exact, cross-replica cosines scrambled). vec_id offset is
  10_000_000 per replica — NOT r12's 100_000, which collided with
  _near_dup_corpus's planted-copy ids (+100_000): at 5 replicas the
  r12 fixture gave replica i's originals the same vec_ids as replica
  i-1's planted copies, so its semdedup legs ran on a corpus with
  duplicate ids (timing-only artifact, but fixed here).

Measured queries (the dedup/ANN family — the two re-tuned
occupancy-knob tiers plus the shingle/fingerprint dedup tiers for
family context): doc_semdedup_fast, embedding_near_dups_fast,
minhash_lsh_fast, ngram_jaccard_capped, doc_winnowing_fps,
doc_dup_components_capped.

Protocol: ONE FRESH JVM PER LEG (subprocess per scale point — the
r12 lesson: single-JVM legs inflated up to 4x), cold run discarded,
min-of-N, persistent RDDs released between runs. Output: per-query
times at sf0.1 / 5x / 25x, per-step exponents (alpha = log5 of the
time ratio), and plan counts at sf0.1 vs 25x. For the two auto-knob
tiers the plan is EXPECTED to widen with scale (num_tables = planes
grows with log2 n — more union branches by design), so invariance is
asserted only for the four fixed-shape queries; the knob tiers
record their counts with invariant_expected=false.

Usage: python scripts/scale_fixture_r13.py [--build-only] [--runs 3]
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
FIXTURES = {"/tmp/sfx13_5x": 5, "/tmp/sfx13_25x": 25}
VEC_OFFSET = 10_000_000
DOC_OFFSET = 1_000_000

FAMILY = [
    "doc_semdedup_fast",
    "embedding_near_dups_fast",
    "minhash_lsh_fast",
    "ngram_jaccard_capped",
    "doc_winnowing_fps",
    "doc_dup_components_capped",
]
# the auto-knob tiers: plan width grows with corpus size BY DESIGN
KNOB_TIERS = {"doc_semdedup_fast", "embedding_near_dups_fast"}


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

    for t in [
        "region", "nation", "part", "supplier", "events",
        "customer", "orders", "lineitem",
    ]:
        src = f"{SRC}/{t}.parquet"
        dst = f"{root}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy2(src, dst)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    doc_parts = []
    for i in range(replicas):
        d = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * DOC_OFFSET)
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
    wr(_union(doc_parts), "documents", files=min(32, 4 * replicas))

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    emb_parts = []
    for i in range(replicas):
        e = emb.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * VEC_OFFSET)
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
    wr(_union(emb_parts), "embeddings", files=min(16, 2 * replicas))


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
    for name in FAMILY:
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
    for name in FAMILY:
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
    ap.add_argument("--out", default="SCALING_r13.json")
    ap.add_argument("--time-sf", default=None, help="internal: one leg")
    args = ap.parse_args()

    if args.time_sf:
        from data_pipeline_mlops_spark.session import get_spark

        spark = get_spark(app_name="scale-r13-leg")
        spark.read.parquet(f"{args.time_sf}/documents.parquet").count()
        with open(args.out, "w") as fh:
            json.dump(time_queries(spark, args.time_sf, args.runs), fh)
        return

    from data_pipeline_mlops_spark.session import get_spark

    spark = get_spark(app_name="scale-fixture-r13")
    for root, replicas in FIXTURES.items():
        if not os.path.exists(f"{root}/embeddings.parquet"):
            print(f"# building {root} ({replicas}x)...", file=sys.stderr)
            build_fixture(spark, root, replicas)
    if args.build_only:
        return

    spark.stop()  # one heavy JVM at a time

    legs = [SRC, *FIXTURES.keys()]
    timings = {}
    for sf_dir in legs:
        part = f"/tmp/scale_r13_leg_{os.path.basename(sf_dir)}.json"
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

    result = {
        "legs": {leg: (FIXTURES.get(leg, 1)) for leg in legs},
        "runs": args.runs,
        "vec_offset_fix": VEC_OFFSET,
        "timings": timings,
    }
    exps = {}
    for name in FAMILY:
        t1 = timings[SRC][name]["min"]
        t5 = timings["/tmp/sfx13_5x"][name]["min"]
        t25 = timings["/tmp/sfx13_25x"][name]["min"]
        exps[name] = {
            "alpha_1_to_5x": round(math.log(t5 / t1) / math.log(5), 3)
            if t1 > 0 else None,
            "alpha_5x_to_25x": round(math.log(t25 / t5) / math.log(5), 3)
            if t5 > 0 else None,
        }
    result["exponents"] = exps

    spark = get_spark(app_name="scale-r13-plans")
    plans_1 = plan_counts(spark, SRC)
    plans_25 = plan_counts(spark, "/tmp/sfx13_25x")
    result["plan_invariance"] = {
        name: {
            "sf0.1": plans_1[name],
            "sfx25": plans_25[name],
            "invariant": plans_1[name] == plans_25[name],
            "invariant_expected": name not in KNOB_TIERS,
        }
        for name in FAMILY
    }

    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"out": args.out, "exponents": exps}))


if __name__ == "__main__":
    main()
