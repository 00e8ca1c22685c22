"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Execution is forced with the `noop` datasource (full computation, no
materialization cost), so timings measure the real plan — scan,
shuffle, agg — not driver collect overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Round-1 comparable set (12 keys, matches BENCH_r01.json)
R1_KEYS = [
    "silver_clean",
    "daily_summary",
    "category_performance",
    "top_products",
    "regional_stats",
    "dedup_keep_latest",
    "item_similarity",
    "recommendations",
    "doc_quality",
    "ngram_jaccard_dups",
    "minhash_lsh_candidates",
    "ann_cosine_topk",
]

# Scale-path variants added in round 2: bounded-fan-out recommendation
# scoring (item-kNN cap), stop-shingle-capped exact dedup, and the
# xxhash64 MinHash production path (the registry entry switched to the
# md5-portable variant for oracle parity; production keeps xxhash64).
# Plus the LLM training-data extensions: capped-pair dup clustering,
# n-gram decontamination, and context-window sequence packing.
HEADLINE = R1_KEYS + [
    "recommendations_capped",
    "ngram_jaccard_capped",
    "minhash_lsh_fast",
    "doc_dup_components_capped",
    "eval_decontamination",
    "doc_pack_sequences",
    "corpus_pipeline",
]


def _minhash_fast(spark, sf_dir):
    """xxhash64 MinHash+LSH (production hot path; the registry's
    minhash_lsh_candidates uses the md5-portable twin for its oracle)."""
    from pyspark.sql import functions as F

    from data_pipeline_mlops_spark.functions import dedup_text
    from data_pipeline_mlops_spark.sources.tables import load_table

    return dedup_text.minhash_dedup(
        load_table(spark, sf_dir, "documents"),
        id_col="doc_id",
        text_col="text",
        num_hashes=64,
        bands=16,
        shingle_n=3,
        verify_threshold=0.05,
        hash_method="xxhash64",
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

    from data_pipeline_mlops_spark.registry import QUERIES
    from data_pipeline_mlops_spark.session import get_spark

    spark = get_spark(app_name="bench", cpus=cpus)
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    # warm the JVM + parquet footers once so per-query times measure the
    # plan, not first-touch classloading
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # best-of-3 per query: wall-clock on this box is noisy (external
    # load); min is the stable estimator of the plan's true cost.
    # Spread (max-min) is recorded so the noise is visible in the JSON.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        fn = _minhash_fast if name == "minhash_lsh_fast" else QUERIES[name].spark
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)
        spreads[name] = round(max(samples) - min(samples), 3)
        print(f"# {name}: {timings[name]}s (+{spreads[name]})", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    r1_total = round(sum(timings[k] for k in R1_KEYS if k in timings), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spreads,
                "runs": runs,
                "r1_comparable_total": r1_total,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
