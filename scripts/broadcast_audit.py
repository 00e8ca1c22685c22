"""Broadcast-threshold robustness audit (VERDICT r5 item #8).

At 100 TB, dimension tables can outgrow
spark.sql.autoBroadcastJoinThreshold (default 10 MB), and a star join
that silently degrades from BroadcastHashJoin to SortMergeJoin on a
dim is a cluster-wide regression nobody asked for. This sweep runs
every registry query's plan twice — once with the default threshold,
once with autoBroadcastJoinThreshold=-1 (auto-broadcast OFF) — and
reports which queries LOSE broadcast joins when the optimizer can no
longer infer them from size. A query that keeps its broadcasts with
the threshold off carries explicit `F.broadcast` hints and is robust;
one that degrades relies on size inference and must either gain a
hint (genuinely bounded dims: region=5 rows, nation=25 rows at every
SF) or be accepted as SMJ-correct (fact-to-fact).

Usage: python scripts/broadcast_audit.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "BROADCAST_AUDIT.json"


def _session():
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("broadcast-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
    )
    return b.getOrCreate()


def _sweep(spark, threshold: str) -> dict[str, dict]:
    from data_pipeline_mlops_spark.plans.diagnose import plan_summary
    from data_pipeline_mlops_spark.registry import spark_queries

    # autoBroadcastJoinThreshold is a runtime SQL conf — set it on the
    # ONE shared session rather than rebuilding sessions (static confs
    # like spark.driver.memory are inert on a second getOrCreate in the
    # same JVM, and leftover confs could bleed between sessions).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    out: dict[str, dict] = {}
    for name, fn in spark_queries().items():
        try:
            df = fn(spark, SF_DIR)
            s = plan_summary(df)
            out[name] = {
                "broadcast_joins": s.n_broadcast_joins,
                "sort_merge_joins": s.n_sort_merge_joins,
                "exchanges": s.n_exchanges,
            }
        except Exception as exc:  # noqa: BLE001 — audit must finish
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
    return out


def main() -> None:
    spark = _session()
    base = _sweep(spark, "10485760")  # Spark default 10 MB
    off = _sweep(spark, "-1")
    spark.stop()
    degraded, robust_hinted, unaffected = [], [], []
    for name, b in base.items():
        o = off.get(name, {})
        if "error" in b or "error" in o:
            continue
        if b["broadcast_joins"] == 0:
            unaffected.append(name)
        elif o["broadcast_joins"] >= b["broadcast_joins"]:
            robust_hinted.append(name)
        else:
            degraded.append(
                {
                    "query": name,
                    "broadcasts_default": b["broadcast_joins"],
                    "broadcasts_off": o["broadcast_joins"],
                    "smj_default": b["sort_merge_joins"],
                    "smj_off": o["sort_merge_joins"],
                }
            )
    report = {
        "sf_dir": SF_DIR,
        "queries": len(base),
        "no_broadcast_anywhere": len(unaffected),
        "robust_explicit_hints": sorted(robust_hinted),
        "degraded_on_threshold_off": degraded,
        "errors": {
            n: v["error"]
            for n, v in {**base, **off}.items()
            if "error" in v
        },
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in report.items() if k != "robust_explicit_hints"}, indent=1)[:4000])


if __name__ == "__main__":
    main()
