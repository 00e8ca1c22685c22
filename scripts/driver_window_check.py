"""Replay the driver's correctness gate locally: Spark vs DuckDB
row-count + schema-width + value-hash compare of the FIRST 50 registry
queries at sf0.01 (the driver's scale). Run after every window
rotation — test_oracle_parity covers all queries at sf0.001, but
driver-environment divergence (r4's HUGEINT canonicalization) showed
up only at the driver's own scale/engine combination.

Usage: python scripts/driver_window_check.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    # the driver supplies ITS OWN plain SparkSession (no UTC tz, no
    # AQE/legacy confs) and calls __spark_entry__ — simulate exactly
    # that, not data_pipeline_mlops_spark.session.get_spark
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from tests.oracle_compare import compare, duckdb_conn

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-window-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    con = duckdb_conn(SF_DIR)
    bad = []
    for name in list(qs)[:50]:
        try:
            r = compare(qs[name](spark, SF_DIR), con, osql[name])
            ok = r["cols_match"] and r["rows_match"] and r["values_match"]
        except Exception as exc:  # noqa: BLE001 — report, keep going
            ok, r = False, {"error": f"{type(exc).__name__}: {exc}"[:300]}
        status = "ok" if ok else "FAIL"
        print(f"# {name}: {status}", file=sys.stderr)
        if not ok:
            bad.append({"query": name, **{k: str(v)[:200] for k, v in r.items()}})
    print(json.dumps({"sf_dir": SF_DIR, "checked": 50, "failures": bad}))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
