"""Registry-wide physical-plan audit: build EVERY registry query at a
small SF and flag optimization anti-patterns mechanically, without
executing anything (explain only — the point is full-registry coverage
of plan shape, cheap enough to re-run after any operator change).

Flags per query:
  - py_eval:   BatchEvalPython / ArrowEvalPython / MapInPandas /
               MapInArrow nodes (Python boundary in the plan; expected
               only for the media-codec tier)
  - cartesian: CartesianProduct, or BroadcastNestedLoopJoin whose build
               side is not an aggregate/1-row subtree (best-effort: we
               report ALL BNLJ and leave the triage note inline)
  - filter_recompute: a Filter node whose condition embeds an
               expensive derived expression (md5/xxhash64 over a
               multi-step transform, or a regexp_replace chain >= 3
               deep) — the pushed-down-filter duplication class fixed
               on winnowing/crawl this round
  - rowudf:    SQL 'pythonUDF' markers outside py_eval nodes

Emits one JSON object keyed by query with node counts + flags, plus a
stderr summary of flagged queries.

Usage: python scripts/plan_audit.py [--sf /root/testdata/sf0.01]
       [--out PLAN_AUDIT_r13.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _shape(txt: str) -> dict:
    def n(pat: str) -> int:
        return len(re.findall(pat, txt, re.M))

    # count only the numbered detail entries, not tree reprints
    return {
        "Exchange": n(r"^\(\d+\) Exchange"),
        "BroadcastExchange": n(r"^\(\d+\) BroadcastExchange"),
        "ReusedExchange": n(r"^\(\d+\) ReusedExchange"),
        "SMJ": n(r"^\(\d+\) SortMergeJoin"),
        "BHJ": n(r"^\(\d+\) BroadcastHashJoin"),
        "SHJ": n(r"^\(\d+\) ShuffledHashJoin"),
        "BNLJ": n(r"^\(\d+\) BroadcastNestedLoopJoin"),
        "Cartesian": n(r"^\(\d+\) CartesianProduct"),
        "PyEval": n(
            r"^\(\d+\) (BatchEvalPython|ArrowEvalPython|MapInPandas|"
            r"MapInArrow|FlatMapGroupsInPandas)"
        ),
        "Generate": n(r"^\(\d+\) Generate"),
        "ScanParquet": n(r"^\(\d+\) Scan parquet"),
        "ScanRDD": n(r"^\(\d+\) Scan ExistingRDD"),
        "Window": n(r"^\(\d+\) Window"),
        "Sort": n(r"^\(\d+\) Sort"),
    }


_EXPENSIVE_FILTER = re.compile(
    r"(md5|xxhash64)\([^)]*transform\(|transform\([^)]*(md5|xxhash64)\("
)


def _filter_recompute(txt: str) -> list[str]:
    hits = []
    for m in re.finditer(r"^\(\d+\) Filter\n(.*?)(?=^\(\d+\) )", txt, re.M | re.S):
        body = m.group(1)
        cond = ""
        for line in body.splitlines():
            if line.startswith("Condition"):
                cond = line
        if _EXPENSIVE_FILTER.search(cond) or cond.count("regexp_replace(") >= 3:
            hits.append(cond[:120])
    return hits


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from data_pipeline_mlops_spark.registry import QUERIES
    from data_pipeline_mlops_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    flagged: list[str] = []
    for name, spec in sorted(QUERIES.items()):
        try:
            df = spec.spark(spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001 - audit must finish
            out[name] = {"error": str(ex)[:200]}
            flagged.append(f"{name}: ERROR {str(ex)[:80]}")
            continue
        d = _shape(txt)
        fr = _filter_recompute(txt)
        if fr:
            d["filter_recompute"] = fr
        out[name] = d
        notes = []
        if d["Cartesian"]:
            notes.append(f"Cartesian={d['Cartesian']}")
        if d["PyEval"]:
            notes.append(f"PyEval={d['PyEval']}")
        if fr:
            notes.append(f"filter_recompute={len(fr)}")
        if notes:
            flagged.append(f"{name}: {' '.join(notes)}")

    for line in flagged:
        print(f"# {line}", file=sys.stderr)
    print(
        f"# audited {len(out)} queries, {len(flagged)} flagged",
        file=sys.stderr,
    )
    payload = {"sf": args.sf, "queries": out}
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(payload, fh, indent=1)
    else:
        json.dump(payload, sys.stdout)


if __name__ == "__main__":
    main()
