"""Plan diagnostics: programmatic answers to "will this survive
100 TB?" — the questions tests/test_plans.py asks ad hoc, exposed as
an API a pipeline can assert on before launching an expensive job.

This inspects the EXECUTED physical plan string (same source of truth
as `.explain("formatted")`), so it sees what will actually run —
after AQE re-planning where applicable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanSummary:
    n_exchanges: int          # shuffle boundaries (Exchange hashpartitioning/range)
    n_single_partition: int   # Exchange SinglePartition — scale red flags
    n_broadcast_joins: int
    n_sort_merge_joins: int
    n_file_scans: int
    pushed_filters: list[str]  # PushedFilters content per scan
    scanned_columns: list[list[str]]  # ReadSchema/column list per scan
    has_whole_stage_codegen: bool
    n_python_boundaries: int  # ArrowEvalPython / BatchEvalPython / MapInPandas

    def flags(self) -> list[str]:
        """Human-readable scale warnings. Empty list = clean."""
        out = []
        if self.n_single_partition:
            out.append(
                f"{self.n_single_partition} SinglePartition exchange(s): "
                "a global sort/window/limit funnels all data to one task "
                "— bounded inputs only"
            )
        if self.n_sort_merge_joins:
            out.append(
                f"{self.n_sort_merge_joins} SortMergeJoin(s): fine for "
                "fact-to-fact, but check whether a side is broadcastable "
                "or the join is bucketable"
            )
        if self.n_python_boundaries:
            out.append(
                f"{self.n_python_boundaries} Python boundary(ies): Arrow-"
                "batched is acceptable, row-at-a-time is not — verify"
            )
        n_unpushed = self.n_file_scans - len(
            [p for p in self.pushed_filters if p.strip()]
        )
        if n_unpushed > 0:
            out.append(
                f"{n_unpushed} scan(s) with no pushed filters — "
                "full-scan by design, or a pushdown break?"
            )
        return out


def plan_summary(df: DataFrame) -> PlanSummary:
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    # toString TRUNCATES long per-node field lists ("..."), which can
    # swallow PushedFilters entirely — scan details must come from the
    # formatted explain, which prints each scan's fields in full.
    jvm = df.sparkSession._jvm
    formatted = qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    scans = re.findall(r"ReadSchema: struct<([^\n]*)>", formatted)
    scans = [
        [c.split(":")[0] for c in s.split(",") if c.strip()] for s in scans
    ]
    pushed = re.findall(r"PushedFilters: \[([^\n]*?)\]", formatted)
    return PlanSummary(
        n_exchanges=len(
            re.findall(r"Exchange (?:hash|range)partitioning", plan)
        ),
        n_single_partition=plan.count("Exchange SinglePartition"),
        n_broadcast_joins=plan.count("BroadcastHashJoin"),
        n_sort_merge_joins=plan.count("SortMergeJoin"),
        n_file_scans=len(scans),
        pushed_filters=pushed,
        scanned_columns=scans,
        has_whole_stage_codegen=bool(re.search(r"\*\(\d+\)", plan)),
        n_python_boundaries=len(
            re.findall(
                r"ArrowEvalPython|BatchEvalPython|MapInPandas|"
                r"FlatMapGroupsInPandas",
                plan,
            )
        ),
    )


def scale_safe_twin(query_name: str) -> dict:
    """Answer "can I run this registry query at 100 TB?" from the
    registry's own scale labels: returns
    {"scale_safe": bool, "twin": str | None, "reason": str}.
    For a parity-only query the twin is the registered scale-safe
    formulation of the same semantics tier."""
    from data_pipeline_mlops_spark.registry import QUERIES

    spec = QUERIES[query_name]
    if spec.scale_safe:
        return {
            "scale_safe": True,
            "twin": None,
            "reason": "no data-dependent unbounded cost term",
        }
    return {
        "scale_safe": False,
        "twin": spec.scale_twin,
        "reason": (
            "parity-only formulation (unbounded fan-out / exhaustive "
            f"pass); run {spec.scale_twin!r} at scale"
        ),
    }


def assert_scale_clean(df: DataFrame, *, allow: set[str] = frozenset()) -> None:
    """Raise AssertionError with the flag list unless the plan is
    scale-clean. ``allow`` suppresses flags whose text contains any of
    the given substrings (e.g. {"SinglePartition"} for a bounded
    top-k)."""
    flags = [
        f
        for f in plan_summary(df).flags()
        if not any(a in f for a in allow)
    ]
    assert not flags, "plan has scale flags:\n- " + "\n- ".join(flags)
