"""Declarative data-quality expectation suites (Deequ-style).

The reference pipeline hand-rolls its DQ as ad-hoc conditional counts
(dags/daily_pipeline.py quality gate; see registry `data_quality`).
This generalizes that into a declarative suite a pipeline can assert
on: each expectation is named, evaluated over the whole table, and
reported as one row (constraint_name, total, violations, passed).

Scale shape:
- ALL row-level expectations share ONE aggregation pass over the
  table (conditional sums — map-side partials, no extra scans);
- a uniqueness expectation adds one count-distinct aggregate over its
  key (the unavoidable shuffle);
- a referential expectation adds one left_anti probe against the
  dimension (broadcast when the dimension is small).
The result is a handful of 1-row frames unioned lazily — nothing is
collected; callers can write the report or gate on it.

Null semantics: a row violates a predicate expectation when the
predicate is NOT TRUE (NULL counts as a violation), matching SQL
`pred IS NOT TRUE`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RowCheck:
    name: str
    predicate: Column  # TRUE == row is OK


@dataclass(frozen=True)
class UniqueCheck:
    name: str
    cols: list[str] = field(default_factory=list)


@dataclass(frozen=True)
class RefCheck:
    name: str
    fk: str
    dim: DataFrame
    pk: str
    broadcast_dim: bool = True


def run_expectations(
    df: DataFrame,
    row_checks: list[RowCheck] = (),
    unique_checks: list[UniqueCheck] = (),
    ref_checks: list[RefCheck] = (),
) -> DataFrame:
    """Evaluate a suite; returns (constraint_name, total, violations,
    passed) with one row per expectation."""
    spark = df.sparkSession
    reports: list[DataFrame] = []

    total = F.count(F.lit(1)).cast("long").alias("total")
    if row_checks:
        aggs = [total] + [
            F.sum(F.when(c.predicate, 0).otherwise(1))
            .cast("long")
            .alias(f"__v{i}")
            for i, c in enumerate(row_checks)
        ]
        wide = df.agg(*aggs)
        for i, c in enumerate(row_checks):
            reports.append(
                wide.select(
                    F.lit(c.name).alias("constraint_name"),
                    "total",
                    F.col(f"__v{i}").alias("violations"),
                    (F.col(f"__v{i}") == 0).alias("passed"),
                )
            )

    for c in unique_checks:
        rep = df.agg(
            total,
            (
                F.count(F.lit(1))
                - F.count_distinct(F.struct(*[F.col(x) for x in c.cols]))
            )
            .cast("long")
            .alias("violations"),
        )
        reports.append(
            rep.select(
                F.lit(c.name).alias("constraint_name"),
                "total",
                "violations",
                (F.col("violations") == 0).alias("passed"),
            )
        )

    for c in ref_checks:
        dim = c.dim.select(c.pk).distinct()
        if c.broadcast_dim:
            dim = F.broadcast(dim)
        orphans = (
            df.where(F.col(c.fk).isNotNull())
            .join(dim, F.col(c.fk) == F.col(c.pk), "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        )
        totals = df.agg(total)
        reports.append(
            totals.crossJoin(orphans).select(
                F.lit(c.name).alias("constraint_name"),
                "total",
                "violations",
                (F.col("violations") == 0).alias("passed"),
            )
        )

    if not reports:
        return spark.createDataFrame(
            [],
            "constraint_name string, total long, violations long, "
            "passed boolean",
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
