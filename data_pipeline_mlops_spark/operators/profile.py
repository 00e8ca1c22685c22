"""One-pass column profiler: the `describe`-grade table health report
(row count, null count, exact distincts, min/max) in LONG format —
one row per column — computed in a SINGLE aggregation pass over the
table.

Scale notes: k exact count-distincts in one aggregate compile to an
Expand (k× row multiplication before partial aggregation) — fine for
a profile run, but at 100 TB swap ``exact_distinct=False`` to use
approx_count_distinct (HLL++, no Expand) for the distinct column;
everything else stays one scan. min/max are emitted as strings so one
schema fits every column type; keep float columns out of profiles
that cross engines (float-to-string formatting differs — the same
trap as the registry's determinism rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame, cols: list[str], *, exact_distinct: bool = True
) -> DataFrame:
    aggs = [F.count(F.lit(1)).cast("long").alias("__total")]
    for c in cols:
        aggs.append(F.count(c).cast("long").alias(f"__n_{c}"))
        d = (
            F.countDistinct(c)
            if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs.append(d.cast("long").alias(f"__d_{c}"))
        aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args.extend(
            [
                f"'{c}'",
                f"__n_{c}",
                f"__d_{c}",
                f"__min_{c}",
                f"__max_{c}",
            ]
        )
    stacked = wide.select(
        "__total",
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(column_name, n_non_null, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column_name",
        F.col("__total").alias("n_rows"),
        "n_non_null",
        (F.col("__total") - F.col("n_non_null")).cast("long").alias(
            "n_null"
        ),
        "n_distinct",
        "min_value",
        "max_value",
    )
