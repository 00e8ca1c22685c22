"""Silver-layer cleaning rules (SURVEY.md §2.3 P2-P6).

The reference cleans its denormalized orders fact with four row rules
plus a derived-total repair (reference dags/daily_pipeline.py:111-117):
drop null ids, drop non-positive quantities, abs() negative prices, drop
null/empty status, recompute total = price * quantity. Here the rules
are a parameterized operator over any fact table — expressed with
built-in column expressions only, so every predicate reaches the parquet
scan as a pushed filter and the whole chain stays in one
WholeStageCodegen span.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> Column:
    return F.col(col).isNotNull()


def positive(col: str) -> Column:
    return F.col(col) > 0


def non_empty_string(col: str) -> Column:
    return F.col(col).isNotNull() & (F.col(col) != "")


def clean_fact(
    df: DataFrame,
    *,
    id_col: str,
    qty_col: str,
    price_col: str,
    status_col: str | None = None,
    total_col: str = "gross_value",
    total_scale: int = 2,
) -> DataFrame:
    """Apply the P2-P6 rule chain and recompute the derived total.

    Returns the input frame with `price_col` repaired in place and a
    `total_col` column appended. Filters are plain Catalyst predicates
    (pushed down to the scan); no UDFs.
    """
    out = (
        df.where(not_null(id_col))  # P2
        .where(positive(qty_col))  # P3
        .withColumn(price_col, F.abs(F.col(price_col)))  # P4
    )
    if status_col is not None:  # P5
        out = out.where(non_empty_string(status_col))
    # P6: derived arithmetic column, deterministic double math
    out = out.withColumn(
        total_col, F.round(F.col(price_col) * F.col(qty_col), total_scale)
    )
    return out


def with_run_metadata(df: DataFrame, run_date: str | None = None) -> DataFrame:
    """Metadata columns (P10). The reference stamps wall-clock
    `_ingestion_timestamp`/`_execution_date` (dags/daily_pipeline.py:76-77);
    we make the run date injectable so golden tests stay deterministic
    (SURVEY.md §7 hard part 4)."""
    out = df.withColumn("_ingestion_timestamp", F.current_timestamp())
    if run_date is not None:
        out = out.withColumn("_execution_date", F.lit(run_date))
    return out


def split_clean(
    df: DataFrame,
    *,
    id_col: str,
    qty_col: str,
    price_col: str,
    status_col: str | None = None,
    total_col: str = "gross_value",
    total_scale: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Quarantine variant of :func:`clean_fact`: returns
    (clean, rejects). Rejects keep every original column plus a
    `reject_reasons` array naming each violated rule — the production
    upgrade of the reference's silent drops (rows are auditable and
    replayable after upstream fixes). One pass: the reason array is
    computed once and rows route by whether it is empty.
    """
    reasons = F.array_compact(
        F.array(
            F.when(~not_null(id_col), F.lit("null_id")),
            # NULL qty must reject too: ~(NULL > 0) is NULL, which
            # array_compact would silently drop — test the null branch
            F.when(
                F.col(qty_col).isNull() | ~positive(qty_col),
                F.lit("non_positive_quantity"),
            ),
            *(
                [F.when(~non_empty_string(status_col), F.lit("empty_status"))]
                if status_col is not None
                else []
            ),
        )
    )
    tagged = df.withColumn("reject_reasons", reasons)
    rejects = tagged.where(F.size("reject_reasons") > 0)
    clean = (
        tagged.where(F.size("reject_reasons") == 0)
        .drop("reject_reasons")
        .withColumn(price_col, F.abs(F.col(price_col)))
        .withColumn(
            total_col,
            F.round(F.col(price_col) * F.col(qty_col), total_scale),
        )
    )
    return clean, rejects
