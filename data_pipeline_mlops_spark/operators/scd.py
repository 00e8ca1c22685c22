"""SCD Type-2 dimension maintenance (slowly changing dimensions).

Given the current dimension state (history rows + one current row per
key) and an update snapshot, produce the new state: changed keys get
their current row closed (valid_to = effective date) plus a fresh
current row; new keys insert; untouched keys pass through byte-
identical. The warehouse primitive behind "what did this customer look
like when the order shipped" point-in-time joins (compose with
operators/asof.py on valid_from).

Scale shape: change detection is one join of CURRENT rows to the
update snapshot on the key (history never joins anything); the output
is a union of disjoint slices of the two inputs. No window functions,
no driver state — at 100 TB the cost is one shuffle of the current
slice + the snapshot.

Change detection is null-safe (`eqNullSafe`): NULL -> value and
value -> NULL both count as changes; NULL -> NULL does not.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    *,
    key: str,
    tracked: list[str],
    effective_date: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Return the post-merge SCD2 table. ``dim`` must carry
    (key, *tracked, from_col, to_col, current_col); ``updates`` carries
    (key, *tracked) — one row per key."""
    eff = F.to_date(F.lit(effective_date))
    cur = dim.where(F.col(current_col))
    hist = dim.where(~F.col(current_col))

    upd = updates.select(
        F.col(key),
        *[F.col(c).alias(f"__u_{c}") for c in tracked],
    )
    with_upd = cur.join(upd, key, "inner")
    differs = reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.col(f"__u_{c}")) for c in tracked],
    )
    changed_keys = with_upd.where(differs).select(key)

    closed = (
        cur.join(changed_keys, key, "left_semi")
        .withColumn(to_col, eff)
        .withColumn(current_col, F.lit(False))
    )
    untouched = cur.join(changed_keys, key, "left_anti")
    fresh_keys_new = updates.join(cur, key, "left_anti").select(key)
    opening_keys = changed_keys.union(fresh_keys_new)
    opened = (
        updates.join(opening_keys, key, "left_semi")
        .select(key, *tracked)
        .withColumn(from_col, eff)
        .withColumn(to_col, F.lit(None).cast("date"))
        .withColumn(current_col, F.lit(True))
    )
    cols = [key, *tracked, from_col, to_col, current_col]
    return (
        hist.select(*cols)
        .unionByName(untouched.select(*cols))
        .unionByName(closed.select(*cols))
        .unionByName(opened.select(*cols))
    )
