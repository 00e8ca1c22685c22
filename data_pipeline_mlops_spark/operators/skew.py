"""Skew-mitigation helpers for hot keys.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
on in session.py) which splits oversized shuffle partitions at runtime.
These helpers cover the cases AQE can't: a groupBy whose single hot key
overwhelms one reducer, and a broadcast-infeasible join against a
skewed fact. Both use deterministic salts (hash of row content, not
rand()) so retried tasks produce identical output — required for
exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, Column],
    *,
    n_salts: int = 32,
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation: partial per (key, salt), final per key.

    Works for any associative aggregate expressed as SUM/COUNT (the
    decimal-routed money sums in operators/exact compose fine). The
    salt derives from `salt_source` columns (default: all non-key
    columns) so it is deterministic under retries.
    """
    src = salt_source or [c for c in df.columns if c not in keys]
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in src]), n_salts)
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr in sums.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"__p_{name}").alias(name) for name in sums]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Replicate-and-salt join: the small side is replicated n_salts
    times, the skewed side salts each row deterministically, and the
    join key becomes (key, salt) — spreading a hot key over n_salts
    reducers. Use when the small side is too big to broadcast whole but
    n_salts copies still fit the shuffle."""
    src = salt_source or [c for c in skewed.columns if c != on]
    left = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in src]), n_salts)
    )
    right = small.crossJoin(
        F.broadcast(
            left.sparkSession.range(n_salts).select(
                F.col("id").cast("long").alias("__salt")
            )
        )
    )
    out = left.join(right, [on, "__salt"], "inner").drop("__salt")
    return out
