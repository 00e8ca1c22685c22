"""Fuzzy entity matching: blocked edit-distance self-join.

Record linkage / entity resolution needs "names within edit distance
d of each other" without the all-pairs O(N^2) comparison. The
standard scale shape (Fellegi-Sunter style blocking) is:

1. dedupe to DISTINCT names first (groupBy name, keep a row count) —
   at corpus scale the distinct-name relation is orders of magnitude
   smaller than the row relation;
2. derive a cheap blocking key (here: a token of the name; in
   general a phonetic code, prefix, or q-gram) and equi-join on it —
   candidate volume is sum(|block|^2) instead of |N|^2;
3. run the expensive `levenshtein` verifier only inside blocks, with
   a `name_a < name_b` canonical ordering so each pair appears once.

Everything is built-in Catalyst expressions (`F.levenshtein` is
JVM-side); the only shuffle is the equi-join on the block key.

The reference repo has no fuzzy-match stage (its keys are exact
integers); this is a north-star training-data/entity-resolution
operator per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    names: DataFrame,
    name_col: str,
    block: Column,
    *,
    max_dist: int,
    carry: list[str] | None = None,
) -> DataFrame:
    """Candidate fuzzy-duplicate pairs among DISTINCT names.

    `names` must have one row per distinct name (pre-aggregated);
    `carry` columns are duplicated onto both sides with `_a`/`_b`
    suffixes. Output: (name_a, name_b, dist, <carry_a...>,
    <carry_b...>), each unordered pair exactly once.
    """
    carry = carry or []
    keyed = names.withColumn("__block", block)
    a = keyed.select(
        F.col(name_col).alias("name_a"),
        "__block",
        *[F.col(c).alias(f"{c}_a") for c in carry],
    )
    b = keyed.select(
        F.col(name_col).alias("name_b"),
        "__block",
        *[F.col(c).alias(f"{c}_b") for c in carry],
    )
    return (
        a.join(b, "__block")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "dist", F.levenshtein("name_a", "name_b").cast("long")
        )
        .where(F.col("dist") <= max_dist)
        .drop("__block")
    )
