"""Set operations (SURVEY.md §2.8 U1-U2).

U1 is the reference's eval-set accumulation concat
(dags/daily_pipeline.py:264); U2 the precision intersection
(dags/daily_pipeline.py:527). `unionByName` is position-independent
(schema evolution safe); `intersect` compiles to a distinct + hash
semi-join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_all(frames: list[DataFrame]) -> DataFrame:
    """U1: UNION ALL by column name across any number of frames."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=False), frames
    )


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    """U2: set intersection (deduplicated)."""
    return a.intersect(b)
