"""Join-shaped operators (SURVEY.md §2.4 J1-J4).

The reference has zero explicit joins (its fact table is denormalized)
but four join-like semantics: semi-join membership restriction (J1,
reference dags/daily_pipeline.py:483-492), anti-join masking of
already-purchased items (J2, dags/daily_pipeline.py:519-520), set
intersection (J3), and dict-lookup label re-attachment (J4). Each maps
to a first-class Spark join type; small dimension sides are broadcast so
no shuffle of the fact side is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semi_join(fact: DataFrame, keys: DataFrame, on: list[str] | str) -> DataFrame:
    """J1: keep fact rows whose key exists in `keys` (EXISTS)."""
    return fact.join(keys, on=on, how="left_semi")


def anti_join(fact: DataFrame, keys: DataFrame, on: list[str] | str) -> DataFrame:
    """J2: keep fact rows whose key does NOT exist in `keys` (NOT EXISTS)."""
    return fact.join(keys, on=on, how="left_anti")


def lookup_join(
    fact: DataFrame, dim: DataFrame, on: list[str] | str
) -> DataFrame:
    """J4: re-attach labels from a small dimension — broadcast so the
    fact side never shuffles (the dict-lookup pattern at scale)."""
    return fact.join(F.broadcast(dim), on=on, how="inner")


def star_join(
    fact: DataFrame,
    dims: list[tuple[DataFrame, str, bool]],
) -> DataFrame:
    """Chain a fact table through (dim, key, broadcast?) triples.

    General star-schema support the reference only gets via Trino
    (SURVEY.md §2.4): broadcast tiny dims (region/nation), let
    AQE pick the strategy for large ones (customer at 100 TB).
    """
    out = fact
    for dim, key, use_broadcast in dims:
        right = F.broadcast(dim) if use_broadcast else dim
        out = out.join(right, on=key, how="inner")
    return out
