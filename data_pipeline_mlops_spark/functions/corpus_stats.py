"""Driver-side corpus scalars.

The ONLY driver action here is a COUNT(*) — a 1-row scalar an operator
needs at PLAN-BUILD time (e.g. the corpus-scaled LSH knob derives
num_planes from corpus size before the bucket expressions can be
constructed). Kept in its own module so tests/test_no_driver_loops.py
can allowlist exactly this surface instead of a query-builder file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def corpus_size(df: DataFrame) -> int:
    """COUNT(*) of ``df`` as a plan-build-time scalar. One cheap count
    job (column-pruned to metadata/first column by Catalyst); the
    DuckDB oracles recompute the same COUNT(*) inside SQL, so any
    parameter derived from this stays inside the correctness gate."""
    return df.count()
