"""Local replica of the driver's Spark-vs-DuckDB compare: row count +
schema-width + order-insensitive value hash, columns sorted by name.

Used by tests/test_oracle_parity.py so oracle drift is caught at
sf0.001/sf0.01 locally before the driver's verify runs.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, con, oracle_sql: str, *, pre_oracle=None) -> dict:
    """Side-by-side Spark vs DuckDB check. ``pre_oracle`` (optional)
    is invoked after the Spark collect and immediately before the
    DuckDB replay — the hook oracle_sweep uses to arm its
    oracle-timeout timer around the DuckDB leg ONLY (ADVICE r11: a
    timer spanning both legs mislabeled slow Spark collects as
    oracle_timeout and could interrupt an idle connection)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    if pre_oracle is not None:
        pre_oracle()
    rel = con.execute(oracle_sql)
    o_cols = [d[0] for d in rel.description]
    o_rows = rel.fetchall()
    result = {
        "spark_rows": len(s_rows),
        "oracle_rows": len(o_rows),
        "spark_cols": sorted(s_cols),
        "oracle_cols": sorted(o_cols),
        "rows_match": len(s_rows) == len(o_rows),
        "cols_match": sorted(s_cols) == sorted(o_cols),
        "values_match": False,
    }
    if result["rows_match"] and result["cols_match"]:
        result["values_match"] = canonical_rows(s_cols, s_rows) == (
            canonical_rows(o_cols, o_rows)
        )
        if not result["values_match"]:
            a = canonical_rows(s_cols, s_rows)
            b = canonical_rows(o_cols, o_rows)
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            result["first_diffs"] = diffs
    return result
