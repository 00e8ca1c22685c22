"""Every oracled registry query must hash-match DuckDB at sf0.001 —
the same gate the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle_compare import compare, duckdb_conn


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_SMALL)
    yield c
    c.close()


def _oracle_items():
    from data_pipeline_mlops_spark.registry import QUERIES

    return [
        (name, spec) for name, spec in QUERIES.items() if spec.oracle
    ]


@pytest.mark.oracle_sweep
@pytest.mark.parametrize(
    "name,spec", _oracle_items(), ids=[n for n, _ in _oracle_items()]
)
def test_oracle_parity(spark, con, name, spec):
    result = compare(spec.spark(spark, SF_SMALL), con, spec.oracle)
    assert result["cols_match"], result
    assert result["rows_match"], result
    assert result["values_match"], result


@pytest.mark.oracle_sweep
def test_rows_only_queries_run(spark):
    from data_pipeline_mlops_spark.registry import QUERIES

    for name, spec in QUERIES.items():
        if spec.oracle is None:
            n = spec.spark(spark, SF_SMALL).count()
            assert n >= 0, name
