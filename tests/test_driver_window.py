"""The external driver value-hashes exactly the FIRST 50 entries of
queries() — a typo in _DRIVER_WINDOW would silently shrink the window
and the driver would hash whatever registration order happens to
follow. Pin the invariants."""

from __future__ import annotations


def test_driver_window_is_50_valid_unique_oracled():
    from data_pipeline_mlops_spark.registry import (
        _DRIVER_WINDOW,
        QUERIES,
        _ordered_names,
    )

    assert len(_DRIVER_WINDOW) == 50
    assert len(set(_DRIVER_WINDOW)) == 50
    missing = [n for n in _DRIVER_WINDOW if n not in QUERIES]
    assert not missing, missing
    # every driver-hashed query must carry a DuckDB oracle (rows-only
    # fallback is for genuinely non-SQL-expressible ops, none of which
    # belong in the hash window)
    unoracled = [n for n in _DRIVER_WINDOW if QUERIES[n].oracle is None]
    assert not unoracled, unoracled
    assert _ordered_names()[:50] == _DRIVER_WINDOW


def test_readme_registry_counts_match_live():
    """README's registry row states the query/oracle counts; pin them
    to the live registry so they can't silently drift (VERDICT r11 #8)."""
    import pathlib
    import re

    from data_pipeline_mlops_spark.registry import QUERIES

    readme = (
        pathlib.Path(__file__).resolve().parents[1] / "README.md"
    ).read_text()
    m = re.search(
        r"(\d+) testdata-bound queries, (\d+) with a DuckDB oracle", readme
    )
    assert m, "README registry row not found"
    assert int(m.group(1)) == len(QUERIES)
    assert int(m.group(2)) == sum(
        1 for q in QUERIES.values() if q.oracle is not None
    )
