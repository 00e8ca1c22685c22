"""CSV ingest (sources/csvsrc.py): clean/audit split, type-mismatch
auditing, round-trip, gzip."""

from __future__ import annotations

from pyspark.sql import types as T

from data_pipeline_mlops_spark.sources.csvsrc import read_csv, write_csv

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_clean_and_audit_split(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,score\n"
        "1,alice,0.5\n"
        "not_a_number,bob,0.1\n"   # type mismatch -> audit
        "3,carol,oops\n"           # type mismatch -> audit
        "4,dave,0.9\n"
    )
    clean, audit = read_csv(spark, str(p), SCHEMA)
    assert {r.id for r in clean.collect()} == {1, 4}
    raw = [r.raw_line for r in audit.collect()]
    assert len(raw) == 2
    assert any("bob" in line for line in raw)
    assert any("oops" in line for line in raw)


def test_ragged_row_is_audited_not_dropped(spark, tmp_path):
    """CSV cannot distinguish a missing trailing field from a
    truncated record, so ragged rows go to the audit (the jsonl twin
    nulls missing fields instead — that asymmetry is the formats',
    not ours)."""
    p = tmp_path / "short.csv"
    p.write_text("id,name,score\n7,grace\n8,henry,0.7\n")
    clean, audit = read_csv(spark, str(p), SCHEMA)
    assert [r.id for r in clean.collect()] == [8]
    assert [r.raw_line for r in audit.collect()] == ["7,grace"]


def test_round_trip_gzip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 0.5), (2, "b", 1.5)], schema=SCHEMA
    )
    out = str(tmp_path / "out")
    write_csv(df, out, compression="gzip")
    clean, audit = read_csv(spark, out, SCHEMA)
    assert audit.count() == 0
    assert {(r.id, r.name, r.score) for r in clean.collect()} == {
        (1, "a", 0.5),
        (2, "b", 1.5),
    }
