"""JSONL corpus ingest: schema enforcement, malformed-line audit,
round-trip with compression."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F

from data_pipeline_mlops_spark.sources.jsonl import (
    DOCUMENT_SCHEMA,
    read_jsonl,
    write_jsonl,
)

GOOD = [
    {"doc_id": 1, "text": "hello world", "lang": "en",
     "source": "s0", "n_chars": 11},
    {"doc_id": 2, "text": "bonjour", "lang": "fr",
     "source": "s1", "n_chars": 7},
]
MISSING_FIELD = {"doc_id": 3, "text": "no lang"}  # nulls, NOT corrupt
BROKEN = ['{"doc_id": 4, "text": unquoted}', "not json at all"]


def _write_corpus(tmp_path):
    p = tmp_path / "corpus.jsonl"
    lines = [json.dumps(g) for g in GOOD] + [
        json.dumps(MISSING_FIELD)
    ] + BROKEN
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_clean_and_audit_split(spark, tmp_path):
    clean, audit = read_jsonl(
        spark, _write_corpus(tmp_path), DOCUMENT_SCHEMA
    )
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["text"] == "hello world"
    assert rows[3]["lang"] is None  # missing field is data, not corruption
    bad = sorted(r["raw_line"] for r in audit.collect())
    assert bad == sorted(BROKEN)
    assert clean.columns == [f.name for f in DOCUMENT_SCHEMA.fields]


def test_gzip_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(GOOD, DOCUMENT_SCHEMA)
    out = str(tmp_path / "out")
    write_jsonl(src.repartition(2), out, compression="gzip")
    clean, audit = read_jsonl(spark, out, DOCUMENT_SCHEMA)
    assert audit.isEmpty()
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]


def test_gzipped_input_readable(spark, tmp_path):
    p = tmp_path / "part.jsonl.gz"
    with gzip.open(p, "wt") as f:
        for g in GOOD:
            f.write(json.dumps(g) + "\n")
    clean, audit = read_jsonl(spark, str(tmp_path), DOCUMENT_SCHEMA)
    assert audit.isEmpty()
    assert clean.count() == 2
    assert clean.where(F.col("lang") == "en").count() == 1
