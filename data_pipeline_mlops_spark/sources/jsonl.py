"""JSON-lines corpus ingest: schema-enforced reads of the interchange
format LLM training corpora actually ship in (one JSON doc per line,
optionally gzip'd), with malformed-line auditing instead of silent
drops.

Reads are PERMISSIVE with an explicit corrupt-record column: a 100 TB
crawl dump always contains broken lines, and the two failure modes to
avoid are (a) failing the whole job on line 40 billion and (b)
silently losing rows. Every read therefore yields (clean_df,
audit_df) where the audit carries the raw offending line — the same
contract as the CDC parser's malformed-JSON handling
(streaming/alert_stream.py::parse_cdc_json, tested by
test_malformed_json_rows_become_nulls_not_errors).

Scale notes: gzip is NOT splittable — one .jsonl.gz = one task, so
corpora should ship as many medium files (the layout
write_training_shards produces); Spark parallelizes across files.
Schema is REQUIRED: schema inference reads the data twice and types
drift per-file; a declared schema keeps the scan single-pass and the
plan stable. Reference: the reference ingests via pandas read_sql /
Kafka JSON (dags/daily_pipeline.py, flink-jobs/*); jsonl is the
corpus-side equivalent surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "__corrupt_record"

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    multiline: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines with the given schema; returns
    ``(clean, audit)``.

    ``clean`` has exactly the schema's columns, only rows that parsed
    and type-checked. ``audit`` has (raw_line,) for every malformed
    row — count it, sample it, alert on its rate; never lose it.
    A row missing a field parses with nulls (that is a DATA question
    for the quality tier, not a parse failure).
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("multiLine", multiline)
        .json(path)
    )
    # Spark leaves non-corrupt columns null when _CORRUPT is set; a
    # cached frame is required before filtering on the corrupt column
    # per Spark's own FAQ (it refuses the raw filter otherwise).
    raw = raw.cache()
    clean = raw.where(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    audit = raw.where(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    return clean, audit


def write_jsonl(df: DataFrame, path: str, *, compression: str | None = None):
    """Write a corpus as JSON-lines (optionally gzip per file). File
    count follows the DataFrame's partitioning — pair with
    repartition()/write_training_shards for the many-medium-files
    layout gzip needs to stay parallel-readable."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
