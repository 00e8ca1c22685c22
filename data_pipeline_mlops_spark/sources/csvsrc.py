"""CSV ingest with malformed-row auditing — the tabular twin of
sources/jsonl.py (same (clean, audit) contract, same
never-drop-never-fail posture).

CSV is the interchange format metadata sidecars and labeling exports
actually arrive in. The failure modes mirror jsonl: a bad quote or
ragged row 40 billion lines in must neither kill the job nor vanish.
Reads are schema-REQUIRED (inference double-scans and drifts
per-file) and PERMISSIVE with an explicit corrupt-record column.

Scale notes: uncompressed CSV is splittable (Spark splits on
newlines), gzip'd CSV is one-task-per-file like jsonl — ship many
medium files. multiLine (quoted newlines) disables splitting; leave
it off unless the data truly embeds newlines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "__corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read CSV with the given schema; returns ``(clean, audit)``.

    ``clean`` carries only rows that parsed and type-checked against
    the schema; ``audit`` carries the raw text of every malformed row.
    Unlike jsonl (where a missing field is a null, a DATA question),
    CSV cannot distinguish a missing trailing field from a truncated
    record, so ragged rows land in the audit alongside type
    mismatches and broken quoting — the audit is the place to decide
    whether to re-parse them leniently.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", header)
        .option("sep", sep)
        .csv(path)
    )
    raw = raw.cache()  # required before filtering the corrupt column
    clean = raw.where(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    audit = raw.where(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    return clean, audit


def write_csv(
    df: DataFrame,
    path: str,
    *,
    header: bool = True,
    compression: str | None = None,
) -> None:
    """Write CSV; file count follows the DataFrame's partitioning."""
    w = df.write.mode("overwrite").option("header", header)
    if compression:
        w = w.option("compression", compression)
    w.csv(path)
