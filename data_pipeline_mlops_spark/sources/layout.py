"""Physical file-layout operators: range-sorted writes (data skipping)
and small-file compaction.

At 100 TB the dominant cost of most queries is the SCAN, and the scan
cost is set by file layout, not query code:

- **Range-sorted writes**: `repartitionByRange(key)` + in-partition
  sort before writing gives every parquet file a narrow, disjoint
  min/max range on the key. A pushed-down point/range predicate then
  skips whole files/row-groups from the FOOTER alone — the poor
  man's z-order, and the single biggest lever for selective queries.
  (The keyed variant of what Delta's OPTIMIZE ZORDER does; one sort
  shuffle at write time, amortized over every later read.)

- **Compaction**: streaming/incremental sinks accumulate small files;
  every one costs a footer read + task schedule on EVERY query.
  `compact_partition` rewrites a partition directory to
  size-targeted files. Rewrite is atomic-enough for parquet-on-dir
  semantics: write to a temp dir, swap. (True transactional swap
  needs a table format — documented limit, same stance as
  streaming/upsert_sink.)

Reference: the reference repo writes unsorted single-shot parquet
(`dags/daily_pipeline.py` batch writes); layout management is part of
the at-scale extension surface.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_range_sorted(
    df: DataFrame,
    *,
    path: str,
    sort_col: str,
    num_files: int,
    mode: str = "overwrite",
) -> None:
    """Write `df` as `num_files` parquet files with disjoint
    `sort_col` ranges (range-partitioned, sorted within each file)."""
    (
        df.repartitionByRange(num_files, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .parquet(path)
    )


def compact_partition(
    spark: SparkSession,
    *,
    path: str,
    target_rows_per_file: int,
    sort_col: str | None = None,
) -> int:
    """Rewrite the parquet directory at `path` into
    ceil(rows / target_rows_per_file) files; returns the new file
    count. Optionally range-sorts by `sort_col` while rewriting (free
    data-skipping from a rewrite you were doing anyway)."""
    # Crash recovery: a crash BETWEEN the two renames below leaves the
    # live path missing with the data parked in the __compacting_old
    # aside — restore it before reading, or every subsequent run would
    # fail at the scan and recovery would be manual.
    old = path.rstrip("/") + "__compacting_old"
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    tmp = path.rstrip("/") + "__compacting"
    if sort_col is not None:
        write_range_sorted(
            df, path=tmp, sort_col=sort_col, num_files=n_files
        )
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    # Swap via rename-aside, not rmtree-then-rename: a crash mid-swap
    # leaves BOTH copies on disk (old aside, new in tmp) instead of a
    # window where the live path is simply gone. Both renames are
    # same-directory metadata ops (tmp/old are siblings of path), so
    # no cross-filesystem rename and the no-data window shrinks to the
    # instant between the two renames (recovered on the next run by the
    # entry check above). True transactional swap with concurrent
    # readers is compact_table below, over sources/txn.py's manifest
    # commit.
    if os.path.exists(old):
        shutil.rmtree(old)  # leftover from a previous crashed swap
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files


def compact_table(
    table,
    spark: SparkSession,
    *,
    target_rows_per_file: int,
    sort_col: str | None = None,
    partition_col: str | None = None,
) -> int:
    """Transactional compaction over a
    :class:`~data_pipeline_mlops_spark.sources.txn.ManifestTable`:
    rewrite the snapshot into size-targeted (optionally range-sorted)
    files and commit them as a new version. Concurrent readers keep
    the old snapshot — its files stay on disk until ``vacuum`` — so
    there is no swap window at all, unlike :func:`compact_partition`'s
    rename dance. Returns the committed version."""
    df = table.read(spark)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    if sort_col is not None:
        df = df.repartitionByRange(
            n_files, F.col(sort_col)
        ).sortWithinPartitions(sort_col)
    else:
        df = df.repartition(n_files)
    return table.commit(df, partition_col=partition_col, mode="replace_all")


def compact_if_fragmented(
    table,
    spark: SparkSession,
    *,
    max_txn_dirs: int = 16,
    target_rows_per_file: int,
    sort_col: str | None = None,
    partition_col: str | None = None,
) -> int | None:
    """Auto-compaction heuristic for ManifestTables: every committed
    upsert batch adds one staging dir, and the read path unions one
    scan per dir — after hundreds of micro-batches the snapshot is
    wide and slow. Call this from a maintenance cadence (or every N
    foreachBatch commits): when the latest snapshot references more
    than ``max_txn_dirs`` staging dirs, rewrite it via
    :func:`compact_table`. Returns the committed version, or None when
    no compaction was needed. The same background-OPTIMIZE shape Delta
    runs; readers are never blocked (snapshot isolation)."""
    if table.fragmentation() <= max_txn_dirs:
        return None
    return compact_table(
        table,
        spark,
        target_rows_per_file=target_rows_per_file,
        sort_col=sort_col,
        partition_col=partition_col,
    )


def _spread_bits_16(c):
    """Interleave-ready bit spread: 16-bit int -> 32-bit with a zero
    between every bit (classic magic-number spread, pure Catalyst
    integer ops — stays in whole-stage codegen)."""
    x = c.cast("long")
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_key(col_a, col_b, *, min_a, max_a, min_b, max_b) -> F.Column:
    """Morton (z-order) key for two numeric columns: each value is
    normalized to a 16-bit grid over its [min, max] range, bits are
    spread and interleaved. Locality in the key preserves locality in
    BOTH dimensions, so files cut from a z-sorted layout carry narrow
    min/max footer ranges on EITHER column — multi-column data
    skipping from one sort, the property Delta's OPTIMIZE ZORDER
    sells. Pure expressions; ranges are caller-supplied scalars (one
    tiny agg, amortized over the write)."""
    def norm(c, lo, hi):
        span = float(hi - lo) or 1.0
        q = (c.cast("double") - F.lit(float(lo))) / F.lit(span)
        return F.least(
            F.greatest(F.round(q * 65535).cast("long"), F.lit(0)),
            F.lit(65535),
        )

    return _spread_bits_16(norm(col_a, min_a, max_a)).bitwiseOR(
        F.shiftleft(_spread_bits_16(norm(col_b, min_b, max_b)), 1)
    )


def write_zordered(
    df: DataFrame,
    *,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int,
    mode: str = "overwrite",
) -> None:
    """Write `df` z-ordered on (col_a, col_b): range-partition +
    in-file sort by the Morton key, so every file covers a compact
    2-D tile and footer min/max prunes on EITHER column. The 2-D
    sibling of write_range_sorted (which optimizes exactly one
    column at the other's expense)."""
    stats = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    key = zorder_key(
        F.col(col_a), F.col(col_b),
        min_a=stats[0], max_a=stats[1], min_b=stats[2], max_b=stats[3],
    )
    (
        df.withColumn("__z", key)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
