"""File-layout operator tests: range-sorted writes produce disjoint
per-file key ranges (the data-skipping contract, verified from the
parquet footers themselves), and compaction hits its file-count
target without losing rows."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _file_ranges(path: str, col: str) -> list[tuple]:
    """(min, max) of `col` per parquet file, read from footer stats."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def test_range_sorted_write_gives_disjoint_file_ranges(spark, tmp_path):
    from data_pipeline_mlops_spark.sources.layout import write_range_sorted

    path = str(tmp_path / "sorted")
    df = spark.range(10_000).select(
        F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("k"),
        F.col("id").alias("v"),
    )
    write_range_sorted(df, path=path, sort_col="k", num_files=8)

    ranges = _file_ranges(path, "k")
    assert len(ranges) == 8
    for (lo, hi) in ranges:
        assert lo <= hi
    ordered = sorted(ranges)
    for (_, prev_hi), (next_lo, _) in zip(ordered, ordered[1:]):
        assert prev_hi <= next_lo  # disjoint: a point predicate
        # overlaps at most one file's footer range -> file skipping
    # a point-read only intersects one file's range
    probe = ordered[3][0]
    assert sum(1 for lo, hi in ordered if lo <= probe <= hi) <= 2
    # and the data survived intact
    assert spark.read.parquet(path).count() == 10_000


def test_compact_partition_reduces_file_count(spark, tmp_path):
    from data_pipeline_mlops_spark.sources.layout import compact_partition

    path = str(tmp_path / "frag")
    df = spark.range(5_000).select("id", (F.col("id") % 7).alias("g"))
    df.repartition(64).write.parquet(path)  # simulate streaming debris
    assert len(glob.glob(f"{path}/*.parquet")) == 64

    n_files = compact_partition(
        spark, path=path, target_rows_per_file=1_000, sort_col="id"
    )
    assert n_files == 5
    assert len(glob.glob(f"{path}/*.parquet")) == 5
    got = spark.read.parquet(path)
    assert got.count() == 5_000
    assert got.agg(F.sum("id")).collect()[0][0] == 5_000 * 4_999 // 2
    # the rewrite also left disjoint ranges (free data skipping)
    ordered = sorted(_file_ranges(path, "id"))
    for (_, prev_hi), (next_lo, _) in zip(ordered, ordered[1:]):
        assert prev_hi <= next_lo


def test_compact_partition_leaves_no_swap_debris(spark, tmp_path):
    """The rename-aside swap must clean up both the __compacting tmp
    dir and the __compacting_old aside dir, and must tolerate a stale
    aside dir left by a previously crashed swap."""
    import os

    from data_pipeline_mlops_spark.sources.layout import compact_partition

    path = str(tmp_path / "frag")
    spark.range(2_000).write.parquet(path)
    # simulate debris from a previous crash mid-swap
    os.makedirs(path + "__compacting_old/junk")

    compact_partition(spark, path=path, target_rows_per_file=1_000)
    assert not os.path.exists(path + "__compacting")
    assert not os.path.exists(path + "__compacting_old")
    assert spark.read.parquet(path).count() == 2_000


def test_compact_partition_recovers_missing_path_from_aside(spark, tmp_path):
    """Crash window between the two swap renames: live path gone, data
    parked in __compacting_old. The next compaction run must restore
    the aside and proceed instead of dying at the scan."""
    import os

    from data_pipeline_mlops_spark.sources.layout import compact_partition

    path = str(tmp_path / "tbl")
    spark.range(100).write.parquet(path)
    os.rename(path, path + "__compacting_old")  # simulate mid-swap crash
    assert not os.path.exists(path)
    compact_partition(spark, path=path, target_rows_per_file=1_000)
    assert spark.read.parquet(path).count() == 100
    assert not os.path.exists(path + "__compacting_old")


def test_zorder_write_skips_on_both_columns(spark, tmp_path):
    """Z-ordered files must carry narrow footer ranges on BOTH
    dimensions: a selective predicate on either column alone prunes a
    majority of files from min/max stats, where a 1-D range sort gives
    the second column nothing."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from data_pipeline_mlops_spark.sources.layout import (
        write_range_sorted,
        write_zordered,
    )

    # explicit numPartitions: the range partitioner's reservoir
    # sampling is seeded by input-partition INDEX, so pinning the
    # input split count makes the produced file layout deterministic
    # (r8 flake: a crowded JVM shifted the split count, moving one
    # boundary straddler across the assertion line)
    df = spark.range(0, 40_000, 1, 8).select(
        (F.col("id") % 1000).alias("a"),
        ((F.col("id") * 7919) % 1000).alias("b"),
    )
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    write_zordered(df, path=zpath, col_a="a", col_b="b", num_files=64)
    write_range_sorted(df, path=rpath, sort_col="a", num_files=64)

    def surviving(path, col, lo, hi):
        files = glob.glob(f"{path}/*.parquet")
        keep = 0
        for f in files:
            md = pq.read_metadata(f)
            fmin = min(
                md.row_group(i).column(
                    md.schema.names.index(col)
                ).statistics.min
                for i in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(i).column(
                    md.schema.names.index(col)
                ).statistics.max
                for i in range(md.num_row_groups)
            )
            if fmax >= lo and fmin <= hi:
                keep += 1
        return keep, len(files)

    # 10%-wide predicate on each column against the z-layout: a
    # 64-file z-curve is ~an 8x8 tile grid, so a 10%-wide slab in
    # either dimension intersects 1-2 of 8 tile rows (plus boundary
    # straddlers) — well under half the files. The bound carries
    # straddler slack (sampled range boundaries put the worst
    # observed layout at 26/64): the INVARIANT is "z prunes a
    # majority on BOTH columns where 1-D sort prunes only its own",
    # pinned exactly by the range-sort comparison below.
    for col in ("a", "b"):
        keep, n = surviving(zpath, col, 450, 550)
        assert n == 64
        assert keep <= int(0.45 * n), (col, keep, n)
    # the 1-D sort helps its own column but NOT the other
    keep_a, n = surviving(rpath, "a", 450, 550)
    assert keep_a <= 8
    keep_b, _ = surviving(rpath, "b", 450, 550)
    assert keep_b >= n - 2  # every file spans b's full range


def test_zorder_n_write_skips_on_three_columns(spark, tmp_path):
    """N-column z-order: a 64-file 3-D z-layout is ~a 4x4x4 tile grid,
    so a slab predicate on ANY one of the three columns must prune a
    majority of files from footer stats alone (a 1-D range sort gives
    the other two columns nothing — covered by the 2-D test above)."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from data_pipeline_mlops_spark.sources.layout import write_zordered

    # three INDEPENDENT uniform dims (seeded hashes — modular
    # multiples of one id would be functionally dependent and blur
    # the tile grid with correlated straddle)
    df = spark.range(60_000).select(
        *[
            F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(1000)).alias(name)
            for name, seed in (("a", 1), ("b", 2), ("c", 3))
        ]
    )
    zpath = str(tmp_path / "z3")
    # 512 files = 9 z-prefix bits = 3 bits (8 tile layers) per dim.
    # Range-partition cuts are sampled quantiles, so most files
    # straddle two adjacent z-prefixes — survivors ~ double the pure
    # tile share; 8 layers per dim leaves the margin decisive.
    write_zordered(df, path=zpath, cols=["a", "b", "c"], num_files=512)

    def surviving(col, lo, hi):
        files = glob.glob(f"{zpath}/*.parquet")
        keep = 0
        for f in files:
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col)
            fmin = min(
                md.row_group(i).column(idx).statistics.min
                for i in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(i).column(idx).statistics.max
                for i in range(md.num_row_groups)
            )
            if fmax >= lo and fmin <= hi:
                keep += 1
        return keep, len(files)

    # ~10%-wide slab inside ONE 8-way tile layer ([625, 750) in the
    # 0-999 domain): intersects 1 of 8 layers plus prefix straddlers
    for col in ("a", "b", "c"):
        keep, n = surviving(col, 630, 740)
        assert n == 512
        assert keep <= int(0.4 * n), (col, keep, n)


def test_zorder_n_bit_budget_validation(spark):
    from pyspark.sql import functions as F

    from data_pipeline_mlops_spark.sources.layout import zorder_key_n

    with __import__("pytest").raises(ValueError):
        zorder_key_n(
            [F.col("x")] * 4, mins=[0] * 4, maxs=[1] * 4, bits=[16] * 4
        )
    with __import__("pytest").raises(ValueError):
        zorder_key_n([F.col("x")], mins=[0], maxs=[1], bits=[0])
