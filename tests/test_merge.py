"""MERGE INTO + table_changes (sources/merge.py) edge cases the
registry's hash-level check can't see: partition-file carry-over,
emptied-partition drop, manifest-level CDC pruning, unpartitioned
tables."""

from __future__ import annotations

import pytest

from data_pipeline_mlops_spark.sources.merge import merge_into, table_changes
from data_pipeline_mlops_spark.sources.txn import ManifestTable


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, p string, v long")


@pytest.fixture()
def table(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.commit(
        _mk(
            spark,
            [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
        ),
        partition_col="p",
        mode="replace_all",
    )
    return t


def test_merge_update_insert_delete(spark, table):
    src = spark.createDataFrame(
        [
            (2, "a", 21, False),   # update in place
            (5, "b", 50, False),   # insert
            (3, "b", 0, True),     # delete
            (99, "a", 0, True),    # delete of absent key: no-op
        ],
        "k long, p string, v long, is_delete boolean",
    )
    merge_into(spark, table, src, on=["k"], delete_col="is_delete")
    got = {
        (r.k, r.p, r.v) for r in table.read(spark).collect()
    }
    assert got == {(1, "a", 10), (2, "a", 21), (4, "c", 40), (5, "b", 50)}


def test_untouched_partition_files_carry_over(spark, table):
    v0 = table.latest_version()
    dirs_before = table._manifest(v0)["partitions"]["p=c"]
    src = spark.createDataFrame(
        [(2, "a", 99, False)], "k long, p string, v long, is_delete boolean"
    )
    v1 = merge_into(spark, table, src, on=["k"], delete_col="is_delete")
    # partition c untouched: exact same staged dirs, no rewrite
    assert table._manifest(v1)["partitions"]["p=c"] == dirs_before
    assert table._manifest(v1)["partitions"]["p=a"] != (
        table._manifest(v0)["partitions"]["p=a"]
    )


def test_fully_deleted_partition_is_dropped(spark, table):
    src = spark.createDataFrame(
        [(4, "c", 0, True)], "k long, p string, v long, is_delete boolean"
    )
    v1 = merge_into(spark, table, src, on=["k"], delete_col="is_delete")
    assert "p=c" not in table._manifest(v1)["partitions"]
    assert {r.k for r in table.read(spark).collect()} == {1, 2, 3}


def test_cross_partition_move_rewrites_both(spark, table):
    # key 3 moves b -> c: old partition must lose it, new must gain it
    src = spark.createDataFrame(
        [(3, "c", 31, False)], "k long, p string, v long, is_delete boolean"
    )
    merge_into(spark, table, src, on=["k"], delete_col="is_delete")
    got = {(r.k, r.p, r.v) for r in table.read(spark).collect()}
    assert (3, "c", 31) in got
    assert not any(r[0] == 3 and r[1] == "b" for r in got)
    # b emptied entirely (3 was its only row) -> dropped
    assert "p=b" not in table._manifest(table.latest_version())["partitions"]


def test_unpartitioned_merge(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "u"))
    t.commit(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
        partition_col=None,
        mode="replace_all",
    )
    src = spark.createDataFrame(
        [(2, 21, False), (3, 30, False), (1, 0, True)],
        "k long, v long, is_delete boolean",
    )
    merge_into(spark, t, src, on=["k"], delete_col="is_delete")
    assert {(r.k, r.v) for r in t.read(spark).collect()} == {(2, 21), (3, 30)}


def test_empty_source_is_noop(spark, table):
    v0 = table.latest_version()
    src = spark.createDataFrame(
        [], "k long, p string, v long, is_delete boolean"
    )
    v1 = merge_into(spark, table, src, on=["k"], delete_col="is_delete")
    assert v1 == v0


def test_table_changes_vocabulary(spark, table):
    v0 = table.latest_version()
    src = spark.createDataFrame(
        [(2, "a", 21, False), (5, "b", 50, False), (3, "b", 0, True)],
        "k long, p string, v long, is_delete boolean",
    )
    v1 = merge_into(spark, table, src, on=["k"], delete_col="is_delete")
    ch = {
        (r._change_type, r.k, r.v)
        for r in table_changes(
            spark, table, v_from=v0, v_to=v1, on=["k"]
        ).collect()
    }
    assert ch == {
        ("insert", 5, 50),
        ("delete", 3, 30),
        ("update_preimage", 2, 20),
        ("update_postimage", 2, 21),
    }


def test_table_changes_prunes_unchanged_partitions(spark, table):
    """A no-op rewrite (same values re-merged) of partition a must not
    surface partition c rows as changes, and identical manifest dir
    lists must short-circuit: diff of identical versions is empty."""
    v0 = table.latest_version()
    ch = table_changes(spark, table, v_from=v0, v_to=v0, on=["k"])
    assert ch.count() == 0


def test_table_changes_unchanged_row_not_reported(spark, table):
    """Re-merging an identical row image rewrites its partition's
    files, but the row-level diff must report nothing for it."""
    v0 = table.latest_version()
    src = spark.createDataFrame(
        [(1, "a", 10, False), (2, "a", 99, False)],
        "k long, p string, v long, is_delete boolean",
    )
    v1 = merge_into(spark, table, src, on=["k"], delete_col="is_delete")
    ch = table_changes(spark, table, v_from=v0, v_to=v1, on=["k"])
    types = {(r.k, r._change_type) for r in ch.collect()}
    assert (1, "update_preimage") not in types
    assert (2, "update_postimage") in types


def test_incremental_aggregate_prunes_and_drops(spark, tmp_path):
    """Refresh must leave untouched group partitions' files alone and
    drop groups whose rows all vanished."""
    from pyspark.sql import functions as F

    from data_pipeline_mlops_spark.plans.incremental import (
        IncrementalAggregate,
    )
    from data_pipeline_mlops_spark.sources.merge import merge_into
    from data_pipeline_mlops_spark.sources.txn import ManifestTable

    src = ManifestTable(str(tmp_path / "src"))
    src.commit(
        spark.createDataFrame(
            [(1, 10, 5), (2, 10, 7), (3, 20, 9), (4, 30, 1)],
            "k long, day long, v long",
        ),
        partition_col="day",
        mode="replace_all",
    )
    v0 = src.latest_version()

    def day_key(df):
        return F.col("day")

    def agg_fn(df):
        return df.groupBy(F.col("day").alias("day")).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("total"),
        )

    ia = IncrementalAggregate(
        ManifestTable(str(tmp_path / "sum")),
        key_col="day",
        group_key=day_key,
        agg_fn=agg_fn,
    )
    ia.full_compute(spark, src)
    sum_v0 = ia.summary.latest_version()
    day10_dirs = ia.summary._manifest(sum_v0)["partitions"]["day=10"]

    # merge: update one day-20 row, delete the only day-30 row
    delta = spark.createDataFrame(
        [(3, 20, 90, False), (4, 30, 0, True)],
        "k long, day long, v long, is_delete boolean",
    )
    v1 = merge_into(spark, src, delta, on=["k"], delete_col="is_delete")
    ia.refresh(spark, src, v_from=v0, v_to=v1, on=["k"])

    got = {(r.day, r.n, r.total) for r in ia.summary.read(spark).collect()}
    assert got == {(10, 2, 12), (20, 1, 90)}
    man = ia.summary._manifest(ia.summary.latest_version())["partitions"]
    assert "day=30" not in man                      # emptied group dropped
    assert man["day=10"] == day10_dirs              # untouched files carry over


def test_merge_deletes_null_partition_rows(spark, tmp_path):
    """A MERGE that deletes every row of the NULL partition must drop
    it — the drop key maps to __HIVE_DEFAULT_PARTITION__, not
    'p=None'."""
    t = ManifestTable(str(tmp_path / "mn"))
    t.commit(
        spark.createDataFrame(
            [(1, None, 10), (2, "b", 20)], "k long, p string, v long"
        ),
        partition_col="p", mode="replace_all",
    )
    src = spark.createDataFrame(
        [(1, None, 0, True)], "k long, p string, v long, is_delete boolean"
    )
    merge_into(spark, t, src, on=["k"], delete_col="is_delete")
    got = {(r.k, r.p, r.v) for r in t.read(spark).collect()}
    assert got == {(2, "b", 20)}


def test_merge_concurrent_writer_conflicts(spark, table):
    """merge_into pins expected_version: a concurrent commit to a
    partition the merge touches raises instead of losing the update."""
    from data_pipeline_mlops_spark.sources.txn import (
        ConcurrentModificationError,
    )

    class RacingTable(ManifestTable):
        # injects a concurrent commit between the merge's snapshot
        # read and its own commit
        def commit(self, df, **kw):
            if kw.get("expected_version") is not None and not getattr(
                self, "_raced", False
            ):
                self._raced = True
                ManifestTable(self.path).commit(
                    df.sparkSession.createDataFrame(
                        [(77, "a", 770)], "k long, p string, v long"
                    ),
                    partition_col="p", mode="replace_partitions",
                )
            return super().commit(df, **kw)

    rt = RacingTable(table.path)
    src = spark.createDataFrame(
        [(2, "a", 21, False)], "k long, p string, v long, is_delete boolean"
    )
    with pytest.raises(ConcurrentModificationError):
        merge_into(spark, rt, src, on=["k"], delete_col="is_delete")
    # the concurrent writer's row SURVIVED (nothing was lost)
    got = {(r.k, r.v) for r in table.read(spark).collect()}
    assert (77, 770) in got
