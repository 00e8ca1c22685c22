"""Manifest-commit transactional tables (sources/txn.py): atomic
version publish, partition-scoped replace, snapshot isolation, time
travel, crash invisibility, conflict detection, vacuum, and the
upsert/compaction integrations."""

from __future__ import annotations

import os

import pytest

from data_pipeline_mlops_spark.sources.txn import CommitConflict, ManifestTable


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_commit_read_roundtrip_unpartitioned(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    assert t.latest_version() is None
    v = t.commit(spark.range(5), mode="replace_all")
    assert v == 0
    assert t.read(spark).count() == 5
    v2 = t.commit(spark.range(3), mode="replace_all")
    assert v2 == 1
    assert t.read(spark).count() == 3


def test_replace_partitions_keeps_untouched(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    b1 = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "k long, p string"
    )
    t.commit(b1, partition_col="p", mode="replace_partitions")
    b2 = spark.createDataFrame([(9, "a")], "k long, p string")
    t.commit(b2, partition_col="p", mode="replace_partitions")
    got = _rows(t.read(spark).select("k", "p"))
    assert got == {(9, "a"), (3, "b")}
    # manifest-side partition pruning
    assert _rows(t.read(spark, partitions=["b"]).select("k", "p")) == {
        (3, "b")
    }


def test_append_mode_accumulates(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    b = spark.createDataFrame([(1, "a")], "k long, p string")
    t.commit(b, partition_col="p", mode="append")
    t.commit(b, partition_col="p", mode="append")
    assert t.read(spark).count() == 2


def test_snapshot_isolation_and_time_travel(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.commit(spark.range(4), mode="replace_all")
    old = t.read(spark)  # lazy plan pinned to v0's files
    t.commit(spark.range(100), mode="replace_all")
    assert old.count() == 4  # still reads v0 files — never deleted
    assert t.read(spark, version=0).count() == 4
    assert t.read(spark).count() == 100


def test_crash_orphans_invisible_then_vacuumed(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.commit(spark.range(5), mode="replace_all")
    # a writer that crashed after staging, before commit
    orphan = tmp_path / "t" / "data" / "txn-deadbeef"
    os.makedirs(orphan)
    spark.range(99).write.mode("overwrite").parquet(str(orphan / "junk"))
    assert t.read(spark).count() == 5  # orphan invisible
    # default retention treats the fresh orphan as a possibly in-flight
    # commit (files are staged BEFORE the manifest publishes) — kept
    deleted = t.vacuum(keep_versions=1)
    assert not any("txn-deadbeef" in d for d in deleted)
    # past the horizon (writer exclusivity asserted) it is reclaimed
    deleted = t.vacuum(keep_versions=1, retention_seconds=0.0)
    assert any("txn-deadbeef" in d for d in deleted)
    assert t.read(spark).count() == 5


def test_vacuum_retention_protects_inflight_staging(spark, tmp_path):
    """A concurrent writer's staged-but-not-yet-committed txn dir must
    survive vacuum: commit() stages data files before the manifest, so
    an unreferenced young dir is NOT garbage. Simulated by staging via
    the private hook, vacuuming, then publishing the commit."""
    t = ManifestTable(str(tmp_path / "t"))
    t.commit(spark.range(5), mode="replace_all")
    staged = t._stage(spark.range(7), None)  # in-flight writer
    t.vacuum(keep_versions=1)  # concurrent vacuum, default retention
    # the in-flight commit can still publish and its files are intact
    base_v = t.latest_version()
    t._write_manifest(
        base_v + 1,
        {
            "version": base_v + 1,
            "parent": base_v,
            "partition_col": None,
            "partitions": {k: [d] for k, d in staged.items()},
            "committed_at": 0,
        },
    )
    assert t.read(spark).count() == 7


def test_empty_replace_all_commit_readable(spark, tmp_path):
    """replace_all of an EMPTY partitioned df stages zero partition
    dirs; the resulting manifest must read back as an empty frame with
    the committed schema (regression: this recursed forever)."""
    t = ManifestTable(str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame([(1, "a")], "k long, p string"),
        partition_col="p",
        mode="replace_partitions",
    )
    empty = spark.createDataFrame([], "k long, p string")
    v = t.commit(empty, partition_col="p", mode="replace_all")
    got = t.read(spark)
    assert got.count() == 0
    assert set(got.columns) == {"k", "p"}
    # time travel still sees the old data; latest is the empty snapshot
    assert t.read(spark, version=v - 1).count() == 1


def test_vacuum_drops_old_versions(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.commit(spark.range(4), mode="replace_all")
    t.commit(spark.range(7), mode="replace_all")
    t.vacuum(keep_versions=1)
    assert t.versions() == [1]
    assert t.read(spark).count() == 7
    with pytest.raises(FileNotFoundError):
        t._manifest(0)


def test_commit_conflict_retries_to_next_version(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    t.commit(spark.range(2), mode="replace_all")
    # another writer takes v1 out from under this commit
    t._write_manifest(
        1,
        {
            "version": 1,
            "parent": 0,
            "partition_col": None,
            "partitions": t._manifest(0)["partitions"],
            "committed_at": 0,
        },
    )
    v = t.commit(spark.range(9), mode="replace_all")
    assert v == 2  # retried against the new base
    with pytest.raises(CommitConflict):
        t._write_manifest(2, {"partitions": {}})


def test_upsert_batch_txn_merge_and_replay(spark, tmp_path):
    from data_pipeline_mlops_spark.streaming.upsert_sink import (
        upsert_batch_txn,
    )

    t = ManifestTable(str(tmp_path / "t"))
    kw = dict(key_cols=["k"], order_col="v", partition_col="p")
    b1 = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, 30, "b")], "k long, v long, p string"
    )
    upsert_batch_txn(b1, table=t, **kw)
    b2 = spark.createDataFrame(
        [(1, 11, "a"), (4, 40, "a")], "k long, v long, p string"
    )
    upsert_batch_txn(b2, table=t, **kw)
    want = {(1, 11, "a"), (2, 20, "a"), (3, 30, "b"), (4, 40, "a")}
    assert _rows(t.read(spark).select("k", "v", "p")) == want
    upsert_batch_txn(b2, table=t, **kw)  # replay → same state, new version
    assert _rows(t.read(spark).select("k", "v", "p")) == want
    # partition b untouched since v0: its files were carried over, and
    # readers of every prior version still resolve
    assert t.read(spark, version=0).count() == 3


def test_compact_table_transactional(spark, tmp_path):
    from data_pipeline_mlops_spark.sources.layout import compact_table

    t = ManifestTable(str(tmp_path / "t"))
    for _ in range(3):
        t.commit(
            spark.range(1000).selectExpr("id", "id % 7 AS x"), mode="append"
        )
    before = t.read(spark)
    v = compact_table(
        t, spark, target_rows_per_file=2000, sort_col="id"
    )
    after = t.read(spark)
    assert after.count() == 3000
    assert _rows(after) == _rows(before)
    # pre-compaction snapshot still readable (no swap window)
    assert t.read(spark, version=v - 1).count() == 3000
    t.vacuum(keep_versions=1)
    assert t.read(spark).count() == 3000


def test_upsert_txn_driven_by_real_stream(spark, tmp_path):
    """End-to-end: a file stream drives upsert_foreach_batch_txn; the
    ManifestTable ends at the same state a batch upsert produces, and
    every micro-batch committed a readable version."""
    import json
    import os

    from data_pipeline_mlops_spark.streaming.upsert_sink import (
        upsert_foreach_batch_txn,
    )

    src = tmp_path / "src"
    os.makedirs(src)
    with open(src / "b1.json", "w") as fh:
        for rec in [
            {"k": 1, "v": 10, "p": "a"},
            {"k": 2, "v": 20, "p": "a"},
            {"k": 3, "v": 30, "p": "b"},
        ]:
            fh.write(json.dumps(rec) + "\n")
    with open(src / "b2.json", "w") as fh:
        for rec in [{"k": 1, "v": 11, "p": "a"}, {"k": 4, "v": 40, "p": "a"}]:
            fh.write(json.dumps(rec) + "\n")

    stream = (
        spark.readStream.schema("k long, v long, p string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    path = str(tmp_path / "tbl")
    q = (
        stream.writeStream.foreachBatch(
            upsert_foreach_batch_txn(
                path=path, key_cols=["k"], order_col="v", partition_col="p"
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    t = ManifestTable(path)
    got = {(r.k, r.v, r.p) for r in t.read(spark).collect()}
    assert got == {(1, 11, "a"), (2, 20, "a"), (3, 30, "b"), (4, 40, "a")}
    assert t.latest_version() >= 1  # one commit per non-empty batch


def test_compact_if_fragmented_threshold(spark, tmp_path):
    from data_pipeline_mlops_spark.sources.layout import (
        compact_if_fragmented,
    )

    t = ManifestTable(str(tmp_path / "t"))
    for _ in range(4):
        t.commit(spark.range(100), mode="append")
    assert t.fragmentation() == 4
    # under threshold: no-op
    assert compact_if_fragmented(
        t, spark, max_txn_dirs=8, target_rows_per_file=1000
    ) is None
    # over threshold: one compacting commit, fragmentation collapses
    v = compact_if_fragmented(
        t, spark, max_txn_dirs=3, target_rows_per_file=1000
    )
    assert v == 4
    assert t.fragmentation() == 1
    assert t.read(spark).count() == 400


def test_txn_partition_pruning_reaches_scan(spark, tmp_path):
    """partitions= prunes at the MANIFEST, so the resulting plan's
    input files must all live under the requested partition dirs —
    the other partitions' files are never even listed."""
    t = ManifestTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, chr(97 + i % 3)) for i in range(30)], "k long, p string"
    )
    t.commit(df, partition_col="p", mode="replace_partitions")
    pruned = t.read(spark, partitions=["b"])
    files = pruned.inputFiles()
    assert files and all("/p=b/" in f or "p=b" in f for f in files)
    assert {r.p for r in pruned.collect()} == {"b"}


def test_partition_pruning_with_escaped_values(spark, tmp_path):
    """Spark escapes special chars in partition dir names ("a b" ->
    "a%20b"); pruning must accept the LOGICAL value."""
    t = ManifestTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, "a b"), (2, "plain")], "k long, p string"
    )
    t.commit(df, partition_col="p", mode="replace_partitions")
    got = _rows(t.read(spark, partitions=["a b"]).select("k", "p"))
    assert got == {(1, "a b")}


def test_manifest_table_matches_model_on_random_histories(spark, tmp_path):
    """Model-based check: random sequences of append / replace_all /
    replace_partitions commits over two partitions must leave the
    table equal to a dict model applying the same semantics — and
    every historical version must replay its own model state."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    op = st.tuples(
        st.sampled_from(["append", "replace_all", "replace_partitions"]),
        st.lists(
            st.tuples(st.integers(0, 9), st.sampled_from(["a", "b"])),
            min_size=1,
            max_size=3,
        ),
    )

    counter = iter(range(10_000))

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(op, min_size=1, max_size=4))
    def run(history):
        from data_pipeline_mlops_spark.sources.txn import ManifestTable

        t = ManifestTable(str(tmp_path / f"t{next(counter)}"))
        model: dict[str, list] = {}
        snapshots = []
        for mode, rows in history:
            df = spark.createDataFrame(rows, "k long, p string")
            t.commit(df, partition_col="p", mode=mode)
            if mode == "replace_all":
                model = {}
                for k, p in rows:
                    model.setdefault(p, []).append(k)
            elif mode == "replace_partitions":
                for p in {p for _, p in rows}:
                    model[p] = []
                for k, p in rows:
                    model[p].append(k)
            else:
                for k, p in rows:
                    model.setdefault(p, []).append(k)
            snapshots.append({p: sorted(v) for p, v in model.items()})
        # latest state matches the model…
        got = {}
        for r in t.read(spark).collect():
            got.setdefault(r.p, []).append(r.k)
        assert {p: sorted(v) for p, v in got.items()} == snapshots[-1]
        # …and so does every retained historical version (time travel)
        for v, snap in enumerate(snapshots):
            old = {}
            for r in t.read(spark, version=v).collect():
                old.setdefault(r.p, []).append(r.k)
            assert {p: sorted(vv) for p, vv in old.items()} == snap

    run()


def test_schema_evolution_merge_read(spark, tmp_path):
    """Additive schema evolution: an appended commit carries a new
    column; merge_schema=True surfaces it with nulls for old rows,
    while the default read keeps the original projection working."""
    from data_pipeline_mlops_spark.sources.txn import ManifestTable

    t = ManifestTable(str(tmp_path / "evo"))
    t.commit(
        spark.createDataFrame([(1, "a", 10)], "k long, p string, v long"),
        partition_col="p",
        mode="replace_all",
    )
    t.commit(
        spark.createDataFrame(
            [(2, "b", 20, "new")], "k long, p string, v long, extra string"
        ),
        partition_col="p",
        mode="append",
    )
    merged = t.read(spark, merge_schema=True)
    assert "extra" in merged.columns
    got = {(r.k, r.extra) for r in merged.collect()}
    assert got == {(1, None), (2, "new")}
    # time travel to v0 still reads the original schema
    v0 = t.read(spark, version=0)
    assert "extra" not in v0.columns


def test_shallow_clone_zero_copy_and_divergence(spark, tmp_path):
    from data_pipeline_mlops_spark.sources.txn import ManifestTable

    src = ManifestTable(str(tmp_path / "src"))
    src.commit(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k long, p string, v long"
        ),
        partition_col="p",
        mode="replace_all",
    )
    clone = src.clone(str(tmp_path / "clone"))
    # clone reads the source's files without copying them
    assert {(r.k, r.v) for r in clone.read(spark).collect()} == {
        (1, 10), (2, 20)
    }
    import os
    assert not any(
        d.startswith("txn-")
        for d in os.listdir(tmp_path / "clone" / "data")
    ) if (tmp_path / "clone" / "data").exists() else True
    # commits to the clone do not disturb the source
    clone.commit(
        spark.createDataFrame([(3, "c", 30)], "k long, p string, v long"),
        partition_col="p",
        mode="replace_partitions",
    )
    assert {r.k for r in clone.read(spark).collect()} == {1, 2, 3}
    assert {r.k for r in src.read(spark).collect()} == {1, 2}
    # clone's own vacuum never deletes source files
    clone.vacuum(keep_versions=1, retention_seconds=0.0)
    assert {r.k for r in src.read(spark).collect()} == {1, 2}
    assert {r.k for r in clone.read(spark).collect()} == {1, 2, 3}


def test_enforce_schema_fails_the_write_not_the_read(spark, tmp_path):
    from data_pipeline_mlops_spark.sources.txn import ManifestTable

    t = ManifestTable(str(tmp_path / "enf"))
    t.commit(
        spark.createDataFrame([(1, "a")], "k long, p string"),
        partition_col="p",
        mode="replace_all",
    )
    drifted = spark.createDataFrame(
        [(2, "b", 9.5)], "k long, p string, score double"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="schema drift"):
        t.commit(
            drifted, partition_col="p", mode="append", enforce_schema=True
        )
    # matching schema passes enforcement
    t.commit(
        spark.createDataFrame([(3, "c")], "k long, p string"),
        partition_col="p",
        mode="append",
        enforce_schema=True,
    )
    # without enforcement the drifted append lands (deliberate
    # evolution path), and becomes the CURRENT schema for future
    # enforced commits
    t.commit(drifted, partition_col="p", mode="append")
    assert "score" in t.read(spark, merge_schema=True).columns
    with _pytest.raises(ValueError, match="schema drift"):
        t.commit(
            spark.createDataFrame([(4, "d")], "k long, p string"),
            partition_col="p",
            mode="append",
            enforce_schema=True,
        )


def test_vacuum_dry_run_and_stats(spark, tmp_path):
    import os

    from data_pipeline_mlops_spark.sources.txn import ManifestTable

    t = ManifestTable(str(tmp_path / "vd"))
    t.commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, p string"),
        partition_col="p",
        mode="replace_all",
    )
    t.commit(
        spark.createDataFrame([(3, "a")], "k long, p string"),
        partition_col="p",
        mode="replace_partitions",
    )
    s = t.stats()
    assert s["versions"] == 2 and s["partitions"] == 2
    assert s["files"] >= 2 and s["bytes"] > 0
    would = t.vacuum(keep_versions=1, retention_seconds=0.0, dry_run=True)
    assert would  # something is reclaimable
    for p in would:
        assert os.path.exists(p)  # nothing actually deleted
    did = t.vacuum(keep_versions=1, retention_seconds=0.0)
    assert sorted(did) == sorted(would)
    for p in did:
        assert not os.path.exists(p)


def test_expected_version_conflict_on_touched_partition(spark, tmp_path):
    """A read-modify-write commit (expected_version set) must RAISE
    when a concurrent commit changed a partition it replaces — silent
    re-pointing would discard the concurrent writer's rows (the Delta
    ConcurrentModificationException contract)."""
    from data_pipeline_mlops_spark.sources.txn import (
        ConcurrentModificationError,
        ManifestTable,
    )

    t = ManifestTable(str(tmp_path / "cc"))
    v0 = t.commit(
        spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "k long, p string, v long"),
        partition_col="p", mode="replace_all",
    )
    # concurrent writer replaces partition a AFTER our reader snapshot
    t.commit(
        spark.createDataFrame([(9, "a", 99)], "k long, p string, v long"),
        partition_col="p", mode="replace_partitions",
    )
    with pytest.raises(ConcurrentModificationError):
        t.commit(
            spark.createDataFrame([(1, "a", 11)], "k long, p string, v long"),
            partition_col="p", mode="replace_partitions",
            expected_version=v0,
        )
    # non-overlapping concurrent commit (partition b untouched by us,
    # partition c untouched by them) composes fine:
    v = t.commit(
        spark.createDataFrame([(3, "c", 30)], "k long, p string, v long"),
        partition_col="p", mode="replace_partitions",
        expected_version=v0,
    )
    got = {(r.k, r.p, r.v) for r in t.read(spark, version=v).collect()}
    assert got == {(9, "a", 99), (2, "b", 20), (3, "c", 30)}
    # replace_all computed from a stale base always conflicts
    with pytest.raises(ConcurrentModificationError):
        t.commit(
            spark.createDataFrame([(0, "z", 0)], "k long, p string, v long"),
            partition_col="p", mode="replace_all", expected_version=v0,
        )


def test_null_partition_value_drop_and_read(spark, tmp_path):
    """None (and '') partition values live in
    __HIVE_DEFAULT_PARTITION__; drop_partitions and read(partitions=)
    must target it — 'col=None' string keys silently matched nothing
    and stale base files carried over."""
    from data_pipeline_mlops_spark.sources.txn import ManifestTable

    t = ManifestTable(str(tmp_path / "np"))
    t.commit(
        spark.createDataFrame(
            [(1, None, 10), (2, "b", 20), (3, None, 30)],
            "k long, p string, v long",
        ),
        partition_col="p", mode="replace_all",
    )
    null_rows = t.read(spark, partitions=[None]).collect()
    assert {r.k for r in null_rows} == {1, 3}
    # drop the whole null partition (stage carries no rows for it)
    t.commit(
        spark.createDataFrame([], "k long, p string, v long"),
        partition_col="p", mode="replace_partitions",
        drop_partitions=[None],
    )
    got = {(r.k, r.p) for r in t.read(spark).collect()}
    assert got == {(2, "b")}
