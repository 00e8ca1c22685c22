"""MERGE INTO and snapshot-diff CDC over ManifestTable.

The reference's daily DAG reconciles new extracts against yesterday's
parquet by overwriting whole partition directories in pandas
(dags/daily_pipeline.py parquet writes); there is no keyed upsert,
no delete, and no change feed. This module supplies the lakehouse
equivalents that a 100 TB corpus actually needs, over the repo's own
transactional table format (sources/txn.py):

- :func:`merge_into` — Delta-style ``MERGE INTO`` (WHEN MATCHED
  UPDATE/DELETE, WHEN NOT MATCHED INSERT), rewriting ONLY the
  partitions the source touches. Cost is O(touched partitions), not
  O(table): untouched partitions' files are carried over by manifest
  pointer, byte-identical.
- :func:`table_changes` — Delta CDF-style change feed between two
  committed snapshots (insert / delete / update_preimage /
  update_postimage), with manifest-level pruning: partitions whose
  staged-directory lists are IDENTICAL in both manifests are skipped
  without reading a row (data dirs are immutable, so same dirs ⇒ same
  bytes ⇒ no changes).

Scale notes (100 TB):
- The touched-partition set is collected to the driver, but it is
  bounded by the partition count (metadata scale, thousands), never by
  row count — the same class of driver state as a manifest itself.
- ``merge_into`` shuffles once on the join key over touched partitions
  only; the source is usually a day's delta and broadcast-eligible —
  Catalyst/AQE picks broadcast automatically under the threshold.
- ``table_changes`` reads only partitions whose dir lists differ
  between the two manifests, then resolves row-level ops with one
  full-outer join on the key. For an incremental pipeline this is the
  right feed primitive: downstream consumers re-process changed keys
  instead of re-scanning the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.sources.txn import ManifestTable


def merge_into(
    spark: SparkSession,
    table: ManifestTable,
    source: DataFrame,
    *,
    on: list[str],
    delete_col: str | None = None,
) -> int:
    """Keyed upsert of ``source`` into ``table``; returns the committed
    version.

    Semantics (full-row images, like a Debezium-unwrapped feed):
      - source row matches a target key and ``delete_col`` is true
        -> the target row is deleted;
      - source row matches and is not a delete -> the target row is
        REPLACED by the source row (full-row update; partition moves
        are handled — both the old and new partition are rewritten);
      - source row matches nothing and is not a delete -> insert;
      - delete of an absent key is a no-op.

    One source row per key is required (enforce upstream with
    dedup_keep_latest); target keys are unique by the table's own
    merge history.
    """
    # Pin the snapshot FIRST, then read it by version: the whole merge
    # (survivor scan, touched-partition discovery, staging) is computed
    # from v, and commit(expected_version=v) turns any concurrent
    # change to a touched partition into an explicit conflict instead
    # of a silent lost update.
    v = table.latest_version()
    target = table.read(spark, version=v)
    pcol = table._manifest(v)["partition_col"]
    is_del = (
        F.col(delete_col).cast("boolean")
        if delete_col is not None
        else F.lit(False)
    )
    src = source.withColumn("__is_delete", is_del)
    if delete_col is not None:
        src = src.drop(delete_col)
    src_keys = src.select(*on).distinct()

    if pcol is None:
        # Unpartitioned: the rewrite is the whole table by definition.
        survivors = target.join(src_keys, on=on, how="left_anti")
        upserts = src.where(~F.col("__is_delete")).drop("__is_delete")
        merged = survivors.unionByName(upserts)
        return table.commit(
            merged, partition_col=None, mode="replace_all",
            expected_version=v,
        )

    # Touched partitions: where source rows land, plus where matched
    # target rows currently live (an update can MOVE a row across
    # partitions — its old partition must be rewritten too). Both sets
    # are partition-value-sized: driver-side metadata, not data.
    src_parts = src.select(F.col(pcol).alias("__p")).distinct()
    moved_parts = (
        target.join(src_keys, on=on, how="left_semi")
        .select(F.col(pcol).alias("__p"))
        .distinct()
    )
    touched = [
        r["__p"]
        for r in src_parts.unionByName(moved_parts).distinct().collect()
    ]
    if not touched:
        return v  # empty source: nothing to do

    tgt_touched = table.read(spark, version=v, partitions=touched)
    survivors = tgt_touched.join(src_keys, on=on, how="left_anti")
    upserts = src.where(~F.col("__is_delete")).drop("__is_delete")
    merged = survivors.unionByName(upserts)
    # drop_partitions covers partitions whose every row was deleted:
    # they stage no dir, and must not carry over from the base.
    return table.commit(
        merged,
        partition_col=pcol,
        mode="replace_partitions",
        drop_partitions=touched,
        expected_version=v,
    )


def table_changes(
    spark: SparkSession,
    table: ManifestTable,
    *,
    v_from: int,
    v_to: int,
    on: list[str],
) -> DataFrame:
    """Row-level change feed between two committed snapshots: one row
    per changed row, tagged ``_change_type`` in
    (insert, delete, update_preimage, update_postimage) — Delta CDF's
    vocabulary, derived from immutable snapshots instead of logged
    actions.

    Manifest-level pruning: a partition whose staged-directory list is
    identical in both manifests cannot differ (committed dirs are
    immutable), so only differing partitions are read AT ALL.
    """
    man_a = table._manifest(v_from)
    man_b = table._manifest(v_to)
    pcol = man_a["partition_col"]
    parts_a = {k: sorted(v) for k, v in man_a["partitions"].items()}
    parts_b = {k: sorted(v) for k, v in man_b["partitions"].items()}
    if pcol is not None and pcol == man_b["partition_col"]:
        from urllib.parse import unquote

        changed_keys = {
            k
            for k in set(parts_a) | set(parts_b)
            if parts_a.get(k) != parts_b.get(k)
        }
        prune = [
            unquote(k).split("=", 1)[1] for k in changed_keys
        ]
        if not prune:
            old = table.read(spark, version=v_from).limit(0)
            new = old
        else:
            old = table.read(spark, version=v_from, partitions=prune)
            new = table.read(spark, version=v_to, partitions=prune)
    else:
        old = table.read(spark, version=v_from)
        new = table.read(spark, version=v_to)

    nonkey = [c for c in old.columns if c not in on]
    tag = "_change_type"

    inserts = new.join(old.select(*on), on=on, how="left_anti").withColumn(
        tag, F.lit("insert")
    )
    deletes = old.join(new.select(*on), on=on, how="left_anti").withColumn(
        tag, F.lit("delete")
    )
    # Matched keys whose non-key image differs. eqNullSafe on structs
    # gives null-safe whole-row comparison in one expression.
    o = old.alias("o")
    n = new.alias("n")
    cond = None
    for k in on:
        c = F.col(f"o.{k}") == F.col(f"n.{k}")
        cond = c if cond is None else (cond & c)
    changed = (
        o.join(n, on=cond, how="inner")
        .where(
            ~F.struct(*[F.col(f"o.{c}") for c in nonkey]).eqNullSafe(
                F.struct(*[F.col(f"n.{c}") for c in nonkey])
            )
        )
        .select(*[F.col(f"o.{k}").alias(k) for k in on])
    )
    pre = old.join(changed, on=on, how="left_semi").withColumn(
        tag, F.lit("update_preimage")
    )
    post = new.join(changed, on=on, how="left_semi").withColumn(
        tag, F.lit("update_postimage")
    )
    return inserts.unionByName(deletes).unionByName(pre).unionByName(post)
