"""CmsStore: persisted incremental count-min sketch — incremental ==
batch equality, replay idempotence, and compaction invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_mlops_spark.functions import sketch
from data_pipeline_mlops_spark.streaming.sketch_stream import CmsStore


def _keys(spark, lo, hi, mod=13):
    return spark.range(lo, hi).select((F.col("id") % mod).alias("k"))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_incremental_updates_equal_whole_corpus_sketch(spark, tmp_path):
    store = CmsStore(str(tmp_path / "cms"), depth=4, width=64)
    a, b = _keys(spark, 0, 500), _keys(spark, 500, 800)
    assert store.update(a, "k", batch_id=0)
    assert store.update(b, "k", batch_id=1)
    whole = sketch.cms_build(a.unionByName(b), "k", depth=4, width=64)
    assert _rows(store.read_sketch(spark)) == _rows(whole)


def test_replayed_batch_is_noop(spark, tmp_path):
    store = CmsStore(str(tmp_path / "cms"), depth=4, width=64)
    a = _keys(spark, 0, 300)
    assert store.update(a, "k", batch_id=0)
    before = _rows(store.read_sketch(spark))
    assert not store.update(a, "k", batch_id=0)  # redelivery
    assert _rows(store.read_sketch(spark)) == before


def test_maintain_compacts_without_changing_sketch(spark, tmp_path):
    store = CmsStore(str(tmp_path / "cms"), depth=4, width=64)
    for i, (lo, hi) in enumerate([(0, 200), (200, 500), (500, 650)]):
        store.update(_keys(spark, lo, hi), "k", batch_id=i)
    before = _rows(store.read_sketch(spark))
    store.maintain(spark)
    assert _rows(store.read_sketch(spark)) == before
    # folded history still counts as applied (watermark), so replays
    # of compacted batches stay no-ops
    for i in range(3):
        assert store.applied(spark, i)
        assert not store.update(_keys(spark, 0, 10), "k", batch_id=i)
    # and genuinely new batches still apply on top of the summary
    assert store.update(_keys(spark, 650, 700), "k", batch_id=3)
    whole = sketch.cms_build(_keys(spark, 0, 700), "k", depth=4, width=64)
    assert _rows(store.read_sketch(spark)) == _rows(whole)


def test_estimates_from_store_never_underestimate(spark, tmp_path):
    store = CmsStore(str(tmp_path / "cms"), depth=4, width=16)
    store.update(_keys(spark, 0, 1000, mod=37), "k", batch_id=0)
    exact = (
        _keys(spark, 0, 1000, mod=37)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    est = store.estimate(exact, "k")
    assert (
        exact.join(est, "k")
        .where(F.col("cms_estimate") < F.col("exact"))
        .count()
        == 0
    )
