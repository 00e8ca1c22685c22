"""IvfStream: exactly-once streaming appends to the persisted IVF
index, crash-replay dedup via maintain()."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_mlops_spark.streaming.ivf_stream import IvfStream


def _vecs(spark, ids, seed=0):
    rng = np.random.RandomState(seed)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in ids]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture()
def stream(spark, tmp_path):
    s = IvfStream(
        str(tmp_path / "ivfs"), id_col="vec_id", vec_col="embedding"
    )
    s.bootstrap(_vecs(spark, range(100)), n_clusters=4, seed=7)
    return s


def test_streamed_vectors_become_searchable(spark, stream):
    base = _vecs(spark, range(100))
    twin = base.where("vec_id = 7").selectExpr(
        "vec_id + 5000 AS vec_id",
        "transform(embedding, x -> x + 0.0001d) AS embedding",
    )
    stream(twin, 0)
    res = stream.index.search(
        base.where("vec_id = 7"), id_col="vec_id", vec_col="embedding",
        k=2, n_probe=2,
    ).collect()
    assert 5007 in {r.neighbor_id for r in res}


def test_redelivery_is_noop(spark, stream):
    b = _vecs(spark, [900], seed=3)
    stream(b, 1)
    v = stream.index.codes_t.latest_version()
    stream(b, 1)  # redelivered
    assert stream.index.codes_t.latest_version() == v


def test_maintain_removes_crash_replay_dupes(spark, stream):
    b = _vecs(spark, [901], seed=4)
    stream(b, 2)
    # simulate a crash AFTER the codes append but BEFORE the marker:
    # re-append the same batch body manually, then replay
    from data_pipeline_mlops_spark.ml.ivf import assign_to_centroids
    from pyspark.sql import functions as F

    dup = assign_to_centroids(
        b, stream.index.centroids_t.read(spark),
        id_col="vec_id", vec_col="embedding",
    ).withColumn("batch_id", F.lit(2).cast("long"))
    stream.index.codes_t.commit(
        dup, partition_col="cluster", mode="append"
    )
    codes = stream.index.codes_t.read(spark)
    assert codes.where("vec_id = 901").count() == 2  # duplicated
    stream.maintain()
    codes = stream.index.codes_t.read(spark)
    assert codes.where("vec_id = 901").count() == 1
    # the whole corpus survives compaction exactly once each
    assert codes.count() == codes.select("vec_id").distinct().count()
