"""IvfIndex: persisted incremental IVF — bootstrap equivalence,
append correctness, touched-cell-only commits."""

from __future__ import annotations

import numpy as np
import pytest

from data_pipeline_mlops_spark.ml.ivf import (
    IvfIndex,
    build_ivf_index,
    ivf_topk,
)


def _corpus(spark, n=120, d=8, seed=0):
    rng = np.random.RandomState(seed)
    rows = [
        (i, [float(x) for x in rng.randn(d)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture()
def idx(spark, tmp_path):
    ix = IvfIndex(str(tmp_path / "ivf"))
    ix.bootstrap(
        _corpus(spark), id_col="vec_id", vec_col="embedding",
        n_clusters=4, seed=7,
    )
    return ix


def test_bootstrap_search_matches_direct_build(spark, idx):
    corpus = _corpus(spark)
    queries = corpus.where("vec_id < 3")
    cent, assigned = build_ivf_index(
        corpus, id_col="vec_id", vec_col="embedding", n_clusters=4, seed=7
    )
    direct = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(
            queries, cent, assigned, id_col="vec_id",
            vec_col="embedding", k=3, n_probe=2,
        ).collect()
    )
    persisted = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in idx.search(
            queries, id_col="vec_id", vec_col="embedding", k=3, n_probe=2
        ).collect()
    )
    assert direct == persisted


def test_append_makes_new_vector_findable(spark, idx):
    corpus = _corpus(spark)
    twin = corpus.where("vec_id = 5").selectExpr(
        "vec_id + 10000 AS vec_id",
        "transform(embedding, x -> x + 0.0001d) AS embedding",
    )
    idx.append(twin, id_col="vec_id", vec_col="embedding")
    res = idx.search(
        corpus.where("vec_id = 5"), id_col="vec_id", vec_col="embedding",
        k=2, n_probe=2,
    ).collect()
    hits = {r.neighbor_id for r in res}
    assert 10005 in hits  # the appended near-twin is retrieved


def test_append_touches_only_assigned_cells(spark, idx):
    v_before = idx.codes_t.latest_version()
    man_before = idx.codes_t._manifest(v_before)["partitions"]
    one = spark.createDataFrame(
        [(99991, [float(i) for i in range(8)])],
        "vec_id long, embedding array<double>",
    )
    idx.append(one, id_col="vec_id", vec_col="embedding")
    man_after = idx.codes_t._manifest(idx.codes_t.latest_version())[
        "partitions"
    ]
    changed = [
        k for k in man_after
        if man_after.get(k) != man_before.get(k)
    ]
    assert len(changed) == 1  # exactly the one cell the vector landed in
