"""IVF (inverted-file) approximate nearest-neighbor search.

The second ANN strategy next to hyperplane LSH
(functions/similarity.py): partition the corpus into coarse Voronoi
cells with Spark ML KMeans, then search only the `n_probe` cells
nearest to each query — the standard IVF-Flat design. At 100 TB the
corpus-side join is cluster-pruned (a fraction n_probe/n_clusters of
the data moves), and the centroid table is tiny and broadcast.

Uses pyspark.ml (KMeans + array_to_vector); exact rescoring reuses the
deterministic dot/norm kernels from functions/similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.functions.similarity import (
    COS_SCALE,
    _to_double,
    dot_d,
    l2_norm_d,
)


def build_ivf_index(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_clusters: int = 16,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Fit coarse centroids and assign every corpus vector to its cell.

    Returns (centroids, assigned) where centroids is
    (cluster, centroid array<double>) and assigned adds `cluster` to the
    corpus rows. The KMeans fit is a few passes over a sampled/full
    corpus; at extreme scale fit on a sample — assignment is a single
    broadcast-join pass either way.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(_to_double(F.col(vec_col))).alias("__features"),
    )
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="__features",
        predictionCol="cluster",
    ).fit(feats)
    assigned = model.transform(feats).select(
        id_col, vec_col, "cluster"
    )
    centroids = feats.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster int, centroid array<double>",
    )
    return centroids, assigned


def ivf_topk(
    queries: DataFrame,
    centroids: DataFrame,
    assigned: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Search: route each query to its n_probe nearest cells (tiny
    broadcast cross-join), then exact-rescore only those cells'
    vectors. Output: query_id, neighbor_id, cosine_sim, rank."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("__qv"),
    ).withColumn("__qn", l2_norm_d("__qv"))
    # query -> n_probe candidate cells by centroid distance
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "__qv",
        "__qn",
        "cluster",
        dot_d(F.col("__qv"), F.col("centroid")).alias("__sim_c"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("__sim_c").desc(), F.col("cluster").asc()
    )
    probes = (
        qc.withColumn("__pr", F.row_number().over(wq))
        .where(F.col("__pr") <= n_probe)
        .select("query_id", "__qv", "__qn", "cluster")
    )
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("__cv"),
        "cluster",
    ).withColumn("__cn", l2_norm_d("__cv"))
    cands = c.join(F.broadcast(probes), "cluster").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(
            dot_d(F.col("__qv"), F.col("__cv"))
            / (F.col("__qn") * F.col("__cn")),
            COS_SCALE,
        ).alias("cosine_sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
