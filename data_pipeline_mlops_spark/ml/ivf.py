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


def assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Assign vectors to their nearest EXISTING centroid — the
    incremental-append path (no refit). Broadcast cross-join against
    the tiny centroid table, squared-L2 via the deterministic
    dot/norm kernels, ties broken by lowest cluster id (total order,
    partition-invariant). One map-side pass at any corpus size."""
    v = vectors.select(
        F.col(id_col), F.col(vec_col),
        _to_double(F.col(vec_col)).alias("__v"),
    )
    c = centroids.select("cluster", F.col("centroid").alias("__c"))
    d2 = (
        dot_d(F.col("__v"), F.col("__v"))
        - F.lit(2.0) * dot_d(F.col("__v"), F.col("__c"))
        + dot_d(F.col("__c"), F.col("__c"))
    )
    w = Window.partitionBy(id_col).orderBy(
        d2.asc(), F.col("cluster").asc()
    )
    return (
        v.crossJoin(F.broadcast(c))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, vec_col, "cluster")
    )


class IvfIndex:
    """Persisted, incrementally-maintained IVF-Flat index — the ANN
    twin of the incremental dedup index (streaming/dedup_stream.py):
    centroids are fit ONCE at bootstrap; appends assign new vectors to
    existing cells and commit only the touched cell partitions;
    searches read only the probed cells via manifest-level partition
    pruning. Cell-balance decays as the corpus drifts from the
    bootstrap distribution — re-bootstrap (or re-fit centroids on a
    sample and re-assign, one job) when recall degrades; the
    `fragmentation()` counter says when to compact appended slivers.
    """

    def __init__(self, base_dir: str) -> None:
        from data_pipeline_mlops_spark.sources.txn import ManifestTable

        self.centroids_t = ManifestTable(f"{base_dir}/centroids")
        self.codes_t = ManifestTable(f"{base_dir}/codes")

    def bootstrap(
        self,
        corpus: DataFrame,
        *,
        id_col: str,
        vec_col: str,
        n_clusters: int = 16,
        seed: int = 42,
    ) -> None:
        centroids, assigned = build_ivf_index(
            corpus, id_col=id_col, vec_col=vec_col,
            n_clusters=n_clusters, seed=seed,
        )
        self.centroids_t.commit(centroids, mode="replace_all")
        self.codes_t.commit(
            assigned, partition_col="cluster", mode="replace_all"
        )

    def append(
        self, vectors: DataFrame, *, id_col: str, vec_col: str
    ) -> int:
        spark = vectors.sparkSession
        assigned = assign_to_centroids(
            vectors, self.centroids_t.read(spark),
            id_col=id_col, vec_col=vec_col,
        )
        return self.codes_t.commit(
            assigned, partition_col="cluster", mode="append"
        )

    def search(
        self,
        queries: DataFrame,
        *,
        id_col: str,
        vec_col: str,
        k: int = 5,
        n_probe: int = 4,
    ) -> DataFrame:
        spark = queries.sparkSession
        return ivf_topk(
            queries,
            self.centroids_t.read(spark),
            self.codes_t.read(spark),
            id_col=id_col,
            vec_col=vec_col,
            k=k,
            n_probe=n_probe,
        )
