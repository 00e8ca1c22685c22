"""Product quantization (PQ) for embedding compression + ADC search.

The third rung of the ANN compression ladder (after float32 and the
int8 scalar codes in functions/similarity.py): split each vector into
M contiguous segments, learn a small per-segment codebook (KMeans over
subvectors), and store each vector as M one-byte codes — 16-dim
float64 vectors become 4 bytes at M=4, and distance evaluation never
touches the original floats.

Search uses asymmetric distance computation (ADC): for one query,
precompute dot(query_segment, centroid) for every (segment, code) —
an M x k lookup table, tiny — then a candidate's score is the SUM of
M table lookups. On Spark both halves stay DataFrames: the LUT is a
(query x segment x code) frame small enough to broadcast; the corpus
side explodes its codes once and aggregates the joined partial dots.
At 100 TB the corpus shuffle moves only (id, segment, code) longs.

Same public-knowledge design as FAISS's IVF-PQ (Jegou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011); composes with
ml/ivf.py (coarse cells) the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.functions.similarity import _to_double
from data_pipeline_mlops_spark.materialize import materialize


def _seg_len(dim: int, m: int) -> int:
    """Segment width; dim must split evenly or the trailing dim % m
    dimensions would be silently excluded from codebooks, codes, and
    every ADC score (distances quietly ignoring part of each vector)."""
    if dim % m != 0:
        raise ValueError(
            f"PQ requires dim divisible by m: dim={dim}, m={m} leaves "
            f"{dim % m} trailing dimensions unencoded — pad the vectors "
            "or pick an m that divides dim"
        )
    return dim // m


def _segments(vec_col: str, m: int, dim: int):
    """Slice a vector column into m contiguous subvectors."""
    seg_len = _seg_len(dim, m)
    return [
        F.slice(F.col(vec_col), i * seg_len + 1, seg_len).alias(f"__s{i}")
        for i in range(m)
    ]


def build_pq_codebooks(
    corpus: DataFrame,
    *,
    vec_col: str,
    dim: int,
    m: int = 4,
    k: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Learn per-segment codebooks: (segment, code, centroid).

    One KMeans fit per segment over that segment's subvectors (m small,
    fixed; each fit is a distributed job — the driver loop is over
    SEGMENTS, not data). Codebooks are tiny (m*k rows) and broadcast
    everywhere they are used. ``dim`` is the caller-declared vector
    width (schema knowledge) — passing it avoids a per-call Spark job
    probing the first row."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    segs = corpus.select(*_segments(vec_col, m, dim))
    spark = corpus.sparkSession
    rows = []
    for i in range(m):
        feats = segs.select(
            array_to_vector(_to_double(F.col(f"__s{i}"))).alias("__f")
        )
        model = KMeans(
            k=k, seed=seed + i, featuresCol="__f", predictionCol="__c"
        ).fit(feats)
        rows += [
            (i, c, [float(x) for x in centroid])
            for c, centroid in enumerate(model.clusterCenters())
        ]
    return spark.createDataFrame(
        rows, "segment int, code int, centroid array<double>"
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 4,
) -> DataFrame:
    """(id, segment, code): nearest codebook entry per segment.

    One explode to (id, segment, subvector), one broadcast join against
    the codebook, one argmin window — the corpus is touched once."""
    seg_len = _seg_len(dim, m)
    # Guard: a declared dim smaller than the real vector width would
    # silently truncate every vector (F.slice ignores trailing dims) —
    # the same silent-wrongness class the dim % m check closes. Fail
    # loudly on the first mismatched row instead.
    dim_ok = F.size(F.col(vec_col)) == dim
    checked = F.when(dim_ok, _to_double(F.col(vec_col))).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"pq_encode: declared dim={dim} but vector has "),
                F.size(F.col(vec_col)).cast("string"),
                F.lit(" dims"),
            )
        )
    )
    sub = corpus.select(
        F.col(id_col).alias("__id"), checked.alias("__v")
    ).select(
        "__id",
        F.posexplode(
            F.array(
                *[
                    F.slice("__v", i * seg_len + 1, seg_len)
                    for i in range(m)
                ]
            )
        ).alias("segment", "__sub"),
    )
    dist2 = F.aggregate(
        F.zip_with("__sub", "centroid", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = sub.join(F.broadcast(codebooks), "segment").select(
        "__id", "segment", "code", dist2.alias("__d2")
    )
    w = Window.partitionBy("__id", "segment").orderBy(
        F.col("__d2").asc(), F.col("code").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(F.col("__id").alias(id_col), "segment", "code")
    )


def pq_topk(
    queries: DataFrame,
    codebooks: DataFrame,
    encoded: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    m: int = 4,
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, adc_dot, rank).

    Scores approximate the raw DOT PRODUCT (sum of per-segment
    query·centroid). The per-query LUT (query x segment x code) is
    broadcast; the corpus side joins its (segment, code) pairs and
    sums M partials per (query, neighbor)."""
    seg_len = _seg_len(dim, m)
    qsub = queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("__v"),
    ).select(
        "query_id",
        F.posexplode(
            F.array(
                *[
                    F.slice("__v", i * seg_len + 1, seg_len)
                    for i in range(m)
                ]
            )
        ).alias("segment", "__qsub"),
    )
    dot = F.aggregate(
        F.zip_with("__qsub", "centroid", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lut = qsub.join(F.broadcast(codebooks), "segment").select(
        "query_id", "segment", "code", dot.alias("__pd")
    )
    joined = encoded.withColumnRenamed(id_col, "neighbor_id").join(
        F.broadcast(lut), ["segment", "code"]
    ).where(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.groupBy("query_id", "neighbor_id").agg(
        F.round(F.sum("__pd"), 6).alias("adc_dot"),
        F.count(F.lit(1)).alias("__m"),
    ).where(F.col("__m") == m)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dot", "rank")
    )


def ivf_pq_topk(
    queries: DataFrame,
    centroids: DataFrame,
    assigned: DataFrame,
    codebooks: DataFrame,
    encoded: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    m: int = 4,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-PQ: coarse cells prune the corpus (ml/ivf.py index), PQ
    codes score the survivors (ADC) — the standard billion-scale ANN
    composition (FAISS IVFPQ). Per query: route to n_probe cells by
    centroid dot product, restrict candidates to those cells'
    members, then the same broadcast-LUT ADC scoring as pq_topk.
    The corpus-side work is (n_probe / n_clusters) of the codes table,
    and codes are M bytes per vector — both prunings compose."""
    from data_pipeline_mlops_spark.functions.similarity import dot_d

    q = queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("__qv"),
    )
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "cluster",
        dot_d(F.col("__qv"), F.col("centroid")).alias("__sim_c"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("__sim_c").desc(), F.col("cluster").asc()
    )
    probes = (
        qc.withColumn("__pr", F.row_number().over(wq))
        .where(F.col("__pr") <= n_probe)
        .select("query_id", "cluster")
    )
    cand = (
        assigned.select(F.col(id_col).alias("neighbor_id"), "cluster")
        .join(F.broadcast(probes), "cluster")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )

    seg_len = _seg_len(dim, m)
    qsub = q.select(
        "query_id",
        F.posexplode(
            F.array(
                *[
                    F.slice("__qv", i * seg_len + 1, seg_len)
                    for i in range(m)
                ]
            )
        ).alias("segment", "__qsub"),
    )
    dot = F.aggregate(
        F.zip_with("__qsub", "centroid", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lut = qsub.join(F.broadcast(codebooks), "segment").select(
        "query_id", "segment", "code", dot.alias("__pd")
    )
    joined = (
        encoded.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(lut), ["query_id", "segment", "code"])
    )
    scored = joined.groupBy("query_id", "neighbor_id").agg(
        F.round(F.sum("__pd"), 6).alias("adc_dot"),
        F.count(F.lit(1)).alias("__m"),
    ).where(F.col("__m") == m)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dot", "rank")
    )


def lloyd_codebooks(
    corpus: DataFrame,
    seed_codebooks: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 4,
    iters: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """Deterministic fixed-iteration Lloyd's k-means over subvectors:
    trained PQ codebooks that an external SQL engine can REPLAY exactly
    (unlike pyspark.ml KMeans, whose k-means|| init is implementation-
    defined). Each iteration: argmin-assign every (id, segment,
    subvector) to its nearest codeword (squared L2, code-asc tiebreak),
    then re-center each codeword at the element-wise mean of its
    members. Determinism comes from three choices:

    - seeds are caller-provided (e.g. the subvectors of the k lowest
      ids — pure data, no RNG);
    - per-dimension means sum in DECIMAL (exact, order-independent —
      a double sum would vary with partitioning) and round to
      ``round_dp`` before re-entering double arithmetic;
    - empty codewords carry their previous centroid forward.

    Scale shape: the corpus explodes once to (id, segment, subvector)
    and is lineage-truncated; each iteration is one broadcast join +
    two aggregations — driver holds nothing but the loop counter.
    """
    seg_len = _seg_len(dim, m)
    sub = corpus.select(
        F.col(id_col).alias("__id"), _to_double(F.col(vec_col)).alias("__v")
    ).select(
        "__id",
        F.posexplode(
            F.array(
                *[F.slice("__v", i * seg_len + 1, seg_len) for i in range(m)]
            )
        ).alias("segment", "__sub"),
    ).transform(materialize)

    dist2 = F.aggregate(
        F.zip_with("__sub", "centroid", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dec = "decimal(27,10)"
    cb = seed_codebooks
    for _ in range(iters):
        scored = sub.join(F.broadcast(cb), "segment").select(
            "__id", "segment", "code", "__sub", dist2.alias("__d2")
        )
        w = Window.partitionBy("__id", "segment").orderBy(
            F.col("__d2").asc(), F.col("code").asc()
        )
        assigned = (
            scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("segment", "code", "__sub")
        )
        dim_means = (
            assigned.select(
                "segment", "code",
                F.posexplode("__sub").alias("pos", "val"),
            )
            .groupBy("segment", "code", "pos")
            .agg(
                F.round(
                    F.sum(F.col("val").cast(dec)).cast("double")
                    / F.count(F.lit(1)),
                    round_dp,
                ).alias("mv")
            )
        )
        recentered = dim_means.groupBy("segment", "code").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                lambda s: s["mv"],
            ).alias("__new")
        )
        cb = (
            cb.join(recentered, ["segment", "code"], "left")
            .select(
                "segment",
                "code",
                F.coalesce(F.col("__new"), F.col("centroid")).alias(
                    "centroid"
                ),
            )
            .transform(materialize)
        )
    return cb
