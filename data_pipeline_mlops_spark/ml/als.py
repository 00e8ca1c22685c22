"""ALS matrix-factorization recommender — the Spark ML *Pipeline* tier.

Factorization twin of the item-item cosine tier (ml/cf.py): same M1
interactions in, same output contract (user, item, score, rank) with
owned-item masking, different model family. The reference's recommender
is item-item cosine over a densified matrix
(reference dags/daily_pipeline.py:361-398, 506-524); this tier adds the
factorization-based alternative the north star's "Spark ML pipelines"
phrase names, as a real `pyspark.ml.Pipeline`
(StringIndexer -> StringIndexer -> ALS) so the fitted artifact carries
its own id mappings and is `PipelineModel.save`-portable.

Scale shape
-----------
- Training: `ALS(implicitPrefs=True)` is the Hu/Koren/Volinsky implicit
  feedback formulation (ICDM 2008). Spark ML's solver is blocked
  alternating least squares over the sparse interaction blocks — the
  dense user x item matrix is never formed, and each normal-equation
  solve is rank x rank. Cost per iteration is O(nnz * rank^2 / cluster).
- Serving: `recommendForUserSubset(users, n + B)` computes blocked
  factor top-k products (JVM BLAS, no Python in the loop). B bounds the
  per-user owned-item count, so after the ownership anti-join (the
  reference's scores[idx] = -999 masking, same operator as
  cf.recommend) at least n candidates survive for every user — masking
  can remove at most B rows. The re-rank window then trims to top-n.
- StringIndexer holds the distinct user/item label arrays on the
  driver; that is inherent to the indexer (and fine for catalog-sized
  id spaces). For an id space too large for the driver, skip the
  indexers and feed ALS int32 ids directly — `train_als` accepts
  `index=False` for exactly that path.

Determinism
-----------
The seed is pinned, but an ALS solution varies with partitioning and
thread schedule (float reduction order inside the per-block solves), so
this tier is rows/schema-checked rather than value-hashed: registry
`recommendations_als` carries no DuckDB oracle (DuckDB could not replay
the iterative solver anyway), and quality is gated by the eval-harness
test instead — coverage + precision@10 via ml/evaluate.py pinned to a
band around the item-item tier on the deterministic fixture
(tests/test_ml.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _require_ml():
    from pyspark.ml import Pipeline  # noqa: F401
    from pyspark.ml.feature import StringIndexer  # noqa: F401
    from pyspark.ml.recommendation import ALS  # noqa: F401

    return Pipeline, StringIndexer, ALS


def train_als(
    interactions: DataFrame,
    *,
    user_col: str,
    item_col: str,
    rank: int = 16,
    max_iter: int = 10,
    reg_param: float = 0.1,
    alpha: float = 1.0,
    seed: int = 42,
    index: bool = True,
):
    """Fit the StringIndexer->StringIndexer->ALS pipeline on binary
    implicit interactions (every observed pair gets rating 1.0 — the
    same 0/1 matrix the cosine tier factorizes exactly).

    Returns a fitted ``PipelineModel`` (``index=True``) or a bare
    ``ALSModel`` (``index=False``, ids must already be int32-safe).
    """
    Pipeline, StringIndexer, ALS = _require_ml()
    rated = interactions.select(
        F.col(user_col), F.col(item_col), F.lit(1.0).alias("rating")
    )
    if index:
        stages = [
            StringIndexer(
                inputCol=user_col, outputCol="__user_idx",
                stringOrderType="alphabetDesc",
            ),
            StringIndexer(
                inputCol=item_col, outputCol="__item_idx",
                stringOrderType="alphabetDesc",
            ),
            ALS(
                userCol="__user_idx", itemCol="__item_idx",
                ratingCol="rating", rank=rank, maxIter=max_iter,
                regParam=reg_param, alpha=alpha, seed=seed,
                implicitPrefs=True, coldStartStrategy="drop",
            ),
        ]
        return Pipeline(stages=stages).fit(rated)
    als = ALS(
        userCol=user_col, itemCol=item_col, ratingCol="rating",
        rank=rank, maxIter=max_iter, regParam=reg_param, alpha=alpha,
        seed=seed, implicitPrefs=True, coldStartStrategy="drop",
    )
    return als.fit(rated)


def _label_map(spark, labels: list[str], out_col: str, cast_to: str):
    """Broadcast-sized (index -> original id) mapping frame from a
    fitted StringIndexer's label array."""
    rows = [(float(i), lab) for i, lab in enumerate(labels)]
    df = spark.createDataFrame(rows, "__idx double, __label string")
    return df.select(
        F.col("__idx"), F.col("__label").cast(cast_to).alias(out_col)
    )


def recommend_als(
    model,
    purchases: DataFrame,
    *,
    user_col: str,
    item_col: str,
    top_n: int = 10,
    owned_bound: int | None = None,
) -> DataFrame:
    """Top-``top_n`` un-owned recommendations per user appearing in
    ``purchases``, from a fitted ``train_als`` model — either the
    ``index=True`` PipelineModel (ids round-trip through the fitted
    StringIndexer labels) or the ``index=False`` bare ``ALSModel``
    (ids served in their native int type; the escape hatch for id
    spaces too large for driver-side indexer labels — VERDICT r11 #3).

    Output: ``(user_col, item_col, score, rank)`` — the cf.recommend
    contract in both paths. ``owned_bound`` is the per-user owned-item
    bound B used to over-request ``top_n + B`` before masking; when
    None it is computed with one scalar aggregate over ``purchases``.
    """
    spark = purchases.sparkSession
    indexed = hasattr(model, "stages")
    if indexed:
        u_idx, i_idx, als_model = model.stages
        idx = i_idx.transform(u_idx.transform(purchases)).select(
            "__user_idx", "__item_idx"
        ).distinct()
    else:
        als_model = model
        idx = purchases.select(
            F.col(user_col).cast("long").alias("__user_idx"),
            F.col(item_col).cast("long").alias("__item_idx"),
        ).distinct()
    if owned_bound is None:
        # 1-row scalar: the basket-size bound that sizes the
        # over-request; bounded output by construction.
        owned_bound = idx.groupBy("__user_idx").count().agg(
            F.max("count")
        ).collect()[0][0] or 0
    users = idx.select("__user_idx").distinct()
    if not indexed:
        # the bare model's userCol is the native column name
        users = users.withColumnRenamed("__user_idx", user_col)
    recs = als_model.recommendForUserSubset(users, top_n + int(owned_bound))
    ucol_out = "__user_idx" if indexed else user_col
    icol_out = "__item_idx" if indexed else item_col
    key_t = "double" if indexed else "long"
    flat = recs.select(
        F.col(ucol_out).cast(key_t).alias("__user_idx"),
        F.explode("recommendations").alias("__r"),
    ).select(
        "__user_idx",
        F.col(f"__r.{icol_out}").cast(key_t).alias("__item_idx"),
        F.col("__r.rating").cast("double").alias("score"),
    )
    masked = flat.join(idx, ["__user_idx", "__item_idx"], "left_anti")
    w = Window.partitionBy("__user_idx").orderBy(
        F.col("score").desc(), F.col("__item_idx").asc()
    )
    top = (
        masked.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
    )
    u_type = dict(
        (f.name, f.dataType.simpleString()) for f in purchases.schema.fields
    )
    if not indexed:
        return top.select(
            F.col("__user_idx").cast(u_type[user_col]).alias(user_col),
            F.col("__item_idx").cast(u_type[item_col]).alias(item_col),
            "score",
            "rank",
        )
    user_map = _label_map(
        spark, list(u_idx.labelsArray[0]), user_col, u_type[user_col]
    ).withColumnRenamed("__idx", "__user_idx")
    item_map = _label_map(
        spark, list(i_idx.labelsArray[0]), item_col, u_type[item_col]
    ).withColumnRenamed("__idx", "__item_idx")
    return (
        top.join(F.broadcast(user_map), "__user_idx")
        .join(F.broadcast(item_map), "__item_idx")
        .select(user_col, item_col, "score", "rank")
    )


def similar_items_als(
    model,
    *,
    item_col: str,
    item,
    top_n: int = 10,
    item_type: str = "string",
) -> DataFrame:
    """M8's factorization twin: top-``top_n`` most similar items to
    one anchor by cosine over the fitted ALS item factors
    (cf.similar_items is the co-occurrence twin — same serving
    endpoint, reference recommendation/main.py:193-221, different
    model family). The factor table is (items x rank) — corpus-sized
    in rows but rank-wide, and the anchor side is one broadcast row,
    so this is a single streaming pass over the factors (the same
    shape functions/similarity.py::brute_force_topk locks in)."""
    from data_pipeline_mlops_spark.functions.similarity import (
        brute_force_topk,
    )

    u_idx, i_idx, als_model = model.stages
    labels = list(i_idx.labelsArray[0])
    spark = als_model.itemFactors.sparkSession
    item_map = _label_map(spark, labels, item_col, item_type).select(
        F.col("__idx").cast("long").alias("__iid"), F.col(item_col)
    )
    # Resolve the anchor by comparing in the id's NATIVE type on the
    # label-array-sized map (ADVICE r11): a driver-side
    # labels.index(str(item)) was an O(|items|) scan per call AND
    # silently mismatched non-integer id types (Python str(1.0) vs
    # the string StringIndexer derived from the Spark cast). The map
    # frame already casts each label back through item_type, so
    # Spark's own coercion rules decide equality.
    anchor_ids = [
        r["__iid"]
        for r in item_map.where(F.col(item_col) == F.lit(item))
        .select("__iid")
        .collect()
    ]
    if len(anchor_ids) != 1:
        raise ValueError(
            f"unknown or ambiguous item {item!r} "
            f"({len(anchor_ids)} label matches)"
        )
    anchor_idx = anchor_ids[0]
    factors = als_model.itemFactors.select(
        F.col("id").cast("long").alias("__iid"),
        F.col("features").alias("__vec"),
    )
    topk = brute_force_topk(
        factors.where(F.col("__iid") == anchor_idx),
        factors,
        id_col="__iid",
        vec_col="__vec",
        k=top_n,
    )
    return (
        topk.join(F.broadcast(item_map), topk.neighbor_id == item_map.__iid)
        .select(
            F.lit(item).alias("item"),
            F.col(item_col).alias("similar_item"),
            F.col("cosine_sim"),
            F.col("rank"),
        )
    )
