"""Keyword retrieval over the corpus: BM25 ranking on top of the
inverted-index statistics (term_postings is the stored form; this
computes the query-time join).

Reference parity: the reference has no search path; this extends the
text-analysis tier (SURVEY.md LLM-ops) with the standard ranking
function a corpus-curation pipeline uses for query-based subset
selection (e.g. "pull the docs most about X for domain mixing").

Scale shape (100 TB): the query-term filter lands IMMEDIATELY after
the token explode, so the relation that shuffles is
O(|query| x matching docs), never the full posting list; document
length comes from `F.size` on the token array (no second explode);
corpus constants (N, avgdl) are a 1-row broadcast. The only wide
exchange is the per-doc score sum, keyed on the doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.functions import text


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25
    (Robertson/Sparck-Jones idf with the +1 smoothing Lucene uses:
    idf = ln(1 + (N - df + 0.5)/(df + 0.5))).

    Output: (doc_id, n_terms_matched, score, rank) with score rounded
    to 6 dp and rank tiebroken on doc_id — the registry's determinism
    discipline for LN-derived doubles (same as doc_tfidf).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        text.tokens(text_col).alias("toks"),
    ).withColumn("dl", F.size("toks").cast("long"))

    stats = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    )

    tf = (
        toks.select("doc_id", "dl", F.explode("toks").alias("term"))
        .where(F.col("term").isin(query_terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )

    n = F.col("n_docs").cast("double")
    avgdl = F.col("total_dl").cast("double") / n
    idf = F.log(
        F.lit(1.0)
        + (n - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    part = idf * (
        tf_d
        * F.lit(k1 + 1.0)
        / (tf_d + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl_d / avgdl))
    )

    rows = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("part", part)
    )
    # Fixed-order addition over the (bounded) query vocabulary instead
    # of SUM(double): float addition is not associative, so an unordered
    # SUM's value depends on partitioning; adding the per-term
    # components in list order is bit-reproducible on any engine.
    comps = [
        F.coalesce(
            F.max(F.when(F.col("term") == t, F.col("part"))), F.lit(0.0)
        ).alias(f"__p{i}")
        for i, t in enumerate(query_terms)
    ]
    g = rows.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_matched"), *comps
    )
    total = F.lit(0.0)
    for i in range(len(query_terms)):
        total = total + F.col(f"__p{i}")
    scored = g.select(
        "doc_id", "n_terms_matched", F.round(total, 6).alias("score")
    )
    # TakeOrderedAndProject does the global top-k (no single-partition
    # window over the full per-doc relation); the rank window then runs
    # over k rows only.
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(
        k
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select("doc_id", "n_terms_matched", "score", "rank")


def rrf_fuse(
    sparse: DataFrame,
    dense: DataFrame,
    *,
    id_col: str = "doc_id",
    sparse_rank: str = "bm25_rank",
    dense_rank: str = "vec_rank",
    k0: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of a keyword leg and a vector leg
    (Cormack et al., the standard hybrid-retrieval combiner):
    score(d) = Σ_legs 1/(k0 + rank_leg(d)), a doc missing from a leg
    contributes 0. Each input carries (id_col, <rank col>).

    Determinism: the two reciprocal terms are IEEE doubles divided
    from exact integers and added in a FIXED order (sparse + dense),
    so every engine reproduces the score bit-for-bit; final ordering
    ties break on the id. The fused relation is at most
    |sparse| + |dense| rows (two top-k lists), so the global
    row_number window is bounded by construction — never corpus-sized.
    """
    fused = sparse.join(dense, id_col, "full_outer")
    # Rank on the UNROUNDED double: rounding-before-rank collapsed
    # RRF scores closer than 1e-6 into id-ordered ties (and exposed
    # Spark-vs-oracle half-ulp rounding differences to the ORDER).
    # The fixed-order sum is already bit-deterministic, so the rank
    # is exact; only the reported score is rounded for display.
    raw = F.coalesce(
        F.lit(1.0) / (F.lit(k0) + F.col(sparse_rank)), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(k0) + F.col(dense_rank)), F.lit(0.0)
    )
    w = Window.orderBy(F.col("__rrf_raw").desc(), F.col(id_col).asc())
    return (
        fused.withColumn("__rrf_raw", raw)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_k)
        .withColumn("rrf_score", F.round(F.col("__rrf_raw"), 6))
        .select(id_col, sparse_rank, dense_rank, "rrf_score", "rank")
    )
