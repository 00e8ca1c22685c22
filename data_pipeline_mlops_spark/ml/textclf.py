"""Label-conditional token-frequency text classifier.

The lightweight corpus-labeling stage of a training-data pipeline
(CCNet / fastText-style "which bucket does this page belong to"):
train per-label token statistics on a labeled slice, score every
document by how strongly its tokens co-occur with each label, take the
argmax. This is the linear-frequency member of the naive-Bayes family:
where multinomial NB scores ``sum_t m_t * log P(t|label)``, this
scores ``sum_t m_t * count(t,label) / tokens(label)`` — the same
monotone "does this doc reuse the label's vocabulary" signal without
logarithms. The log-free form is deliberate: counts stay exact BIGINTs
and the ONE floating-point operation per (doc,label) is a single
division of two exact integers, which IEEE 754 rounds identically in
every engine — so the DuckDB oracle hash-matches bit-for-bit, the same
discipline as functions/text.py::char_bigram_lm_score (log-prob NB
cannot guarantee that: ``ln`` is not correctly-rounded and differs
between JVM and libm by ULPs).

Scale shape: training is one groupBy over exploded train-set tokens
(map-side partial aggregation; model size = |vocab| x |labels| rows,
independent of corpus size). Scoring joins per-occurrence tokens to
the model on the token key — one hash shuffle each side, no window
over the corpus, no driver state, no UDF. The argmax is a per-doc
window over |labels| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.functions.text import tokens


def _occurrences(df: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    return df.select(
        *id_cols, F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    ).where(F.col("token") != "")


def train_token_frequency_model(
    train_df: DataFrame,
    *,
    label_col: str = "label",
    text_col: str = "text",
) -> DataFrame:
    """Per-(token, label) occurrence counts plus the label's total
    token count: columns (token, label, token_label_count BIGINT,
    label_tokens BIGINT). One shuffle on (token, label), one tiny
    broadcast-sized per-label total joined back."""
    occ = _occurrences(train_df, [label_col], text_col)
    tl = occ.groupBy("token", F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("token_label_count")
    )
    totals = tl.groupBy("label").agg(
        F.sum("token_label_count").alias("label_tokens")
    )
    return tl.join(F.broadcast(totals), "label").select(
        "token", "label", "token_label_count", "label_tokens"
    )


def classify(
    docs: DataFrame,
    model: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against every label it shares vocabulary
    with and keep the argmax. Output: (id_col, pred_label,
    matched_tokens BIGINT, score_num BIGINT, score DOUBLE) where
    score = score_num / label_tokens — ties break on label ascending,
    deterministically. Documents sharing no vocabulary with any label
    are absent from the output (no evidence, no verdict)."""
    occ = _occurrences(docs, [id_col], text_col)
    scored = (
        occ.join(model, "token")
        .groupBy(id_col, "label", "label_tokens")
        .agg(
            F.count(F.lit(1)).alias("matched_tokens"),
            F.sum("token_label_count").alias("score_num"),
        )
        .withColumn(
            "score",
            F.col("score_num").cast("double")
            / F.col("label_tokens").cast("double"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("label")
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(
            id_col,
            F.col("label").alias("pred_label"),
            "matched_tokens",
            "score_num",
            "score",
        )
    )
