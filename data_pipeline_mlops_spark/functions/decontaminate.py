"""Train/eval decontamination: flag held-out documents whose n-grams
leak from the training split.

Benchmark contamination is the canonical LLM training-data hazard: an
eval document sharing long n-grams with any training document inflates
measured quality. The standard check (n-gram overlap, as in GPT-3 /
The Pile decontamination write-ups) is a set intersection at corpus
scale — exactly the shape Spark does well:

  train side: distinct shingles only (one shuffle, heavily compressed
  by distinct — boilerplate collapses);
  eval side:  (doc, shingle) rows;
  overlap:    inner join on shingle + count per eval doc. The join is
  shuffle-on-shingle — both sides partition by the same key, no
  all-pairs anything, and the train side can be bucketed/persisted
  once and reused across eval sets.

Split membership is the same deterministic md5 predicate as
ml.interactions.split_side_md5 (60-bit md5 int < frac * 2^60), so
membership itself is engine-portable and oracle-checkable — replays
and repartitioning cannot move a doc across the split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.functions.dedup_text import (
    _md5_60,
    shingle_rows,
)


def split_flag(
    df: DataFrame, *, id_col: str, eval_frac: float, seed: int = 42
) -> DataFrame:
    """Add boolean ``is_eval`` via the portable md5 predicate."""
    threshold = int(eval_frac * (2**60))
    key = F.concat_ws("|", F.col(id_col).cast("string"), F.lit(str(seed)))
    return df.withColumn("is_eval", _md5_60(key) < threshold)


def ngram_overlap(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str = "text",
    n: int = 5,
    eval_frac: float = 0.2,
    seed: int = 42,
) -> DataFrame:
    """Per EVAL doc: distinct n-grams shared with the train split.

    Returns (id, n_shingles, n_shared, contaminated) for every eval
    doc — n_shingles = the doc's own distinct shingle count,
    n_shared = how many of those occur anywhere in train,
    contaminated = n_shared > 0. Eval docs too short to have any
    n-gram report 0 / not contaminated.
    """
    flagged = split_flag(docs, id_col=id_col, eval_frac=eval_frac,
                         seed=seed)
    ev = flagged.where(F.col("is_eval"))
    tr = flagged.where(~F.col("is_eval"))

    train_shingles = (
        shingle_rows(tr, id_col=id_col, text_col=text_col, n=n)
        .select("shingle")
        .distinct()
    )
    eval_shingles = shingle_rows(ev, id_col=id_col, text_col=text_col, n=n)

    shared = (
        eval_shingles.join(train_shingles, "shingle")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    own = eval_shingles.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    return (
        ev.select(F.col(id_col).alias("__id"))
        .join(own, "__id", "left")
        .join(shared, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
    )
