"""Corpus mixture scheduling: hit a target per-stratum token mixture
by replicating (multi-epoch) or hash-downsampling each stratum.

Training recipes (LLaMA, GPT-3, Dolma cards) specify the corpus as
per-source WEIGHTS over a token BUDGET — "books 4.5%, web 82%, ..." —
not as row filters. Turning that into a concrete dataset means, per
stratum s with A_s available tokens and target T_s = w_s * budget:
take floor(T_s / A_s) full epochs of s, plus a (T_s mod A_s) / A_s
fractional epoch. This module computes that plan as integer
arithmetic (parts-per-million, no float drift between engines) and
materializes it deterministically:

- full epochs are an ``explode(sequence(...))`` against a broadcast
  plan row — map-side, no shuffle, stable under repartitioning;
- the fractional epoch is a hash gate on the document id (same
  md5-60 / xxhash64 discipline as operators/sample.py), so the
  sampled subset is a property of the data, not the execution, and
  survives incremental appends.

At 100 TB the plan side is |strata| rows (broadcast) and scheduling
is a single map-side projection over the corpus scan; the only
aggregation is the per-stratum token sum that sizes the plan.

Semantics reference: the reference pipeline has no mixture stage
(dags/daily_pipeline.py consumes one source whole); this is a
north-star training-data operator per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.functions.dedup_text import _md5_60

PPM = 1_000_000


def mixture_plan(
    docs: DataFrame,
    *,
    strata_col: str,
    token_col: str,
    weights_ppm: dict[str, int],
    budget_tokens: int,
) -> DataFrame:
    """Per-stratum schedule: available tokens, integer target, full
    epochs, and the fractional-epoch keep rate in ppm.

    ``weights_ppm`` maps stratum value -> parts-per-million of the
    budget; strata absent from the map get weight 0 (excluded). All
    arithmetic is int64 floor division — exactly reproducible in any
    engine, monotone in the budget.
    """
    if sum(weights_ppm.values()) > PPM:
        raise ValueError("mixture weights exceed 1.0 (ppm sum > 1e6)")
    weight = F.lit(0)
    for value, ppm in sorted(weights_ppm.items()):
        weight = F.when(
            F.col(strata_col) == value, F.lit(int(ppm))
        ).otherwise(weight)
    avail = (
        docs.groupBy(strata_col)
        .agg(F.sum(F.col(token_col)).cast("long").alias("available_tokens"))
        .withColumn("weight_ppm", weight.cast("long"))
    )
    target = (F.col("weight_ppm") * F.lit(int(budget_tokens))) / F.lit(PPM)
    target = F.floor(target).cast("long")
    return (
        avail.withColumn("target_tokens", target)
        .withColumn(
            "epochs_full",
            F.floor(
                F.col("target_tokens") / F.col("available_tokens")
            ).cast("long"),
        )
        .withColumn(
            "frac_ppm",
            F.floor(
                (F.col("target_tokens") % F.col("available_tokens"))
                * F.lit(PPM)
                / F.col("available_tokens")
            ).cast("long"),
        )
    )


def schedule_mixture(
    docs: DataFrame,
    plan: DataFrame,
    *,
    id_col: str,
    strata_col: str,
    seed: int = 42,
    method: str = "md5",
) -> DataFrame:
    """Materialize the plan: each document appears ``epochs_full``
    times (epoch = 0..epochs_full-1) plus once more at
    epoch = epochs_full iff hash(id, seed) % 1e6 < frac_ppm.

    The plan is broadcast (|strata| rows); replication is a map-side
    explode; the fractional gate reuses the id-hash discipline so the
    fractional subset is stable under re-runs and appends. Output
    keeps every input column plus ``epoch``.
    """
    key = F.concat_ws(
        "|", F.col(id_col).cast("string"), F.lit(str(seed))
    )
    if method == "md5":
        gate = _md5_60(key) % PPM
    elif method == "xxhash64":
        gate = F.pmod(F.xxhash64(key), F.lit(PPM))
    else:
        raise ValueError(f"unknown hash method: {method}")
    joined = docs.join(
        F.broadcast(
            plan.select(strata_col, "epochs_full", "frac_ppm")
        ),
        on=strata_col,
        how="inner",
    )
    return (
        joined.withColumn(
            "epoch",
            F.explode(F.sequence(F.lit(0), F.col("epochs_full"))),
        )
        .where(
            (F.col("epoch") < F.col("epochs_full"))
            | (gate < F.col("frac_ppm"))
        )
        .drop("epochs_full", "frac_ppm")
    )


def temperature_weights(
    docs: DataFrame,
    *,
    strata_col: str,
    token_col: str,
    scale: int = 1000,
) -> DataFrame:
    """Temperature-scaled mixture weights, tau = 1/2: per stratum s
    with n_s available tokens, weight w_s proportional to sqrt(n_s) —
    the multilingual sampling rule (XLM-R / mBERT style, p_i^tau with
    tau in (0,1]) that upweights low-resource strata relative to
    their raw share. Output: (stratum, available_tokens, weight_ppm)
    with sum(weight_ppm) <= 1e6 — feed straight into the ppm plan
    arithmetic (mixture_plan's columns / schedule_mixture).

    Why tau is FIXED at 1/2: IEEE-754 specifies sqrt as correctly
    rounded, so floor(sqrt(n)*scale) is the IDENTICAL int64 on every
    engine — a general pow(n, tau) is not correctly rounded and a
    1-ulp cross-engine wobble could flip a ppm floor. Everything
    downstream of the scaled sqrt is exact integer arithmetic. Other
    temperatures come from composing: tau=1/4 is sqrt(sqrt(n)) (two
    correctly-rounded ops), tau=3/4 is sqrt(n)*sqrt(sqrt(n)) — stay
    on the sqrt lattice for engine-portable weights.

    Scale shape: one groupBy(|strata| rows) then an unpartitioned
    window over those |strata| rows — bounded by the stratum
    cardinality (a dimension, never data-scale), the same bounded-
    window adjudication as the calendar grids."""
    from pyspark.sql import Window

    avail = docs.groupBy(strata_col).agg(
        F.sum(F.col(token_col)).cast("long").alias("available_tokens")
    )
    sq = F.floor(
        F.sqrt(F.col("available_tokens").cast("double")) * F.lit(int(scale))
    ).cast("long")
    w = Window.partitionBy()  # |strata| rows by construction
    return (
        avail.withColumn("__sq", sq)
        .withColumn("__total", F.sum("__sq").over(w))
        .withColumn(
            # int64 `div`, not floor(double /): at 100 TB token sums
            # the numerator (~sqrt(1e14)*1e3*1e6 = 1e16) exceeds 2^53
            # and a double quotient would round before the floor
            "weight_ppm",
            F.expr("__sq * CAST(1000000 AS BIGINT) div __total").cast(
                "long"
            ),
        )
        .drop("__sq", "__total")
    )
