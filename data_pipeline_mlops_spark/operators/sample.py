"""Deterministic stratified sampling: per-stratum keep rates driven by
a portable hash of the row id.

Corpus rebalancing (downsample the dominant language / source, keep
the rare strata whole) must be REPRODUCIBLE at 100 TB: `df.sample()`
seeds per-partition, so adding one input file reshuffles every
decision. Hash-gating each row on a pure function of its id makes the
sample a property of the DATA, not the execution: stable under
repartitioning, re-runs, and incremental appends — the same invariant
the split/dedup operators guarantee. Map-side only: no shuffle, no
state; the filter pushes straight onto the scan.

The hash is the md5-60 twin (engine-portable, oracle-checkable);
production can swap xxhash64 via ``method`` exactly like
ml.interactions.split_train_eval.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.functions.dedup_text import _md5_60

_SCALE = 2**60


def _keep_hash(id_col: str, seed: int, method: str) -> Column:
    key = F.concat_ws("|", F.col(id_col).cast("string"), F.lit(str(seed)))
    if method == "md5":
        return _md5_60(key)
    if method == "xxhash64":
        # fold to the same non-negative 60-bit range
        return F.pmod(F.xxhash64(key), F.lit(_SCALE))
    raise ValueError(f"unknown hash method: {method}")


def stratified_fixed_sample(
    df: DataFrame,
    *,
    id_col: str,
    strata_col: str,
    n_per_stratum: int,
    seed: int = 42,
    method: str = "md5",
) -> DataFrame:
    """EXACTLY min(n, stratum size) rows per stratum, deterministically:
    rank rows within each stratum by hash(id, seed) (id tiebreak) and
    keep the first n — a derandomized reservoir sample. Unlike the
    rate-based gate, adding data CAN rotate members in/out (the rank
    frontier moves); what is guaranteed is exact counts and
    reproducibility for a given dataset. The shuffle is one window over
    (stratum) — fine while strata are few; salt the stratum if one
    stratum dominates."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        _keep_hash(id_col, seed, method).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= n_per_stratum)
        .drop("__rank")
    )


def stratified_sample(
    df: DataFrame,
    *,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    seed: int = 42,
    method: str = "md5",
) -> DataFrame:
    """Keep each row iff hash(id, seed) < rate(stratum) * 2^60.

    ``rates`` maps stratum value -> keep fraction in [0, 1]; strata not
    listed use ``default_rate``. Expected (not exact) per-stratum
    counts — exact-count sampling needs a global sort/rank and is a
    different operator (see top-k); expected-rate is what survives
    incremental data.
    """
    threshold = F.lit(int(default_rate * _SCALE))
    for value, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(rate * _SCALE))
        ).otherwise(threshold)
    return df.where(_keep_hash(id_col, seed, method) < threshold)
