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
    reproducibility for a given dataset. Skew posture: because the
    rank filter sits directly above the window, Spark 4 plans a
    `WindowGroupLimit ... Partial` BELOW the exchange (verified:
    plans/r13/stratified_fixed_sample_windowgrouplimit.txt), so at
    most n rows per stratum per map task are shuffled and the
    reduce-side per-stratum sort is bounded by n x #map-tasks — a
    dominant stratum cannot become a single-task straggler sort (the
    map-side sort runs per input split, evenly)."""
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


def systematic_pps_sample(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
    method: str = "md5",
) -> DataFrame:
    """Weighted sampling proportional to size (PPS) by SYSTEMATIC
    selection over an integer cumulative-weight axis — fully
    integer-exact, so the selection is identical on any engine and any
    partitioning (no float thresholds, unlike exponential-key A-ES).

    Rows are laid on a deterministic axis ordered by (hash(id, seed),
    id); a row occupying cumulative interval (cum - w, cum] is picked
    ``n_picks = (cum*k) div total - ((cum-w)*k) div total`` times —
    i.e. once per multiple of total/k its interval covers. Every row
    with w > total/k is guaranteed selected (possibly multiply);
    expected picks are exactly k * w / total.

    Scale shape: the global prefix sum is NOT a single-partition
    window. The hash's top 8 bits split the axis into 256 ranges
    (bucket order == hash order, so concatenated ranges reproduce the
    global order); each range cumsums independently under
    ``Window.partitionBy(bucket)``, then a 256-row offset table —
    cumulated driver-free in one tiny window — broadcasts back. The
    wide exchange is one hash-range shuffle of (id, weight), never the
    payload.

    Overflow bound: cum * k must stay below 2^63 — total_weight * k
    < 9.2e18 (a 2.5e13-token corpus supports k up to ~360k; raise to
    decimal(38,0) arithmetic past that).

    Rows with weight <= 0 are dropped (they own no interval).
    """
    from pyspark.sql import Window

    w_long = F.col(weight_col).cast("long")
    base = (
        df.where(w_long > 0)
        .withColumn("__w", w_long)
        .withColumn("__h", _keep_hash(id_col, seed, method))
        .withColumn("__b", F.shiftright(F.col("__h"), 52))
    )
    in_bucket = Window.partitionBy("__b").orderBy(
        F.col("__h").asc(), F.col(id_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = base.withColumn("__local_cum", F.sum("__w").over(in_bucket))

    btot = base.groupBy("__b").agg(F.sum("__w").alias("__btot"))
    off_w = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = btot.select(
        "__b",
        F.coalesce(F.sum("__btot").over(off_w), F.lit(0)).alias("__off"),
    )
    total = base.agg(F.sum("__w").cast("long").alias("__total"))

    cum = F.col("__off") + F.col("__local_cum")
    picked = (
        local.join(F.broadcast(offsets), "__b")
        .crossJoin(F.broadcast(total))
        .withColumn("__cum", cum.cast("long"))
        .withColumn(
            "n_picks",
            (
                F.expr(f"(__cum * {k}) DIV __total")
                - F.expr(f"((__cum - __w) * {k}) DIV __total")
            ).cast("long"),
        )
        .where(F.col("n_picks") >= 1)
    )
    return picked.select(
        *df.columns,
        F.col("__cum").alias("cum_weight"),
        F.col("n_picks"),
    )
