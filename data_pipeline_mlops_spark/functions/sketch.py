"""Mergeable frequency / membership sketches as DataFrame algebra:
count-min (heavy-hitter frequency estimates) and Bloom filters
(membership pre-joins).

Both sketches are FIXED-SIZE aggregations regardless of input scale —
the 100 TB story is that the shuffle reduces to depth*width (CMS) or
n_words (Bloom) rows via map-side partial aggregation, after which the
sketch is broadcast for lookups. Both are deterministic pure SQL over
the engine's portable md5-60 hash (functions/dedup_text.py), so unlike
approx_count_distinct (HLL++) the sketch CONTENTS are oracle-checkable
bit-for-bit in DuckDB, the same adjudication as the KMV sketch
(registry ``distinct_users_kmv``).

Count-min (Cormode & Muthukrishnan 2005): depth d rows of width w
counters; est(x) = min_i counter[i][h_i(x)] >= true count, with the
overestimate bounded by collisions. Bloom (1970): k bit positions per
key OR-ed into a bit array; membership test has no false negatives.
Bits pack 63 per int64 word — the sign bit stays clear so every shift
is portable (DuckDB raises on 1<<63).

Reference parity: the reference has no sketch tier (eager pandas
counts everything exactly); these are north-star scale operators per
the build brief, mirroring what its dashboards would need at volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.functions.dedup_text import _md5_60

BITS_PER_WORD = 63


def _hash_mod(key: Column, salt: str, mod: int) -> Column:
    """Portable uniform hash of (key, salt) into [0, mod)."""
    return _md5_60(F.concat_ws("|", key.cast("string"), F.lit(salt))) % mod


def cms_build(
    df: DataFrame, key_col: str, *, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch of the key column's frequency distribution:
    one row per non-zero counter ``(d, bucket, cnt)``.

    Each input row contributes to ``depth`` counters (posexplode of
    its row hashes); the groupBy then collapses to at most
    depth*width rows with map-side partial sums — the reduce-side
    volume is the SKETCH size, not the data size. Sketches from
    disjoint inputs merge by summing counters (the property that
    makes CMS work per-partition / per-day at scale).
    """
    key = F.col(key_col)
    buckets = F.array(
        *[_hash_mod(key, f"cms{d}", width) for d in range(depth)]
    )
    return (
        df.select(F.posexplode(buckets).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each key's count: min over the depth counters.

    The sketch side is depth*width rows at most — broadcast — so the
    lookup is a map-side join however many keys are probed. Keys
    whose counter was never touched estimate 0 (coalesce), keeping
    the no-underestimate guarantee.
    """
    key = F.col(key_col)
    probes = keys.select(
        key_col,
        F.posexplode(
            F.array(
                *[_hash_mod(key, f"cms{d}", width) for d in range(depth)]
            )
        ).alias("d", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("cms_estimate")
        )
    )


def bloom_build(
    df: DataFrame, key_col: str, *, n_words: int = 64, k: int = 5
) -> DataFrame:
    """Bloom filter over the key column: ``(word_idx, word)`` rows,
    63 usable bits per int64 word (m = n_words * 63 bits total).

    Each key sets k bit positions; the bit_or aggregation collapses
    to at most n_words rows (map-side partials first), which is the
    entire filter — small enough to broadcast at any input scale.
    """
    key = F.col(key_col)
    m = n_words * BITS_PER_WORD
    pos = F.explode(
        F.array(*[_hash_mod(key, f"bloom{i}", m) for i in range(k)])
    )
    return (
        df.select(pos.alias("pos"))
        .select(
            (F.col("pos") / BITS_PER_WORD).cast("long").alias("word_idx"),
            F.expr(
                f"shiftleft(1L, CAST(pos % {BITS_PER_WORD} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_probe(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    *,
    n_words: int = 64,
    k: int = 5,
) -> DataFrame:
    """Test each probe key against the filter: ``maybe_member`` is
    true iff ALL k bits are set (no false negatives; false positives
    at the usual (1 - e^{-kn/m})^k rate).

    The filter joins broadcast (map-side), then the k per-key bit
    verdicts combine in a bool_and groupBy — ONE shuffle of distinct
    probe keys (the k bits of a key are row-co-located, so partial
    aggregation collapses them before the exchange). When the probe
    side must stay shuffle-free entirely, use ``bloom_probe_inline``,
    which embeds the filter as a plan literal — the same structure as
    Spark's runtime bloom pruning.
    """
    key = F.col(key_col)
    m = n_words * BITS_PER_WORD
    probes = probe.select(
        key_col,
        F.explode(
            F.array(*[_hash_mod(key, f"bloom{i}", m) for i in range(k)])
        ).alias("pos"),
    ).select(
        key_col,
        (F.col("pos") / BITS_PER_WORD).cast("long").alias("word_idx"),
        F.expr(
            f"shiftleft(1L, CAST(pos % {BITS_PER_WORD} AS INT))"
        ).alias("mask"),
    )
    hit = (
        F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask"))
        == F.col("mask")
    )
    return (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .groupBy(key_col)
        .agg(F.bool_and(hit).alias("maybe_member"))
    )


def bloom_probe_inline(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    *,
    n_words: int = 64,
    k: int = 5,
) -> DataFrame:
    """ZERO-shuffle membership test: the filter (bounded at
    ``n_words`` int64 rows by construction — bytes, not data-scale)
    is collected and inlined as a literal boolean bit array in the
    plan, so the probe is a pure projection that composes with any
    downstream filter at scan speed. This is exactly how Spark's
    runtime bloom pruning ships its filter to the fact scan; the
    collect is the same bounded-sketch adjudication as ml/ivf.py's
    centroid table (see tests/test_no_driver_loops.py).

    Adds a boolean ``maybe_member`` column to ``probe`` (all other
    columns pass through, unlike the aggregating ``bloom_probe``).
    """
    m = n_words * BITS_PER_WORD
    bits = [False] * m
    for r in bloom.collect():
        word = int(r["word"])
        base = int(r["word_idx"]) * BITS_PER_WORD
        for b in range(BITS_PER_WORD):
            if (word >> b) & 1:
                bits[base + b] = True
    bit_arr = F.array(*[F.lit(b) for b in bits])
    key = F.col(key_col)
    verdict = F.lit(True)
    for i in range(k):
        pos = _hash_mod(key, f"bloom{i}", m)
        verdict = verdict & F.element_at(
            bit_arr, (pos + 1).cast("int")  # element_at is 1-based
        )
    return probe.withColumn("maybe_member", verdict)


def bottomk_sample(
    df: DataFrame,
    *,
    group_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Mergeable per-group uniform sample: the ``k`` rows whose
    md5(key) hashes are smallest within each group. Because the hash
    is a fixed function of the KEY (not of partitioning, arrival
    order, or randomness), the sample is (a) deterministic — DuckDB
    replays it bit-for-bit, (b) uniform — md5 order is independent of
    the value, and (c) MERGEABLE with the same rule as the KMV
    distinct sketch: the bottom-k of a union is the re-truncated
    union of per-shard bottom-ks, so shards/partitions/days can be
    sketched independently and combined without re-reading data.
    One shuffle (the group window); k rows survive per group.

    This is the quantile member of the sketch family (KMV=distinct,
    CMS=frequency, Bloom=membership): any rank statistic of the
    group's value distribution can be estimated from the sample with
    standard binomial error ~ sqrt(q(1-q)/k); a group smaller than
    ``k`` is sampled COMPLETELY, so its estimates degrade to exact —
    the same below-capacity rule the KMV tier has.

    The sample is keyed purely on ``key_col`` — whole rows survive, so
    any value column can be estimated from the same sample (which is
    why there is no value parameter here; ``bottomk_quantiles`` names
    the one it aggregates).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("__bk", F.row_number().over(w))
        .where(F.col("__bk") <= int(k))
        .drop("__bk")
    )


def bottomk_quantiles(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    key_col: str,
    k: int,
    quantiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """Per-group interpolated quantile estimates over the mergeable
    bottom-k sample (see :func:`bottomk_sample`). Spark ``percentile``
    and DuckDB ``quantile_cont`` share the same linear-interpolation
    definition (parity proven by ``order_value_equidepth``), so the
    estimates are engine-identical. Emits ``n_sample`` so consumers
    can see when a group is below capacity (exact regime)."""
    sampled = bottomk_sample(df, group_col=group_col, key_col=key_col, k=k)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_sample")] + [
        F.percentile(F.col(value_col), F.lit(q)).alias(
            f"p{int(q * 100)}_est"
        )
        for q in quantiles
    ]
    return sampled.groupBy(group_col).agg(*aggs)
