"""Seeded synthetic order generator with injected data-quality errors.

Mirrors the reference's source-DB seeding (scripts/setup_source_db.py:
204-219): 2% negative prices, 1% zero quantities, 1% empty status, 3%
total != price*quantity. The reference builds rows in a Python loop on
one machine; this generator is a Spark plan over ``spark.range`` —
every column derives deterministically from xxhash64(id, seed, salt),
so it parallelizes to any row count with no driver loop, and the same
(n, seed) always yields byte-identical data on any cluster layout.

``with_labels=True`` keeps boolean ``err_*`` columns marking which rows
carry which injected error, so DQ tests can assert the cleaning rules
recover EXACTLY the injected rows rather than plausible-looking rates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

STATUSES = ["completed", "pending", "processing", "cancelled", "returned"]
PAYMENT_METHODS = ["credit_card", "debit_card", "paypal", "cash", "bank_transfer"]
REGIONS = ["North", "South", "Central", "East", "West"]
CATEGORIES = ["Electronics", "Clothing", "Books", "Home", "Sports", "Toys"]

# reference error rates (setup_source_db.py:204-219)
NEG_PRICE_RATE = 0.02
ZERO_QTY_RATE = 0.01
EMPTY_STATUS_RATE = 0.01
BAD_TOTAL_RATE = 0.03


def _u(seed: int, salt: str) -> Column:
    """Deterministic uniform [0, 1) per (row id, seed, salt)."""
    h = F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt))
    return F.pmod(h, F.lit(1_000_000)).cast("double") / 1_000_000.0


def _pick(seed: int, salt: str, options: list[str]) -> Column:
    idx = F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)),
                 F.lit(len(options)))
    return F.element_at(
        F.array(*[F.lit(o) for o in options]), (idx + 1).cast("int")
    )


def synthetic_orders(
    spark: SparkSession,
    n_rows: int,
    *,
    seed: int = 42,
    start_date: str = "2024-01-01",
    days: int = 30,
    with_labels: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Denormalized orders fact in the reference's source shape, with
    the reference's four error classes injected at its rates."""
    base = (
        spark.range(0, n_rows, numPartitions=num_partitions)
        if num_partitions
        else spark.range(n_rows)
    )
    df = base.select(
        "id",
        F.format_string("ORD%07d", F.col("id") + 1).alias("order_id"),
        (
            F.to_timestamp(F.lit(start_date))
            + F.make_dt_interval(
                secs=F.floor(_u(seed, "ts") * days * 86400).cast("double")
            )
        ).alias("order_date"),
        F.format_string(
            "CUST%04d",
            F.pmod(F.xxhash64("id", F.lit(seed), F.lit("cust")), F.lit(500))
            + 1,
        ).alias("customer_id"),
        F.format_string(
            "PROD%04d",
            F.pmod(F.xxhash64("id", F.lit(seed), F.lit("prod")), F.lit(100))
            + 1,
        ).alias("product_id"),
        _pick(seed, "cat", CATEGORIES).alias("category"),
        F.round(10 + _u(seed, "price") * 1990, 2).alias("price"),
        (
            F.pmod(F.xxhash64("id", F.lit(seed), F.lit("qty")), F.lit(10)) + 1
        ).cast("int").alias("quantity"),
        _pick(seed, "status", STATUSES).alias("status"),
        _pick(seed, "pay", PAYMENT_METHODS).alias("payment_method"),
        _pick(seed, "region", REGIONS).alias("region"),
        (_u(seed, "e_negprice") < NEG_PRICE_RATE).alias("err_neg_price"),
        (_u(seed, "e_zeroqty") < ZERO_QTY_RATE).alias("err_zero_qty"),
        (_u(seed, "e_status") < EMPTY_STATUS_RATE).alias("err_empty_status"),
        (_u(seed, "e_total") < BAD_TOTAL_RATE).alias("err_bad_total"),
        (0.8 + 0.4 * _u(seed, "e_totalmul")).alias("__total_mul"),
    )
    df = (
        df.withColumn(
            "price",
            F.when(F.col("err_neg_price"), -F.col("price")).otherwise(
                F.col("price")
            ),
        )
        .withColumn(
            "quantity",
            F.when(F.col("err_zero_qty"), F.lit(0)).otherwise(
                F.col("quantity")
            ),
        )
        .withColumn(
            "status",
            F.when(F.col("err_empty_status"), F.lit("")).otherwise(
                F.col("status")
            ),
        )
        .withColumn(
            "total",
            F.when(
                F.col("err_bad_total"),
                F.round(
                    F.round(F.col("price") * F.col("quantity"), 2)
                    * F.col("__total_mul"),
                    2,
                ),
            ).otherwise(F.round(F.col("price") * F.col("quantity"), 2)),
        )
        .drop("id", "__total_mul")
    )
    if not with_labels:
        df = df.drop(
            "err_neg_price", "err_zero_qty", "err_empty_status",
            "err_bad_total",
        )
    return df
