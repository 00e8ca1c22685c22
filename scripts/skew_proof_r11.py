"""Skewed-DATA proof for the skew-mitigation tier (VERDICT r10 #5):
every prior scaling artifact grew the data uniformly; this one plants
a real hot key and measures who carries the load — the basket cap,
the deterministic salt (operators/skew.py), or AQE's skew-join split.

Skewed variant of sf0.1 (written under .scale_cache/skew_sf01, built
once, deterministic): ~10% of orders rows reassigned to ONE hot
customer (o_custkey = 1) and ~10% of lineitem rows to ONE hot part
(l_partkey = 1), ids remapped with the same xxhash64 discipline
sources/synthetic.py uses — no other column changes, so plans are
comparable with the uniform baseline.

Measurements (best of 2, noop sink so timings are plan cost):

1. hot-key groupBy (revenue per customer): plain hash aggregate vs
   operators/skew.salted_sum. Spark's partial (map-side) aggregation
   already absorbs single-hot-key groupBy skew, so the expectation is
   parity — recorded to show WHY salted_sum targets high-cardinality
   partials (the docstring's contract), not this shape.
2. skewed sort-merge join (orders x customer on the hot key) with
   broadcast disabled (the small side is forced big-path to expose
   reducer skew): AQE skew-split ON vs OFF vs salted_join. This is
   the case AQE owns at runtime and the salt owns when AQE cannot
   see the skew (e.g. a non-shuffle downstream op pins partitioning).
3. the CF basket cap: item_similarity_basket_capped on the skewed
   interactions vs the ANALYTIC pair count of the uncapped self-join
   (sum over baskets of k*(k-1)/2, computed exactly, NOT run — the
   hot basket alone contributes ~1e9 pairs). The cap is the only
   defense that acts BEFORE the shuffle exists; salt/AQE only spread
   pain that the cap refuses to generate.

Appends a "skew" section to SCALING_r11.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SKEW_DIR = os.path.join(REPO, ".scale_cache", "skew_sf01")
HOT_SHARE = 0.10


def build_skewed(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(SKEW_DIR, "_SUCCESS_ALL")):
        return
    os.makedirs(SKEW_DIR, exist_ok=True)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    hot_o = F.pmod(
        F.xxhash64("o_orderkey", F.lit("skew11")), F.lit(1_000_000)
    ) < int(HOT_SHARE * 1_000_000)
    orders.withColumn(
        "o_custkey", F.when(hot_o, F.lit(1)).otherwise(F.col("o_custkey"))
    ).write.mode("overwrite").parquet(f"{SKEW_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    hot_l = F.pmod(
        F.xxhash64("l_orderkey", "l_linenumber", F.lit("skew11")),
        F.lit(1_000_000),
    ) < int(HOT_SHARE * 1_000_000)
    li.withColumn(
        "l_partkey", F.when(hot_l, F.lit(1)).otherwise(F.col("l_partkey"))
    ).write.mode("overwrite").parquet(f"{SKEW_DIR}/lineitem.parquet")
    for t in ("customer", "nation", "region", "part"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{SKEW_DIR}/{t}.parquet")
    open(os.path.join(SKEW_DIR, "_SUCCESS_ALL"), "w").close()


def timed(df, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from data_pipeline_mlops_spark.ml import cf
    from data_pipeline_mlops_spark.operators.exact import money_sum
    from data_pipeline_mlops_spark.operators.skew import (
        salted_join,
        salted_sum,
    )
    from data_pipeline_mlops_spark.session import get_spark

    spark = get_spark(app_name="skew-proof-r11")
    spark.sparkContext.setLogLevel("ERROR")
    build_skewed(spark)

    orders1 = spark.read.parquet(f"{SKEW_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SKEW_DIR}/lineitem.parquet")
    customer = spark.read.parquet(f"{SKEW_DIR}/customer.parquet")
    # 10x-amplified fact for the shuffle measurements: sf0.1's 150k
    # orders finish in noise on local[32]; 1.5M rows with a ~150k-row
    # hot key put real pressure on one reducer (orderkeys remapped per
    # copy so the fact stays a valid key space)
    copies = 10
    orders = orders1
    okmax = orders1.agg(F.max("o_orderkey")).collect()[0][0] + 1
    for c in range(1, copies):
        orders = orders.unionByName(
            orders1.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(c * okmax)
            )
        )
    orders = orders.localCheckpoint()
    hot_rows = orders.where(F.col("o_custkey") == 1).count()
    total_rows = orders.count()

    out: dict = {
        "skew_dir": SKEW_DIR,
        "fact_copies": copies,
        "hot_customer_share": round(hot_rows / total_rows, 4),
        "orders_rows": total_rows,
    }

    # direct skew evidence: rows per shuffle partition when the fact
    # is hash-partitioned on the hot key (what every un-mitigated
    # shuffle on this key sees)
    dist = (
        orders.repartition(32, F.col("o_custkey"))
        .withColumn("__p", F.spark_partition_id())
        .groupBy("__p")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.max("n").alias("mx"),
            F.expr("percentile(n, 0.5)").alias("med"),
        )
        .collect()[0]
    )
    out["shuffle_partition_rows_max"] = int(dist["mx"])
    out["shuffle_partition_rows_median"] = float(dist["med"])

    # 1. hot-key groupBy: plain vs salted two-phase
    plain_agg = orders.groupBy("o_custkey").agg(
        money_sum("o_totalprice", "revenue")
    )
    salted_agg = salted_sum(
        orders.select("o_custkey", "o_totalprice"),
        ["o_custkey"],
        {"revenue": money_sum("o_totalprice", "revenue")},
        salt_source=["o_totalprice"],
    )
    out["groupby_plain_sec"] = timed(plain_agg)
    out["groupby_salted_sec"] = timed(salted_agg)

    # 2. skewed SMJ: AQE skew-split on/off vs salted_join (broadcast
    # disabled so the join actually shuffles on the hot key)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    join_df = orders.join(customer, orders.o_custkey == customer.c_custkey)
    agg = join_df.groupBy("c_mktsegment").agg(
        money_sum("o_totalprice", "revenue")
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    out["smj_aqe_skewsplit_sec"] = timed(agg)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    out["smj_no_aqe_sec"] = timed(agg)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    sj = salted_join(
        orders.withColumnRenamed("o_custkey", "k"),
        customer.withColumnRenamed("c_custkey", "k"),
        "k",
        n_salts=8,
        salt_source=["o_orderkey"],
    ).groupBy("c_mktsegment").agg(money_sum("o_totalprice", "revenue"))
    out["smj_salted_sec"] = timed(sj)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # 3. basket cap: capped CF runs; uncapped pair count computed
    # analytically (never executed)
    inter = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("customer_id"),
            F.col("l_partkey").alias("product_id"),
        )
        .distinct()
        .localCheckpoint()
    )
    sizes = inter.groupBy("customer_id").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    pairs = sizes.agg(
        F.sum(F.col("k") * (F.col("k") - 1) / 2).cast("long").alias("p"),
        F.max("k").alias("max_basket"),
    ).collect()[0]
    out["uncapped_pairs_analytic"] = int(pairs["p"])
    out["max_basket_size"] = int(pairs["max_basket"])
    capped = cf.item_similarity(
        inter,
        user_col="customer_id",
        item_col="product_id",
        min_cooccurrence=3,
        max_basket_size=64,
    )
    t0 = time.perf_counter()
    capped.write.mode("overwrite").format("noop").save()
    out["capped_similarity_sec"] = round(time.perf_counter() - t0, 3)
    capped_pairs = sizes.select(
        F.least(F.col("k"), F.lit(64)).alias("k")
    ).agg(F.sum(F.col("k") * (F.col("k") - 1) / 2).cast("long")).collect()[
        0
    ][0]
    out["capped_pairs_analytic"] = int(capped_pairs)

    path = os.path.join(REPO, "SCALING_r11.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as fh:
            doc = json.load(fh)
    doc["skew"] = out
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
