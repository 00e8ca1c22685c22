"""End-to-end medallion pipeline run (SURVEY §3.1) on a synthetic
e-commerce day with injected DQ errors (the reference generator's
fixture contract, FIXTURES.md §1), plus the serving layer."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.plans.medallion import (
    MedallionConfig,
    run_daily,
)
from data_pipeline_mlops_spark.serve import Recommender


def _source_orders(spark):
    """~60 orders for 2024-03-01 with reference-style injected errors:
    negative price, zero quantity, empty status, off-date rows."""
    rows = []
    day = dt.datetime(2024, 3, 1, 9, 0)
    for i in range(60):
        price = 50.0 + i
        qty = 1 + (i % 4)
        status = ["completed", "processing", "pending", "cancelled"][i % 4]
        if i == 5:
            price = -120.0  # negative price -> abs() repair
        if i == 9:
            qty = 0  # zero quantity -> dropped
        if i == 13:
            status = ""  # empty status -> dropped (also not extracted)
        rows.append(
            (
                f"ORD{i:07d}",
                day + dt.timedelta(minutes=i * 7),
                f"CUST{i % 12:04d}",
                f"Product {i % 8}",
                ["Electronics", "Books", "Toys"][i % 3],
                price,
                qty,
                price * qty,
                status,
            )
        )
    # off-date row must be excluded by the extract
    rows.append(
        (
            "ORDOFFDAY",
            dt.datetime(2024, 3, 2, 1, 0),
            "CUST0001",
            "Product 1",
            "Books",
            10.0,
            1,
            10.0,
            "completed",
        )
    )
    return spark.createDataFrame(
        rows,
        "order_id string, order_date timestamp, customer_id string,"
        "product_name string, category string, price double, quantity int,"
        "total double, status string",
    )


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("lake"))
    cfg = MedallionConfig(base=base, ds="2024-03-01")
    metrics = run_daily(spark, _source_orders(spark), cfg)
    return base, cfg, metrics


def test_layers_written_and_pruned(spark, pipeline_run):
    base, cfg, _ = pipeline_run
    bronze = spark.read.parquet(f"{base}/bronze/orders")
    silver = spark.read.parquet(f"{base}/silver/orders")
    # extract kept only the day's completed/processing orders
    assert bronze.where(F.col("order_id") == "ORDOFFDAY").count() == 0
    statuses = {r["status"] for r in bronze.select("status").collect()}
    assert statuses == {"completed", "processing"}
    # silver dropped zero-qty; repaired negative price
    assert silver.where(F.col("quantity") <= 0).count() == 0
    assert silver.where(F.col("price") < 0).count() == 0
    repaired = silver.where(F.col("order_id") == "ORD0000005")
    if repaired.count():  # i=5 is processing -> extracted
        assert repaired.collect()[0]["price"] == 120.0
    # total recomputed as price*quantity
    bad_total = silver.where(
        F.abs(F.col("total") - F.col("price") * F.col("quantity")) > 0.01
    )
    assert bad_total.count() == 0


def test_gold_aggregates_consistent(spark, pipeline_run):
    base, cfg, _ = pipeline_run
    silver = spark.read.parquet(f"{base}/silver/orders")
    gold = spark.read.parquet(f"{base}/gold/daily_summary")
    row = gold.collect()[0]
    assert row["total_orders"] == silver.count()
    cats = spark.read.parquet(f"{base}/gold/category_performance")
    assert cats.count() == silver.select("category").distinct().count()
    # category revenue sums to daily revenue
    total_cat = sum(r["revenue"] for r in cats.collect())
    assert abs(total_cat - row["total_revenue"]) < 0.01


def test_ml_artifacts_and_metrics(spark, pipeline_run):
    base, cfg, metrics = pipeline_run
    train = spark.read.parquet(f"{base}/gold/ml/train")
    ev = spark.read.parquet(f"{base}/gold/ml/eval")
    inter_n = train.count() + ev.count()
    silver = spark.read.parquet(f"{base}/silver/orders")
    distinct_pairs = (
        silver.select("customer_id", "product_name").distinct().count()
    )
    assert inter_n == distinct_pairs  # split is a partition
    assert 0.0 <= metrics["user_coverage"] <= 1.0
    assert 0.0 <= metrics["precision_at_k"] <= 1.0
    assert metrics["eval_rows"] == ev.count()
    sim = spark.read.parquet(f"{base}/gold/ml/item_similarity")
    assert sim.where(F.col("item_a") >= F.col("item_b")).count() == 0


def test_serving_layer(spark, pipeline_run):
    base, cfg, _ = pipeline_run
    cache: dict[str, str] = {}
    rec = Recommender(
        spark,
        similarity_path=f"{base}/gold/ml/item_similarity",
        interactions_path=f"{base}/gold/ml/train",
        user_col="customer_id",
        item_col="product_name",
        cache_get=cache.get,
        cache_set=cache.__setitem__,
    )
    train = spark.read.parquet(f"{base}/gold/ml/train")
    user = train.select("customer_id").first()["customer_id"]
    recs = rec.recommend(user, top_n=5)
    assert len(recs) <= 5
    owned = {
        r["product_name"]
        for r in train.where(F.col("customer_id") == user).collect()
    }
    assert not ({r["item"] for r in recs} & owned)
    # second call served from cache (same payload, cache populated)
    assert cache and rec.recommend(user, top_n=5) == recs
    stats = rec.stats()
    assert stats["n_interactions"] == train.count()
    assert 0 <= stats["sparsity"] < 1
    item = train.select("product_name").first()["product_name"]
    sims = rec.similar(item, top_n=3)
    assert all(s["item"] != item for s in sims)


def test_run_daily_with_registry_promotion(spark, tmp_path):
    """§3.1 tail parity: evaluate >> register — first run promotes."""
    from data_pipeline_mlops_spark.ml import model_registry as reg
    from data_pipeline_mlops_spark.plans.medallion import (
        MedallionConfig,
        run_daily,
    )

    base = str(tmp_path / "lake2")
    rpath = str(tmp_path / "registry")
    cfg = MedallionConfig(base=base, ds="2024-03-01")
    metrics = run_daily(
        spark, _source_orders(spark), cfg, registry_path=rpath
    )
    assert metrics["promoted"] == 1.0
    assert reg.production_version(spark, rpath) == "2024-03-01"
    sim = reg.load_production(
        spark, registry_path=rpath, name="item_similarity"
    )
    assert sim.count() > 0
