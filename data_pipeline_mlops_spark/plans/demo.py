"""Runnable end-to-end demo: `python -m data_pipeline_mlops_spark.plans.demo`

Builds a synthetic e-commerce day (the reference generator's shape with
injected DQ errors), runs the full medallion + ML pipeline with model
registry promotion, replays the canonical CDC alert corpus through the
streaming engine, and prints the resulting metrics — a one-command
smoke of every major subsystem.
"""

from __future__ import annotations

import datetime as dt
import json
import tempfile


def main() -> None:
    from pyspark.sql import functions as F

    from data_pipeline_mlops_spark.ml import model_registry
    from data_pipeline_mlops_spark.plans.medallion import (
        MedallionConfig,
        run_daily,
    )
    from data_pipeline_mlops_spark.session import get_spark
    from data_pipeline_mlops_spark.streaming import alert_stream

    spark = get_spark(app_name="demo", cpus=8, shuffle_partitions=8)

    day = dt.datetime(2024, 6, 1, 9, 0)
    rows = []
    for i in range(120):
        price = 25.0 + (i % 40)
        if i % 37 == 0:
            price = -price  # injected DQ error -> abs() repair
        qty = (i % 5) or 1
        rows.append(
            (
                f"ORD{i:06d}",
                day + dt.timedelta(minutes=i * 6),
                f"CUST{i % 15:04d}",
                f"Product {i % 9}",
                ["Electronics", "Books", "Toys"][i % 3],
                price,
                qty,
                price * qty,
                ["completed", "processing", "pending"][i % 3],
            )
        )
    orders = spark.createDataFrame(
        rows,
        "order_id string, order_date timestamp, customer_id string,"
        "product_name string, category string, price double, quantity int,"
        "total double, status string",
    )

    with tempfile.TemporaryDirectory() as base:
        metrics = run_daily(
            spark,
            orders,
            MedallionConfig(base=base, ds="2024-06-01"),
            registry_path=f"{base}/registry",
        )
        print("medallion metrics:", json.dumps(metrics, indent=2))
        print(
            "production model:",
            model_registry.production_version(spark, f"{base}/registry"),
        )
        gold = spark.read.parquet(f"{base}/gold/daily_summary")
        print("gold daily_summary:")
        gold.show(truncate=False)

        # streaming alerts on the canonical corpus
        corpus_dir = f"{base}/cdc"
        alert_stream.write_corpus(
            corpus_dir,
            [
                {"order_id": "O2001", "total": 15000.0, "quantity": 5,
                 "price": 3000.0, "customer_id": "C1", "product_name": "P"},
                {"order_id": "O1001", "total": 200.0, "quantity": 2,
                 "price": 100.0, "customer_id": "C2", "product_name": "P"},
                {"order_id": "O2003", "total": -500.0, "quantity": 5,
                 "price": -100.0, "customer_id": "C3", "product_name": "P"},
            ],
        )
        src = alert_stream.file_json_source(spark, corpus_dir)
        alert_stream.run_to_memory(
            alert_stream.alert_pipeline(src), query_name="demo_alerts"
        )
        print("streaming alerts:")
        spark.sql("SELECT alert_type, order_id, total FROM demo_alerts").show()

    spark.stop()


if __name__ == "__main__":
    main()
