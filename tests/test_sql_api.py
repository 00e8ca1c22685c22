"""SQL-API coverage (the reference's Trino role, SURVEY.md §3 entry 5):
`spark.sql` over registered views must plan/answer identically to the
DataFrame formulations — Catalyst compiles both to the same plans."""

from __future__ import annotations

from data_pipeline_mlops_spark.sources.tables import register_views
from tests.conftest import SF_SMALL


def test_sql_over_views_matches_dataframe_api(spark):
    register_views(spark, SF_SMALL)
    from data_pipeline_mlops_spark.registry import q_daily_summary

    sql = spark.sql(
        """
        SELECT CAST(o_orderdate AS DATE) AS order_date,
               COUNT(*) AS total_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,6))), 2)
                    AS DOUBLE) AS total_revenue,
               COUNT(DISTINCT o_custkey) AS unique_customers
        FROM orders GROUP BY 1
        """
    )
    df = q_daily_summary(spark, SF_SMALL)
    a = sorted(map(tuple, sql.collect()))
    b = sorted(map(tuple, df.collect()))
    assert a == b


def test_adhoc_join_sql(spark):
    register_views(spark, SF_SMALL)
    out = spark.sql(
        """
        SELECT r_name, COUNT(DISTINCT c_custkey) AS customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1 ORDER BY 1
        """
    ).collect()
    assert len(out) == 5  # five regions
    n_customers = spark.table("customer").count()
    assert sum(r["customers"] for r in out) == n_customers


def test_engine_sql_functions_match_operators(spark):
    from pyspark.sql import functions as F

    from data_pipeline_mlops_spark.functions.text import skeleton_key
    from data_pipeline_mlops_spark.sqlfuncs import register_sql_functions
    from data_pipeline_mlops_spark.timeutil import epoch_us

    names = register_sql_functions(spark)
    assert "engine_epoch_us" in names

    register_views(spark, SF_SMALL)
    # epoch parity on the NTZ events table
    a = sorted(
        r.e for r in spark.sql(
            "SELECT engine_epoch_us(ts) AS e FROM events LIMIT 50"
        ).collect()
    )
    ev = spark.sql("SELECT ts FROM events LIMIT 50")
    b = sorted(r.e for r in ev.select(epoch_us("ts").alias("e")).collect())
    assert a == b

    # skeleton parity incl. homoglyphs
    df = spark.createDataFrame(
        [("Cheаp  pills herе",), ("plain text",)], "s string"
    )
    df.createOrReplaceTempView("skel_probe")
    got_sql = [
        r.k for r in spark.sql(
            "SELECT engine_skeleton(s) AS k FROM skel_probe"
        ).collect()
    ]
    got_df = [
        r.k for r in df.select(skeleton_key("s").alias("k")).collect()
    ]
    assert got_sql == got_df

    # hash60 matches the sampler idiom
    h = spark.sql("SELECT engine_hash60('42|7') AS h").collect()[0].h
    from data_pipeline_mlops_spark.functions.dedup_text import _md5_60

    h2 = (
        spark.range(1)
        .select(_md5_60(F.lit("42|7")).alias("h"))
        .collect()[0]
        .h
    )
    assert h == h2
    # and the SQL function is an inlined expression, not a UDF
    plan = spark.sql(
        "SELECT engine_token_count('a b c') AS n"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_manifest_view_pins_version(spark, tmp_path):
    from data_pipeline_mlops_spark.sources.txn import ManifestTable
    from data_pipeline_mlops_spark.sqlfuncs import register_manifest_view

    t = ManifestTable(str(tmp_path / "mv"))
    t.commit(spark.range(4), mode="replace_all")
    register_manifest_view(spark, t, "snap_v0", version=0)
    t.commit(spark.range(100), mode="replace_all")
    assert spark.sql("SELECT COUNT(*) AS n FROM snap_v0").collect()[0].n == 4
