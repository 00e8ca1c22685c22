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
