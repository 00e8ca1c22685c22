"""Round-10 operators: time-bucket gap-fill (operators/gapfill.py) and
SemDeDup cluster-bounded semantic dedup
(functions/similarity.py::cluster_semantic_dedup)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_pipeline_mlops_spark.functions.similarity import (
    cluster_semantic_dedup,
)
from data_pipeline_mlops_spark.operators.gapfill import time_bucket_gapfill

SF_SMALL = "/root/testdata/sf0.001"


def _d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


def _series(spark):
    rows = [
        ("a", _d("2024-01-01"), 2, 10.0, 5.0),
        ("a", _d("2024-01-03"), 1, 7.0, 7.0),
        # group b starts LATE: global spine gives it leading fill rows
        ("b", _d("2024-01-03"), 3, 30.0, 12.0),
    ]
    return spark.createDataFrame(
        rows, "g string, day date, n long, rev double, gauge double"
    )


def test_gapfill_zero_locf_mark(spark):
    out = time_bucket_gapfill(
        _series(spark),
        group_cols=["g"],
        bucket_col="day",
        zero_cols=["n", "rev"],
        locf_cols=["gauge"],
        mark_col="filled",
    ).collect()
    got = {(r["g"], str(r["day"])): r for r in out}
    # spine: 2 groups x 3 days (global 01-01..01-03)
    assert len(got) == 6
    # actual rows untouched
    r = got[("a", "2024-01-01")]
    assert (r["n"], r["rev"], r["gauge"], r["filled"]) == (2, 10.0, 5.0, False)
    # gap: counts/sums zero-filled, gauge carried forward
    r = got[("a", "2024-01-02")]
    assert (r["n"], r["rev"], r["gauge"], r["filled"]) == (0, 0.0, 5.0, True)
    # late-onset group: leading rows filled, gauge NULL before first obs
    r = got[("b", "2024-01-01")]
    assert (r["n"], r["rev"], r["gauge"], r["filled"]) == (0, 0.0, None, True)
    r = got[("b", "2024-01-03")]
    assert (r["n"], r["rev"], r["gauge"], r["filled"]) == (3, 30.0, 12.0, False)


def test_gapfill_no_mark_and_null_passthrough(spark):
    # columns in neither fill list stay NULL on synthesized rows
    out = time_bucket_gapfill(
        _series(spark),
        group_cols=["g"],
        bucket_col="day",
        zero_cols=["n"],
        locf_cols=[],
        mark_col=None,
    )
    assert "filled" not in out.columns
    rows = {(r["g"], str(r["day"])): r for r in out.collect()}
    r = rows[("a", "2024-01-02")]
    assert r["n"] == 0 and r["rev"] is None and r["gauge"] is None


def test_gapfill_hourly_step_and_timestamp_interp(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 5, 1, 0, 0, 0)
    rows = [
        ("a", t0, 1, 10.0),
        ("a", t0 + dt.timedelta(hours=4), 1, 50.0),  # 3-hour gap
    ]
    df = spark.createDataFrame(
        rows, "g string, bucket timestamp, n long, v double"
    )
    out = {r["bucket"].hour: r for r in time_bucket_gapfill(
        df, group_cols=["g"], bucket_col="bucket",
        zero_cols=["n"], interp_cols=["v"], step="1 hour",
    ).collect()}
    assert len(out) == 5
    assert [out[h]["n"] for h in range(5)] == [1, 0, 0, 0, 1]
    assert [out[h]["v"] for h in range(5)] == [10.0, 20.0, 30.0, 40.0, 50.0]
    assert out[2]["filled"] and not out[4]["filled"]


def test_dashboard_hourly_series_is_contiguous(spark):
    """The beyond-parity sixth dashboard table: an UNGROUPED hourly
    series (empty group_cols) gap-filled across the batch's hour
    range — dashboards plot a time axis, not hour-of-day buckets."""
    import datetime as dt

    from data_pipeline_mlops_spark.streaming import microbatch

    t0 = dt.datetime(2024, 6, 1, 10, 0, 0)
    rows = [
        (1, t0, 100.0, 1, "p1", "c1", "r1", 2, "completed"),
        (2, t0 + dt.timedelta(hours=3), 50.0, 2, "p2", "c1", "r1", 1,
         "completed"),
    ]
    df = spark.createDataFrame(
        rows,
        "oid long, ts timestamp, amt double, cust long, prod string,"
        " cat string, reg string, qty long, status string",
    )
    m = microbatch.dashboard_metrics(
        df, ts_col="ts", amount_col="amt", customer_col="cust",
        product_col="prod", category_col="cat", region_col="reg",
        qty_col="qty", include_hourly_series=True,
    )
    out = sorted(m["hourly_series"].collect(), key=lambda r: r["bucket"])
    assert [r["order_count"] for r in out] == [1, 0, 0, 1]
    assert [r["revenue"] for r in out] == [100.0, 0.0, 0.0, 50.0]
    assert [r["filled"] for r in out] == [False, True, True, False]
    # parity default: exactly the reference's five tables
    five = microbatch.dashboard_metrics(
        df, ts_col="ts", amount_col="amt", customer_col="cust",
        product_col="prod", category_col="cat", region_col="reg",
        qty_col="qty",
    )
    assert "hourly_series" not in five and len(five) == 5


def test_gapfill_rejects_bad_step(spark):
    import pytest

    df = _series(spark)
    with pytest.raises(ValueError, match="interval body"):
        time_bucket_gapfill(
            df, group_cols=["g"], bucket_col="day",
            step="1 hour); DROP TABLE x",
        )


def test_gapfill_rejects_bad_fill_specs(spark):
    import pytest

    df = _series(spark)
    with pytest.raises(ValueError, match="not value columns"):
        time_bucket_gapfill(
            df, group_cols=["g"], bucket_col="day", zero_cols=["typo"],
        )
    with pytest.raises(ValueError, match="more than one fill policy"):
        time_bucket_gapfill(
            df, group_cols=["g"], bucket_col="day",
            zero_cols=["n"], locf_cols=["n"],
        )


def test_gapfill_linear_interpolation(spark):
    rows = [
        ("a", _d("2024-01-01"), 10.0),
        ("a", _d("2024-01-04"), 40.0),   # 3-day gap: 20, 30
        ("a", _d("2024-01-06"), 10.0),   # 2-day gap: 25
    ]
    df = spark.createDataFrame(rows, "g string, day date, v double")
    out = {str(r["day"]): r for r in time_bucket_gapfill(
        df, group_cols=["g"], bucket_col="day", interp_cols=["v"],
    ).collect()}
    assert out["2024-01-02"]["v"] == 20.0
    assert out["2024-01-03"]["v"] == 30.0
    assert out["2024-01-05"]["v"] == 25.0
    assert out["2024-01-01"]["v"] == 10.0 and not out["2024-01-01"]["filled"]
    assert out["2024-01-02"]["filled"]


def test_gapfill_interpolation_no_extrapolation(spark):
    # group b observed only on day 3 of a 1..4 global spine: every
    # other bucket lacks a surrounding pair -> NULL, never extended
    rows = [
        ("a", _d("2024-01-01"), 1.0),
        ("a", _d("2024-01-04"), 4.0),
        ("b", _d("2024-01-03"), 9.0),
    ]
    df = spark.createDataFrame(rows, "g string, day date, v double")
    out = {(r["g"], str(r["day"])): r["v"] for r in time_bucket_gapfill(
        df, group_cols=["g"], bucket_col="day", interp_cols=["v"],
    ).collect()}
    assert out[("b", "2024-01-01")] is None
    assert out[("b", "2024-01-02")] is None
    assert out[("b", "2024-01-03")] == 9.0
    assert out[("b", "2024-01-04")] is None
    assert out[("a", "2024-01-02")] == 2.0


def test_gapfill_spine_is_calendar_bounded(spark):
    """The spine Exchange is on (group, day) — output-sized — and the
    bounds side is broadcast (no shuffle to discover [lo, hi])."""
    plan = time_bucket_gapfill(
        _series(spark),
        group_cols=["g"],
        bucket_col="day",
        zero_cols=["n"],
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_time_weighted_avg_hand_computed(spark):
    """LOCF weighting: v=10 holds 60 s, v=40 holds 30 s ->
    TWA = (10*60 + 40*30) / 90 = 20.0; the last point carries no
    interval; a singleton group produces no row; equal timestamps
    order by the tiebreak id."""
    import datetime as dt

    from data_pipeline_mlops_spark.operators.timeweight import (
        time_weighted_avg,
    )

    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)
    rows = [
        ("a", 1, t0, 10.0),
        ("a", 2, t0 + dt.timedelta(seconds=60), 40.0),
        ("a", 3, t0 + dt.timedelta(seconds=90), 99.0),   # last: no dt
        ("b", 4, t0, 7.0),                               # singleton
        # group c: tied timestamps — id order decides who holds first
        ("c", 5, t0, 1.0),
        ("c", 6, t0, 5.0),                               # dt=0 from 5
        ("c", 7, t0 + dt.timedelta(seconds=10), 9.0),
    ]
    df = spark.createDataFrame(
        rows, "g string, eid long, ts timestamp, v double"
    )
    out = {r["g"]: r for r in time_weighted_avg(
        df, group_cols=["g"], ts_col="ts", value_col="v",
        tiebreak_col="eid",
    ).collect()}
    assert "b" not in out
    assert out["a"]["twa_value"] == 20.0
    assert out["a"]["total_seconds"] == 90
    assert out["a"]["n_intervals"] == 2
    # c: id 5 holds 0 s, id 6 holds 10 s -> TWA = 5.0 over 10 s
    assert out["c"]["twa_value"] == 5.0
    assert out["c"]["total_seconds"] == 10


def test_counter_increase_reset_handling(spark):
    """10 -> 25 -> 3 -> 9: increases 15, then RESET (3 counts fully:
    restarted from zero), then 6 -> total 24, one reset, three
    intervals; singleton groups drop."""
    import datetime as dt

    from data_pipeline_mlops_spark.operators.timeweight import (
        counter_increase,
    )

    t0 = dt.datetime(2024, 7, 1)
    rows = [
        ("a", 1, t0, 10.0),
        ("a", 2, t0 + dt.timedelta(seconds=1), 25.0),
        ("a", 3, t0 + dt.timedelta(seconds=2), 3.0),    # reset
        ("a", 4, t0 + dt.timedelta(seconds=3), 9.0),
        ("b", 5, t0, 7.0),                              # singleton
    ]
    df = spark.createDataFrame(
        rows, "g string, eid long, ts timestamp, v double"
    )
    out = {r["g"]: r for r in counter_increase(
        df, group_cols=["g"], ts_col="ts", value_col="v",
        tiebreak_col="eid",
    ).collect()}
    assert "b" not in out
    a = out["a"]
    assert (a["total_increase"], a["n_resets"], a["n_samples"]) == (
        24.0, 1, 3,
    )


def test_semdedup_keep_rule_chain(spark):
    """u~v and v~w but u!~w (chain): greedy keep-lowest keeps ONLY the
    chain minimum — v drops against u, w drops against v (dup_of
    records the lowest qualifying lower id, which may itself be
    dropped). Cross-cluster near-identical vectors do NOT pair."""
    rows = [
        # cluster 0: 1 and 2 identical; 3 orthogonal-ish
        (1, 0, [1.0, 0.0, 0.0]),
        (2, 0, [1.0, 0.0, 0.0]),
        (3, 0, [0.0, 1.0, 0.0]),
        # chain in cluster 1: 4~5 (cos .9962), 5~6 (cos .9962),
        # 4~6 (cos .9848 < τ) — only 4 survives
        (4, 1, [1.0, 0.0, 0.0]),
        (5, 1, [1.0, 0.0875, 0.0]),
        (6, 1, [1.0, 0.1763, 0.0]),
        # cluster 2: identical to id 1 but OTHER cluster -> no pair
        (7, 2, [1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in cluster_semantic_dedup(
        df, threshold=0.99
    ).collect()}
    assert [out[i]["keep"] for i in (1, 2, 3, 4, 5, 6, 7)] == [
        True, False, True, True, False, False, True,
    ]
    assert out[2]["dup_of"] == 1
    assert out[5]["dup_of"] == 4
    assert out[6]["dup_of"] == 5  # chained drop: its witness is dropped too
    assert out[7]["dup_of"] is None


def test_semdedup_registry_twins_planted_corpus(spark):
    """Every planted twin (vec_id >= 100000) must be dropped against
    its original (cluster bound costs no recall on the planted
    corpus), and every original kept."""
    from data_pipeline_mlops_spark.registry import QUERIES

    out = QUERIES["doc_semdedup"].spark(spark, SF_SMALL).collect()
    twins = [r for r in out if r["vec_id"] >= 100000]
    assert twins and all(not r["keep"] for r in twins)
    assert all(r["dup_of"] == r["vec_id"] - 100000 for r in twins)
    originals = [r for r in out if r["vec_id"] < 100000]
    assert all(r["keep"] for r in originals)
    # scale label: parity-only with a registered scale-safe twin
    spec = QUERIES["doc_semdedup"]
    assert spec.scale_safe is False
    assert spec.scale_twin == "doc_semdedup_lsh"
    assert QUERIES[spec.scale_twin].scale_safe


def test_semdedup_lsh_tier_agrees_on_planted_corpus(spark):
    """The occupancy-bounded LSH pair source reaches the SAME keep
    decisions as the cluster-bounded tier on the planted corpus (a
    near-dup pair at cosine ~0.99 collides in at least one of the 8
    tables with near-certainty — and deterministically here)."""
    from data_pipeline_mlops_spark.registry import QUERIES

    kmeans = {
        r["vec_id"]: (r["keep"], r["dup_of"])
        for r in QUERIES["doc_semdedup"].spark(spark, SF_SMALL).collect()
    }
    lsh = {
        r["vec_id"]: (r["keep"], r["dup_of"])
        for r in QUERIES["doc_semdedup_lsh"].spark(spark, SF_SMALL).collect()
    }
    assert kmeans == lsh
