"""Round-10 continuous-aggregate tier: state durations + heartbeat
uptime (operators/stateagg.py), OHLC candlesticks (operators/ohlc.py),
M4 downsampling (operators/downsample.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from data_pipeline_mlops_spark.operators.downsample import m4_downsample
from data_pipeline_mlops_spark.operators.ohlc import ohlc_agg
from data_pipeline_mlops_spark.operators.stateagg import (
    duration_in_state,
    heartbeat_uptime,
)

T0 = dt.datetime(2024, 6, 1, 0, 0, 0)


def _ts(seconds: int) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


def test_duration_in_state_locf(spark):
    """States hold until the next observation: A holds 60 s, B holds
    30 s, then A again 10 s -> A=70 s over 2 intervals, B=30 s; the
    final observation carries no interval; singleton series drop."""
    rows = [
        ("u1", 1, _ts(0), "A"),
        ("u1", 2, _ts(60), "B"),
        ("u1", 3, _ts(90), "A"),
        ("u1", 4, _ts(100), "B"),   # last: no interval
        ("u2", 5, _ts(0), "A"),     # singleton
    ]
    df = spark.createDataFrame(
        rows, "g string, eid long, ts timestamp, st string"
    )
    out = {
        (r["g"], r["st"]): r
        for r in duration_in_state(
            df, group_cols=["g"], ts_col="ts", state_col="st",
            tiebreak_col="eid",
        ).collect()
    }
    assert ("u2", "A") not in out
    assert out[("u1", "A")]["state_seconds"] == 70
    assert out[("u1", "A")]["n_intervals"] == 2
    assert out[("u1", "B")]["state_seconds"] == 30
    assert out[("u1", "B")]["n_intervals"] == 1


def test_heartbeat_uptime_islands(spark):
    """liveness=100: beats at 0, 50 (overlap), 150 (adjacent to the
    150 running end -> EXTENDS, half-open), 400 (gap) -> segments
    [0,250) and [400,500): uptime 350, 2 segments, span 500,
    coverage 0.7. Duplicate beats merge to themselves."""
    rows = [
        ("u", _ts(0)), ("u", _ts(50)), ("u", _ts(150)),
        ("u", _ts(400)), ("u", _ts(400)),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    r = heartbeat_uptime(
        df, group_cols=["g"], ts_col="ts", liveness_seconds=100
    ).collect()[0]
    assert r["uptime_seconds"] == 350
    assert r["n_segments"] == 2
    assert r["last_seen_s"] - r["first_seen_s"] == 400
    assert r["coverage"] == 0.7


def test_heartbeat_uptime_rejects_nonpositive_liveness(spark):
    df = spark.createDataFrame([("u", _ts(0))], "g string, ts timestamp")
    with pytest.raises(ValueError):
        heartbeat_uptime(
            df, group_cols=["g"], ts_col="ts", liveness_seconds=0
        )


def test_ohlc_tie_and_volume(spark):
    """Open/close pick by (ts, tiebreak): two rows share the opening
    timestamp -> the lower event id wins open; close is the latest
    (ts, id). Volume is the decimal-exact sum rounded to 2."""
    rows = [
        ("s", 2, _ts(0), 5.0),
        ("s", 1, _ts(0), 3.0),     # same ts, lower id -> open
        ("s", 3, _ts(10), 9.0),
        ("s", 4, _ts(10), 1.0),    # same ts, higher id -> close
    ]
    df = spark.createDataFrame(
        rows, "g string, eid long, ts timestamp, v double"
    )
    r = ohlc_agg(
        df, group_cols=["g"], ts_col="ts", value_col="v",
        bucket="day", tiebreak_col="eid",
    ).collect()[0]
    assert (r["open"], r["high"], r["low"], r["close"]) == (
        3.0, 9.0, 1.0, 1.0,
    )
    assert r["n_ticks"] == 4
    assert r["volume"] == 18.0


def test_ohlc_single_hash_agg_no_window(spark):
    """The struct-edge trick keeps OHLC a single aggregation: the
    physical plan must contain NO Window operator and at most the
    one agg exchange."""
    rows = [("s", 1, _ts(0), 1.0), ("s", 2, _ts(5), 2.0)]
    df = spark.createDataFrame(
        rows, "g string, eid long, ts timestamp, v double"
    )
    plan = (
        ohlc_agg(
            df, group_cols=["g"], ts_col="ts", value_col="v",
            tiebreak_col="eid",
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_m4_buckets_and_edges(spark):
    """6 points over [0, 119] s, 2 buckets -> split at k =
    t*2 DIV 120: [0,59]->0, [60,119]->1. Bucket 0 first=(0,10),
    last=(50,2), min=2@50, max=10@0; value tie in bucket 1 (7.0
    twice) -> min picks the EARLIER (t asc), max the LATER (t desc)."""
    rows = [
        ("s", 1, _ts(0), 10.0),
        ("s", 2, _ts(30), 4.0),
        ("s", 3, _ts(50), 2.0),
        ("s", 4, _ts(60), 7.0),
        ("s", 5, _ts(100), 7.0),
        ("s", 6, _ts(119), 8.0),
    ]
    df = spark.createDataFrame(
        rows, "g string, eid long, ts timestamp, v double"
    )
    out = {
        r["bucket"]: r
        for r in m4_downsample(
            df, group_cols=["g"], ts_col="ts", value_col="v",
            n_buckets=2, tiebreak_col="eid",
        ).collect()
    }
    b0, b1 = out[0], out[1]
    assert (b0["v_first"], b0["v_last"]) == (10.0, 2.0)
    assert (b0["v_min"], b0["v_max"]) == (2.0, 10.0)
    assert b0["t_max_s"] - b0["t_min_s"] == -50
    assert b0["n_points"] == 3
    # tie: v_min=7.0 at t=60 (earlier), v_max=8.0 at t=119
    assert (b1["v_min"], b1["t_min_s"] - b1["t_first_s"]) == (7.0, 0)
    assert (b1["v_max"], b1["v_last"]) == (8.0, 8.0)


def test_m4_single_instant_series_and_broadcast_bounds(spark):
    """A one-point series lands entirely in bucket 0 with itself as
    all four edges; the bounds join is broadcast."""
    df = spark.createDataFrame(
        [("s", 1, _ts(0), 5.0)], "g string, eid long, ts timestamp, v double"
    )
    q = m4_downsample(
        df, group_cols=["g"], ts_col="ts", value_col="v",
        n_buckets=8, tiebreak_col="eid",
    )
    rows = q.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["bucket"] == 0
    assert (
        r["v_first"], r["v_last"], r["v_min"], r["v_max"], r["n_points"]
    ) == (5.0, 5.0, 5.0, 5.0, 1)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan

    with pytest.raises(ValueError):
        m4_downsample(
            df, group_cols=["g"], ts_col="ts", value_col="v", n_buckets=0
        )


def test_lttb_hand_computed(spark):
    """6 points, n_out=4 -> 2 interior buckets of 2. Bucket 0 anchors
    on bucket 1's average (3.5, 2.5): the spike (1,10) wins area 32.5
    vs 5. Bucket 1 anchors on the last point from the spike: (4,0)
    wins area 10 vs 0 (the point (3,5) is COLLINEAR with spike and
    last -> zero triangle)."""
    from data_pipeline_mlops_spark.operators.lttb import lttb_downsample

    rows = [
        ("s", k, _ts(k), v)
        for k, v in enumerate([0.0, 10.0, 0.0, 5.0, 0.0, 0.0])
    ]
    df = spark.createDataFrame(
        rows, "g string, eid long, ts timestamp, v double"
    )
    out = lttb_downsample(
        df, group_cols=["g"], ts_col="ts", value_col="v",
        n_out=4, tiebreak_col="eid",
    ).orderBy("pos").collect()
    assert [(r["pos"], r["eid"], r["value"]) for r in out] == [
        (0, 0, 0.0), (1, 1, 10.0), (2, 4, 0.0), (3, 5, 0.0),
    ]


def test_lttb_area_tie_picks_earliest(spark):
    """Two candidates with exactly equal areas (symmetric spikes
    around the anchor line) -> the earlier (ts, tiebreak) point is
    selected, matching the oracle's list_position-of-max rule."""
    from data_pipeline_mlops_spark.operators.lttb import lttb_downsample

    # one interior bucket (n_out=3); candidates (1,5) and (2,-5) are
    # equidistant from the a->c chord v=0: |area| equal.
    rows = [
        ("s", 0, _ts(0), 0.0),
        ("s", 1, _ts(1), 5.0),
        ("s", 2, _ts(2), -5.0),
        ("s", 3, _ts(3), 0.0),
    ]
    df = spark.createDataFrame(
        rows, "g string, eid long, ts timestamp, v double"
    )
    out = lttb_downsample(
        df, group_cols=["g"], ts_col="ts", value_col="v",
        n_out=3, tiebreak_col="eid",
    ).orderBy("pos").collect()
    assert [r["eid"] for r in out] == [0, 1, 3]


def test_lttb_short_series_passthrough_and_validation(spark):
    from data_pipeline_mlops_spark.operators.lttb import lttb_downsample

    rows = [("s", k, _ts(k), float(k)) for k in range(3)]
    df = spark.createDataFrame(
        rows, "g string, eid long, ts timestamp, v double"
    )
    out = lttb_downsample(
        df, group_cols=["g"], ts_col="ts", value_col="v",
        n_out=10, tiebreak_col="eid",
    ).orderBy("pos").collect()
    assert [(r["pos"], r["eid"]) for r in out] == [(0, 0), (1, 1), (2, 2)]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        lttb_downsample(
            df, group_cols=["g"], ts_col="ts", value_col="v",
            n_out=2, tiebreak_col="eid",
        )


def test_bucketed_ema_recurrence_and_pandas_parity(spark):
    """EMA over hourly buckets: ema_0 = x_0, then
    (alpha*x) + (beta*ema). Matches pandas ewm(adjust=False) exactly;
    buckets with several points average with the decimal-exact mean
    first; missing buckets are skipped (no zero-fill)."""
    import pandas as pd

    from data_pipeline_mlops_spark.operators.ema import bucketed_ema

    rows = [
        ("s", _ts(0), 10.0),
        ("s", _ts(60), 20.0),          # same hour -> avg 15.0
        ("s", _ts(3600), 30.0),
        ("s", _ts(3 * 3600), 7.0),     # hour 2 missing -> skipped
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = (
        bucketed_ema(
            df, group_cols=["g"], ts_col="ts", value_col="v",
            alpha=0.3, bucket="hour",
        )
        .orderBy("bucket_s")
        .collect()
    )
    assert [r["bucket_avg"] for r in out] == [15.0, 30.0, 7.0]
    expected = (
        pd.Series([15.0, 30.0, 7.0]).ewm(alpha=0.3, adjust=False).mean()
    )
    assert [r["ema"] for r in out] == list(expected)
    # buckets are date_trunc boundaries, 1 h and 3 h after T0's hour
    assert out[1]["bucket_s"] - out[0]["bucket_s"] == 3600
    assert out[2]["bucket_s"] - out[0]["bucket_s"] == 3 * 3600

    import pytest as _pytest

    with _pytest.raises(ValueError):
        bucketed_ema(
            df, group_cols=["g"], ts_col="ts", value_col="v", alpha=0.0
        )


def test_dashboard_candles_table(spark):
    """The beyond-parity seventh dashboard table: hourly order-value
    candlesticks per category; parity default stays five tables."""
    from data_pipeline_mlops_spark.streaming import microbatch

    t0 = T0.replace(hour=10)
    rows = [
        (1, t0, 100.0, 1, "p1", "c1", "r1", 2, "completed"),
        (2, t0 + dt.timedelta(minutes=10), 40.0, 2, "p2", "c1", "r1",
         1, "completed"),
        (3, t0 + dt.timedelta(hours=1), 70.0, 1, "p1", "c2", "r1", 1,
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
        qty_col="qty", include_candles=True,
    )
    candles = {
        (r["category"], r["bucket_hour"].hour): r
        for r in m["hourly_candles"].collect()
    }
    c1 = candles[("c1", 10)]
    assert (c1["open"], c1["high"], c1["low"], c1["close"]) == (
        100.0, 100.0, 40.0, 40.0,
    )
    assert (c1["n_ticks"], c1["volume"]) == (2, 140.0)
    assert candles[("c2", 11)]["open"] == 70.0
    five = microbatch.dashboard_metrics(
        df, ts_col="ts", amount_col="amt", customer_col="cust",
        product_col="prod", category_col="cat", region_col="reg",
        qty_col="qty",
    )
    assert "hourly_candles" not in five and len(five) == 5


def test_cusum_drift_detects_level_shift(spark):
    """Flat series at 10 for 4 days then a sustained shift to 18:
    mu = 14, so low days add (14 - 10) - 1 = 3 to the NEGATIVE
    accumulator and shifted days add 3 to the POSITIVE one — both
    phases alert once their side crosses h = 5 (two-sided CUSUM
    flags sustained deviation from the baseline in either
    direction)."""
    import math

    from data_pipeline_mlops_spark.operators.changepoint import cusum_drift

    rows = []
    days = [10.0] * 4 + [18.0] * 4
    for d, v in enumerate(days):
        rows.append(("s", T0 + dt.timedelta(days=d), v))
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = sorted(
        cusum_drift(
            df, group_cols=["g"], ts_col="ts", value_col="v",
            k=1.0, h=5.0, bucket="day",
        ).collect(),
        key=lambda r: r["bucket_s"],
    )
    mu = 14.0
    # replay BOTH accumulators: the low phase drifts the negative
    # side, the shifted phase the positive side
    sp = sn = 0.0
    expect_alerts = []
    for v in days:
        sp = max(0.0, sp + ((v - mu) - 1.0))
        sn = max(0.0, sn + ((mu - v) - 1.0))
        expect_alerts.append(sp > 5.0 or sn > 5.0)
    assert [r["drift_alert"] for r in out] == expect_alerts
    assert any(expect_alerts)           # drift IS detected
    assert not expect_alerts[0]         # not on the first day
    assert all(math.isclose(r["bucket_avg"], v) for r, v in zip(out, days))

    import pytest as _pytest

    with _pytest.raises(ValueError):
        cusum_drift(
            df, group_cols=["g"], ts_col="ts", value_col="v",
            k=-1.0, h=5.0,
        )


def test_holt_linear_recurrence(spark):
    """Holt double smoothing: zero-initialized trend, then
    level/trend recurrences replayed by hand; forecast = level+trend.
    A rising ramp develops a positive trend."""
    from data_pipeline_mlops_spark.operators.ema import holt_linear

    vals = [10.0, 12.0, 14.0, 16.0]
    rows = [("s", T0 + dt.timedelta(hours=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = sorted(
        holt_linear(
            df, group_cols=["g"], ts_col="ts", value_col="v",
            alpha=0.4, gamma=0.2, bucket="hour",
        ).collect(),
        key=lambda r: r["bucket_s"],
    )
    a, g = 0.4, 0.2
    ac, gc = 1.0 - a, 1.0 - g
    level, trend = vals[0], 0.0
    exp = [(level, trend)]
    for x in vals[1:]:
        prev = level
        level = (a * x) + (ac * (level + trend))
        trend = (g * (level - prev)) + (gc * trend)
        exp.append((level, trend))
    assert [(r["level"], r["trend"]) for r in out] == exp
    assert all(r["forecast_next"] == r["level"] + r["trend"] for r in out)
    assert out[-1]["trend"] > 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        holt_linear(
            df, group_cols=["g"], ts_col="ts", value_col="v",
            alpha=0.4, gamma=1.5,
        )


def test_rolling_kmv_exact_below_capacity(spark, monkeypatch):
    """With fewer than k distinct users in every 7-day pool, the
    sketch is below capacity and the estimate IS the exact rolling
    distinct count; day windows slide by calendar RANGE (a day gap
    still counts inside the 7-day span)."""
    from data_pipeline_mlops_spark import registry

    rows = []
    # day 0: users 1,2 | day 1: users 2,3 | day 3: user 9 (gap day 2)
    for day, users in [(0, [1, 2]), (1, [2, 3]), (3, [9])]:
        for j, u in enumerate(users):
            rows.append(
                (day * 10 + j, T0 + dt.timedelta(days=day), u, "view",
                 1.0, "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(
        registry, "load_table", lambda s, sf, name: df
    )
    out = {
        str(r["day"]): r
        for r in registry.QUERIES["rolling_distinct_users_kmv"]
        .spark(spark, "ignored")
        .collect()
    }
    d0 = T0.date()
    assert out[str(d0)]["est_distinct"] == 2.0          # {1,2}
    assert out[str(d0 + dt.timedelta(days=1))]["est_distinct"] == 3.0
    r3 = out[str(d0 + dt.timedelta(days=3))]
    assert r3["est_distinct"] == 4.0                    # {1,2,3,9}
    assert r3["window_days"] == 3                       # gap day absent


def test_lttb_oracle_short_series_guard(spark):
    """ADVICE r10: the DuckDB LTTB oracle must match the Spark
    operator on series with <= n_out points (pass-through, pos=rank),
    not only on the long series the sf fixtures happen to contain.
    Mixed fixture: 1-point, 5-point, and 70-point series."""
    import duckdb

    from data_pipeline_mlops_spark.operators.lttb import lttb_downsample
    from data_pipeline_mlops_spark.registry import (
        ORACLE_EVENT_LTTB_DOWNSAMPLE,
    )
    from tests.oracle_compare import compare

    rows = (
        [("solo", 0, _ts(0), 7.5)]
        + [("short", 10 + k, _ts(60 * k), float(k % 3)) for k in range(5)]
        + [
            ("long", 100 + k, _ts(60 * k), float((k * 37) % 11) - 5.0)
            for k in range(70)
        ]
    )
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts timestamp, value double"
    )
    sdf = lttb_downsample(
        df, group_cols=["event_type"], ts_col="ts", value_col="value",
        n_out=64, tiebreak_col="event_id",
    )
    import pandas as pd

    events = pd.DataFrame(
        rows, columns=["event_type", "event_id", "ts", "value"]
    )
    con = duckdb.connect()
    con.register("events", events)
    result = compare(sdf, con, ORACLE_EVENT_LTTB_DOWNSAMPLE)
    con.close()
    assert result["cols_match"] and result["rows_match"], result
    assert result["values_match"], result


def test_kmv_audience_overlap_accuracy_and_exact_regime(spark):
    """kmv_audience_overlap sanity against EXACT set arithmetic at
    sf0.001: every pair's union/intersection estimate within the KMV
    k=64 error envelope (rel err ~ 1/sqrt(k-2) ~ 13%; 3-sigma bound
    asserted), and any below-capacity sketch is EXACT by construction."""
    from pyspark.sql import functions as F

    from data_pipeline_mlops_spark.registry import QUERIES
    from data_pipeline_mlops_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    est = {
        (r["type_a"], r["type_b"]): r
        for r in QUERIES["kmv_audience_overlap"]
        .spark(spark, SF_SMALL)
        .collect()
    }
    assert est, "no event-type pairs"
    ev = load_table(spark, SF_SMALL, "events")
    users = {
        r["event_type"]: set(r["us"])
        for r in ev.groupBy("event_type")
        .agg(F.collect_set("user_id").alias("us"))
        .collect()
    }
    tol = 3.0 / (63 ** 0.5)  # 3 sigma of the KMV estimator
    for (a, b), r in est.items():
        inter = len(users[a] & users[b])
        union = len(users[a] | users[b])
        # estimates are e4-scaled BIGINTs (ADVICE r11: explicit
        # half-up integer contract instead of ROUND(double, 4))
        est_union = r["est_union_e4"] / 10000.0
        est_inter = r["est_intersection_e4"] / 10000.0
        assert abs(est_union - union) <= max(tol * union, 1.0), (
            a, b, est_union, union,
        )
        assert abs(est_inter - inter) <= max(
            tol * union, 1.0
        ), (a, b, est_inter, inter)
        # sketches below capacity (= sets smaller than k) are exact
        if len(users[a]) < 64 and len(users[b]) < 64 and union < 64:
            assert r["est_intersection_e4"] == inter * 10000
            assert r["est_union_e4"] == union * 10000
