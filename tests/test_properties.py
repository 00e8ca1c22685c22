"""Property-based tests (hypothesis) for operator invariants —
the reference has no test suite (SURVEY.md §5); properties pin the
semantic contracts that example-based tests can miss."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

ROW = st.tuples(
    st.integers(0, 1_000_000),  # id
    st.floats(-1e4, 1e4, allow_nan=False, allow_infinity=False),  # price
    st.integers(-5, 10),  # quantity
    st.sampled_from(["completed", "pending", "", None]),  # status
)

common = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(rows=st.lists(ROW, min_size=0, max_size=30))
@common
def test_clean_fact_invariants(spark, rows):
    from data_pipeline_mlops_spark.operators.clean import clean_fact

    df = spark.createDataFrame(
        [(i, p, q, s) for i, p, q, s in rows],
        "id long, price double, quantity int, status string",
    )
    out = clean_fact(
        df, id_col="id", qty_col="quantity", price_col="price",
        status_col="status", total_col="total",
    ).collect()
    # invariants: no non-positive quantities, no negative prices,
    # no empty/null status, total == round(price*qty, 2)
    for r in out:
        assert r["quantity"] > 0
        assert r["price"] >= 0
        assert r["status"] not in ("", None)
        assert abs(r["total"] - round(r["price"] * r["quantity"], 2)) < 0.011
    # no row that satisfied all predicates is dropped
    expected = sum(
        1
        for i, p, q, s in rows
        if q > 0 and s not in ("", None)
    )
    assert len(out) == expected


@given(
    vals=st.lists(
        st.floats(0.01, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=50,
    ),
    parts=st.integers(1, 7),
)
@common
def test_money_sum_partition_invariant(spark, vals, parts):
    """Decimal-routed sums are identical under any repartitioning —
    the invariant the whole oracle-match strategy rests on."""
    from data_pipeline_mlops_spark.operators.exact import money_sum

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    a = df.agg(money_sum("v", "s")).collect()[0]["s"]
    b = df.repartition(parts).agg(money_sum("v", "s")).collect()[0]["s"]
    assert a == b


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=40,
    )
)
@common
def test_similarity_symmetric_and_bounded(spark, pairs):
    from data_pipeline_mlops_spark.ml import cf

    df = spark.createDataFrame(
        [(f"u{u}", f"i{i}") for u, i in pairs], "user string, item string"
    ).dropDuplicates()
    sim = cf.item_similarity(df, user_col="user", item_col="item").collect()
    for r in sim:
        assert r["item_a"] < r["item_b"]  # strict upper triangle
        assert 0 < r["cosine_sim"] <= 1.0 + 1e-9  # cosine of binary vectors
        assert r["cooccurrence"] >= 1


EVENT = st.tuples(
    st.integers(0, 999),      # event id (unique-ified by index below)
    st.integers(0, 3),        # key
    st.integers(0, 500),      # ts seconds offset
)


@given(
    left=st.lists(EVENT, min_size=0, max_size=15),
    right=st.lists(EVENT, min_size=0, max_size=15),
)
@common
def test_banded_interval_join_equals_naive(spark, left, right):
    """The banded equi-join rewrite must return EXACTLY the pairs of
    the naive range join, for any key/time layout (including band
    boundaries, duplicates, and empty sides)."""
    import datetime as dt

    from data_pipeline_mlops_spark.operators.rangejoin import (
        banded_interval_join,
    )

    base = dt.datetime(2024, 1, 1)
    mk = lambda rows, pfx: [  # noqa: E731
        (i, k, base + dt.timedelta(seconds=s))
        for i, (eid, k, s) in enumerate(rows)
    ]
    l = spark.createDataFrame(
        mk(left, "l") or [(0, 0, base)], "lid long, k long, lts timestamp"
    ).limit(len(left))
    r = spark.createDataFrame(
        mk(right, "r") or [(0, 0, base)], "rid long, k long, rts timestamp"
    ).limit(len(right))

    got = {
        (x.lid, x.rid)
        for x in banded_interval_join(
            l, r, on="k", left_ts="lts", right_ts="rts", max_diff_sec=60
        ).collect()
    }
    lrows, rrows = l.collect(), r.collect()
    want = {
        (a.lid, b.rid)
        for a in lrows
        for b in rrows
        if a.k == b.k and abs((a.lts - b.rts).total_seconds()) <= 60
    }
    assert got == want


@given(
    left=st.lists(EVENT, min_size=0, max_size=12),
    right=st.lists(EVENT, min_size=0, max_size=12),
)
@common
def test_asof_join_equals_naive(spark, left, right):
    """asof_join must agree with the obvious per-row maximum: the
    qualifying right row with the greatest (ts, tiebreak)."""
    import datetime as dt

    from data_pipeline_mlops_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    mk = lambda rows: [  # noqa: E731
        (i, k, base + dt.timedelta(seconds=s))
        for i, (eid, k, s) in enumerate(rows)
    ]
    l = spark.createDataFrame(
        mk(left) or [(0, 0, base)], "lid long, k long, ts timestamp"
    ).limit(len(left))
    r = spark.createDataFrame(
        mk(right) or [(0, 0, base)], "rid long, k long, ts timestamp"
    ).limit(len(right))

    got = {
        x.lid: x.m_rid
        for x in asof_join(
            l, r, on="k", left_ts="ts", right_ts="ts",
            payload=["rid"], tiebreak="rid", payload_prefix="m_",
        ).collect()
    }
    rrows = r.collect()
    for a in l.collect():
        cands = [b for b in rrows if b.k == a.k and b.ts <= a.ts]
        want = max(cands, key=lambda b: (b.ts, b.rid)).rid if cands else None
        assert got[a.lid] == want, (a.lid, got[a.lid], want)


@given(
    left=st.lists(EVENT, min_size=0, max_size=10),
    right=st.lists(EVENT, min_size=0, max_size=10),
)
@common
def test_asof_forward_and_nearest_equal_naive(spark, left, right):
    """forward must pick the qualifying right row with the SMALLEST
    (ts, tiebreak) at or after the left ts; nearest must pick the
    smaller absolute gap with exact ties preferring backward."""
    import datetime as dt

    from data_pipeline_mlops_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    mk = lambda rows: [  # noqa: E731
        (i, k, base + dt.timedelta(seconds=s))
        for i, (eid, k, s) in enumerate(rows)
    ]
    l = spark.createDataFrame(
        mk(left) or [(0, 0, base)], "lid long, k long, ts timestamp"
    ).limit(len(left))
    r = spark.createDataFrame(
        mk(right) or [(0, 0, base)], "rid long, k long, ts timestamp"
    ).limit(len(right))
    rrows = r.collect()

    got_f = {
        x.lid: x.m_rid
        for x in asof_join(
            l, r, on="k", left_ts="ts", right_ts="ts",
            payload=["rid"], tiebreak="rid", payload_prefix="m_",
            direction="forward",
        ).collect()
    }
    got_n = {
        x.lid: x.m_rid
        for x in asof_join(
            l, r, on="k", left_ts="ts", right_ts="ts",
            payload=["rid"], tiebreak="rid", payload_prefix="m_",
            direction="nearest",
        ).collect()
    }
    for a in l.collect():
        fw = [b for b in rrows if b.k == a.k and b.ts >= a.ts]
        want_f = (
            min(fw, key=lambda b: (b.ts, b.rid)).rid if fw else None
        )
        assert got_f[a.lid] == want_f, (a.lid, got_f[a.lid], want_f)

        bw = [b for b in rrows if b.k == a.k and b.ts <= a.ts]
        want_b = max(bw, key=lambda b: (b.ts, b.rid)).rid if bw else None
        if want_b is None:
            want_n = want_f
        elif want_f is None:
            want_n = want_b
        else:
            b_ts = max(bw, key=lambda b: (b.ts, b.rid)).ts
            f_ts = min(fw, key=lambda b: (b.ts, b.rid)).ts
            want_n = (
                want_b
                if (a.ts - b_ts) <= (f_ts - a.ts)
                else want_f
            )
        assert got_n[a.lid] == want_n, (a.lid, got_n[a.lid], want_n)


@given(
    batches=st.lists(
        st.lists(
            st.tuples(st.integers(0, 5), st.integers(0, 50)),  # (k, v)
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=3,
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_upsert_batches_converge_to_dict_replay(spark, batches):
    """Applying random batches through the partition-scoped upsert sink
    must leave exactly the state of a driver-side dict replay (winner
    per key = highest v, later batch wins ties). Partition is a pure
    function of the key, per the sink's contract."""
    import tempfile

    from data_pipeline_mlops_spark.streaming.upsert_sink import upsert_batch

    path = tempfile.mkdtemp() + "/tbl"
    state: dict[int, int] = {}
    for batch in batches:
        # unique (k, v) per batch: equal-order rows within one batch
        # have no defined winner (same key, same v, same precedence)
        batch = sorted(set(batch))
        for k, v in batch:
            if k not in state or v >= state[k]:
                state[k] = v
        if not batch:
            continue
        bdf = spark.createDataFrame(
            [(k, v, f"p{k % 2}") for k, v in batch],
            "k long, v long, p string",
        )
        upsert_batch(
            bdf, path=path, key_cols=["k"], order_col="v",
            partition_col="p",
        )
    if state:
        got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
        assert got == set(state.items())


@given(
    n_vertices=st.integers(1, 12),
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=0,
        max_size=25,
    ),
)
@common
def test_connected_components_equals_union_find(spark, n_vertices, edges):
    """Hash-min label propagation must produce exactly the components
    of a driver-side union-find, for any random graph — including
    self-loops, duplicate/reversed edges, and long chains (the worst
    case for round count)."""
    from data_pipeline_mlops_spark.functions.graph import (
        connected_components,
    )

    vs = list(range(n_vertices))
    es = [(a, b) for a, b in edges if a < n_vertices and b < n_vertices]

    parent = {v: v for v in vs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in es:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: min(u for u in vs if find(u) == find(v)) for v in vs}

    vdf = spark.createDataFrame([(v,) for v in vs], "v long")
    edf = spark.createDataFrame(
        es or [(0, 0)], "a long, b long"
    ).limit(len(es))
    got = {
        r.v: r.component
        for r in connected_components(
            vdf, edf, vertex_col="v", src_col="a", dst_col="b"
        ).collect()
    }
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.integers(0, 12), min_size=1, max_size=15),
        min_size=2,
        max_size=12,
    ),
    max_h=st.integers(1, 6),
)
@common
def test_simhash_banded_pairs_complete_on_random_docs(spark, docs, max_h):
    """Pigeonhole completeness on arbitrary corpora: the banded join
    must return exactly the brute-force Hamming pairs for any token
    layout and any bound (duplicate texts -> distance 0 included)."""
    from data_pipeline_mlops_spark.functions.dedup_text import (
        simhash,
        simhash_near_dups,
    )

    rows = [(i, " ".join(f"t{w}" for w in ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dups(
            df, id_col="doc_id", max_hamming=max_h, hash_method="xxhash64"
        ).collect()
    }
    fps = {r.doc_id: r.simhash for r in simhash(
        df, id_col="doc_id", hash_method="xxhash64").collect()}
    want = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for a in fps
        for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= max_h
    }
    assert got == want


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3 * 86_400 - 1),          # seconds offset
            st.sampled_from(["view", "buy"]),
            st.floats(0.01, 500.0, allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=40,
    )
)
@common
def test_cascade_rollup_equals_direct_aggregation(spark, events):
    """The minute->hour->day cascade must be EXACTLY the direct daily
    aggregation for any event layout — the decomposability identity
    incremental maintenance relies on (decimal sums make it exact)."""
    import datetime as dt

    from data_pipeline_mlops_spark.operators.aggregate import cascade_rollup
    from data_pipeline_mlops_spark.operators.exact import money_sum

    base = dt.datetime(2024, 3, 1)
    df = spark.createDataFrame(
        [(base + dt.timedelta(seconds=s), t, v) for s, t, v in events],
        "ts timestamp, event_type string, value double",
    )
    got = {
        (r.day, r.event_type): (r.n, r.sv)
        for r in cascade_rollup(
            df, ts_col="ts", keys=["event_type"], value_col="value"
        )
        .select(
            F.to_date("bucket").alias("day"),
            "event_type",
            F.col("n_events").cast("long").alias("n"),
            F.round("__sv", 2).cast("double").alias("sv"),
        )
        .collect()
    }
    want = {
        (r.day, r.event_type): (r.n, r.sv)
        for r in df.groupBy(
            F.to_date(F.date_trunc("day", "ts")).alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), money_sum("value", "sv"))
        .collect()
    }
    assert got == want


MERGE_OP = st.tuples(
    st.integers(0, 14),                      # key
    st.sampled_from(["a", "b", "c"]),        # partition
    st.integers(0, 100),                     # value
    st.booleans(),                           # is_delete
)


@given(
    init=st.lists(
        st.tuples(
            st.integers(0, 14),
            st.sampled_from(["a", "b", "c"]),
            st.integers(0, 100),
        ),
        min_size=0,
        max_size=12,
        unique_by=lambda r: r[0],
    ),
    batches=st.lists(
        st.lists(MERGE_OP, min_size=1, max_size=6,
                 unique_by=lambda r: r[0]),
        min_size=1,
        max_size=3,
    ),
)
@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_merge_into_matches_dict_model(spark, tmp_path_factory, init, batches):
    """merge_into over any op sequence must equal the obvious
    dict-by-key model (update replaces the full row, delete removes,
    insert adds, delete-of-absent is a no-op) — including partition
    moves and emptied partitions."""
    from data_pipeline_mlops_spark.sources.merge import merge_into
    from data_pipeline_mlops_spark.sources.txn import ManifestTable

    tdir = tmp_path_factory.mktemp("merge_prop")
    table = ManifestTable(str(tdir / "t"))
    table.commit(
        spark.createDataFrame(init, "k long, p string, v long")
        if init
        else spark.createDataFrame([], "k long, p string, v long"),
        partition_col="p",
        mode="replace_all",
    )
    model = {k: (p, v) for k, p, v in init}
    for batch in batches:
        src = spark.createDataFrame(
            batch, "k long, p string, v long, is_delete boolean"
        )
        merge_into(spark, table, src, on=["k"], delete_col="is_delete")
        for k, p, v, is_del in batch:
            if is_del:
                model.pop(k, None)
            else:
                model[k] = (p, v)
    got = {r.k: (r.p, r.v) for r in table.read(spark).collect()}
    assert got == model


@given(
    host=st.from_regex(r"[a-z]{1,8}(\.[a-z]{1,6}){1,2}", fullmatch=True),
    path=st.from_regex(r"(/[A-Za-z0-9]{0,6}){0,3}", fullmatch=True),
    params=st.lists(
        st.tuples(
            st.sampled_from(
                ["id", "q", "page", "utm_source", "utm_campaign", "ref"]
            ),
            st.from_regex(r"[A-Za-z0-9]{0,5}", fullmatch=True),
        ),
        max_size=4,
    ),
    www=st.booleans(),
    upper=st.booleans(),
    frag=st.booleans(),
)
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_canonicalize_url_idempotent_and_variant_stable(
    spark, host, path, params, www, upper, frag
):
    """canonicalize(canonicalize(x)) == canonicalize(x), and the
    www/case/fragment variants of the same URL canonicalize equal."""
    from data_pipeline_mlops_spark.functions.url import canonicalize_url

    q = "&".join(f"{k}={v}" for k, v in params)
    base = f"https://{host}{path}" + (f"?{q}" if q else "")
    variant = (
        ("HTTPS://" if upper else "https://")
        + ("www." if www else "")
        + (host.upper() if upper else host)
        + path
        + (f"?{q}" if q else "")
        + ("#frag" if frag else "")
    )
    df = spark.createDataFrame([(base,), (variant,)], "url string")
    out = df.select(canonicalize_url("url").alias("c"))
    c1, c2 = [r.c for r in out.collect()]
    assert c1 == c2
    # idempotence
    df2 = spark.createDataFrame([(c1,)], "url string")
    again = df2.select(canonicalize_url("url").alias("c")).collect()[0].c
    assert again == c1


def test_canonicalize_url_trailing_slash_run(spark):
    """Regression (r5 verdict): a trailing RUN of slashes must reach
    the fixed point in ONE pass — `/$` stripped only one slash, so
    `https://a.a//` needed two canonicalization passes."""
    from data_pipeline_mlops_spark.functions.url import canonicalize_url

    urls = ["https://a.a//", "https://a.a///", "https://a.a/p///"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    first = [r.c for r in df.select(canonicalize_url("url").alias("c")).collect()]
    assert first == ["https://a.a", "https://a.a", "https://a.a/p"]
    df2 = spark.createDataFrame([(c,) for c in first], "url string")
    second = [r.c for r in df2.select(canonicalize_url("url").alias("c")).collect()]
    assert second == first


@given(
    weights=st.lists(st.integers(1, 50), min_size=5, max_size=60),
    k=st.integers(1, 20),
)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_pps_total_picks_always_k(spark, weights, k):
    from data_pipeline_mlops_spark.operators.sample import (
        systematic_pps_sample,
    )

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "id long, w long"
    )
    out = systematic_pps_sample(df, id_col="id", weight_col="w", k=k)
    assert sum(r.n_picks for r in out.collect()) == k


@given(
    shared=st.lists(
        st.from_regex(r"[a-z]{2,5}", fullmatch=True),
        min_size=8, max_size=8, unique=True,
    ),
    pre_a=st.lists(st.from_regex(r"[A-Z]{2,4}", fullmatch=True), max_size=4),
    pre_b=st.lists(st.from_regex(r"[0-9]{2,4}", fullmatch=True), max_size=4),
)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_winnowing_theorem_on_random_docs(spark, shared, pre_a, pre_b):
    """Any two docs sharing a run of k+window-1 = 8 tokens share at
    least one winnowing fingerprint (k=4, window=5), regardless of
    their distinct surroundings."""
    from data_pipeline_mlops_spark.functions.dedup_text import (
        winnowing_fingerprints,
    )

    run = " ".join(shared)
    doc_a = " ".join(pre_a + [run])
    doc_b = " ".join([run] + pre_b)
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string"
    )
    fps = {}
    for r in winnowing_fingerprints(df, k=4, window=5).collect():
        fps.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert fps[1] & fps[2]


# -- MP3 frame walker (round 9): encode->parse is exact on every
#    spec-valid parameter combination, including VBR cycles, ID3v2
#    tags, mono/stereo, all three MPEG-1 samplerates, and MPEG-2 ----

from hypothesis import given
from hypothesis import strategies as st


@given(
    n_frames=st.integers(min_value=1, max_value=40),
    sr_idx=st.integers(min_value=0, max_value=2),
    mono=st.booleans(),
    idxs=st.lists(
        st.integers(min_value=1, max_value=14), min_size=1, max_size=5
    ),
    id3=st.one_of(st.none(), st.integers(min_value=0, max_value=200)),
    mpeg2=st.booleans(),
)
def test_mp3_encode_parse_round_trip(n_frames, sr_idx, mono, idxs, id3, mpeg2):
    from data_pipeline_mlops_spark.functions.multimodal import (
        _MP3_BITRATES_V1_L3,
        _MP3_BITRATES_V2_L3,
        _MP3_SAMPLERATES_V1,
        encode_mp3_planted,
        parse_mp3_frames,
    )

    blob = encode_mp3_planted(
        n_frames=n_frames, sr_idx=sr_idx, mono=mono,
        bitrate_indices=idxs, id3_size=id3, mpeg2=mpeg2,
    )
    got = parse_mp3_frames(blob)
    table = _MP3_BITRATES_V2_L3 if mpeg2 else _MP3_BITRATES_V1_L3
    used = [table[idxs[i % len(idxs)]] for i in range(n_frames)]
    sr = _MP3_SAMPLERATES_V1[sr_idx] // (2 if mpeg2 else 1)
    spf = 576 if mpeg2 else 1152
    assert got == {
        "n_frames": n_frames,
        "sample_rate": sr,
        "channels": 1 if mono else 2,
        "bitrate_min_kbps": min(used),
        "bitrate_max_kbps": max(used),
        "is_vbr": min(used) != max(used),
        "duration_ms": n_frames * spf * 1000 // sr,
    }
    # and any byte-truncation of the final frame must reject, not lie
    assert parse_mp3_frames(blob[:-1]) is None


GF_OBS = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2"]),
        st.integers(0, 14),                     # day offset
        st.floats(-100, 100, allow_nan=False, allow_infinity=False),
    ),
    min_size=1, max_size=20,
)


@given(obs=GF_OBS)
@common
def test_gapfill_matches_pure_python_reference(spark, obs):
    """time_bucket_gapfill (zero + locf + interp + mark) vs a
    dict-based single-threaded replay: same spine, same fills,
    same NULL edges — regardless of group layout or gap pattern."""
    import datetime as dt

    from data_pipeline_mlops_spark.operators.gapfill import (
        time_bucket_gapfill,
    )

    base = dt.date(2024, 3, 1)
    # one row per (group, day): keep the last-listed observation,
    # mirroring an upstream aggregation
    agg = {}
    for g, off, v in obs:
        agg[(g, off)] = v
    rows = [
        (g, base + dt.timedelta(days=off), 1, v, v, v)
        for (g, off), v in agg.items()
    ]
    df = spark.createDataFrame(
        rows, "g string, day date, n long, z double, l double, i double"
    )
    got = {
        (r["g"], r["day"].toordinal() - base.toordinal()): r
        for r in time_bucket_gapfill(
            df, group_cols=["g"], bucket_col="day",
            zero_cols=["n", "z"], locf_cols=["l"], interp_cols=["i"],
        ).collect()
    }

    lo = min(o for _, o in agg)
    hi = max(o for _, o in agg)
    groups = {g for g, _ in agg}
    assert len(got) == len(groups) * (hi - lo + 1)
    for g in groups:
        days = sorted(o for (gg, o) in agg if gg == g)
        for d in range(lo, hi + 1):
            r = got[(g, d)]
            if (g, d) in agg:
                v = agg[(g, d)]
                assert (r["n"], r["z"], r["l"], r["i"], r["filled"]) == (
                    1, v, v, v, False,
                )
                continue
            assert r["filled"] and r["n"] == 0 and r["z"] == 0.0
            prevs = [o for o in days if o < d]
            nexts = [o for o in days if o > d]
            assert r["l"] == (agg[(g, prevs[-1])] if prevs else None)
            if not prevs or not nexts:
                assert r["i"] is None
            else:
                p, nx = prevs[-1], nexts[0]
                pv, nv = agg[(g, p)], agg[(g, nx)]
                want = pv + (nv - pv) * ((d - p) / (nx - p))
                assert r["i"] == want  # same IEEE association
