"""Behavioral tests for the round-5 additions: corpus mixture
scheduling, count-min / Bloom sketches, and distributed BPE training.
The registry oracles check engine parity; these tests check the
OPERATOR GUARANTEES (CMS never underestimates, Bloom never
false-negatives, mixture hits its integer targets, BPE merges are
greedy-leftmost) on corpora small enough to verify by hand."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.functions import bpe, mixture, sketch


# ----------------------------------------------------------------- mixture


def _toy_docs(spark):
    # lang a: 4 docs x 10 tokens = 40 available; lang b: 2 x 5 = 10
    rows = [(i, "a", 10) for i in range(4)] + [
        (10 + i, "b", 5) for i in range(2)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, n_tokens long"
    )


def test_mixture_plan_integer_arithmetic(spark):
    plan = mixture.mixture_plan(
        _toy_docs(spark),
        strata_col="lang",
        token_col="n_tokens",
        weights_ppm={"a": 500_000, "b": 500_000},
        budget_tokens=100,
    ).orderBy("lang")
    rows = {r["lang"]: r.asDict() for r in plan.collect()}
    # a: target 50 of 40 available -> 1 full epoch + 10/40 = 250000 ppm
    assert rows["a"]["target_tokens"] == 50
    assert rows["a"]["epochs_full"] == 1
    assert rows["a"]["frac_ppm"] == 250_000
    # b: target 50 of 10 available -> 5 full epochs + 0
    assert rows["b"]["epochs_full"] == 5
    assert rows["b"]["frac_ppm"] == 0


def test_mixture_schedule_deterministic_and_bounded(spark):
    docs = _toy_docs(spark)
    plan = mixture.mixture_plan(
        docs,
        strata_col="lang",
        token_col="n_tokens",
        weights_ppm={"a": 500_000, "b": 500_000},
        budget_tokens=100,
    )
    s1 = mixture.schedule_mixture(
        docs, plan, id_col="doc_id", strata_col="lang"
    )
    s2 = mixture.schedule_mixture(
        docs, plan, id_col="doc_id", strata_col="lang"
    )
    assert sorted(map(tuple, s1.collect())) == sorted(
        map(tuple, s2.collect())
    )
    got = {
        r["lang"]: r["t"]
        for r in s1.groupBy("lang")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    # b is exact (integral epochs); a is within one fractional doc of
    # target: 1 full epoch (40) + 0..1 gated docs (10 tokens each)
    assert got["b"] == 50
    assert got["a"] in (40, 50)
    # every full epoch is present for every doc
    n_full = s1.where(F.col("epoch") < 1).where(F.col("lang") == "a")
    assert n_full.count() == 4


def test_mixture_overweight_raises(spark):
    with pytest.raises(ValueError, match="exceed"):
        mixture.mixture_plan(
            _toy_docs(spark),
            strata_col="lang",
            token_col="n_tokens",
            weights_ppm={"a": 700_000, "b": 600_000},
            budget_tokens=10,
        )


# ----------------------------------------------------------------- sketches


def test_cms_never_underestimates(spark):
    df = spark.range(0, 2000).select(
        (F.col("id") % 37).alias("k")
    )
    cms = sketch.cms_build(df, "k", depth=4, width=16)  # force collisions
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    est = sketch.cms_lookup(cms, exact, "k", depth=4, width=16)
    joined = exact.join(est, "k")
    assert (
        joined.where(F.col("cms_estimate") < F.col("exact")).count() == 0
    )


def test_cms_merges_by_summing_counters(spark):
    a = spark.range(0, 500).select((F.col("id") % 11).alias("k"))
    b = spark.range(500, 900).select((F.col("id") % 11).alias("k"))
    merged = (
        sketch.cms_build(a, "k")
        .unionByName(sketch.cms_build(b, "k"))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    whole = sketch.cms_build(a.unionByName(b), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_bloom_no_false_negatives_and_some_rejections(spark):
    members = spark.range(0, 300).select(F.col("id").alias("k"))
    bloom = sketch.bloom_build(members, "k", n_words=64, k=5)
    assert bloom.count() <= 64
    probe = spark.range(0, 5000).select(F.col("id").alias("k"))
    got = sketch.bloom_probe(probe, bloom, "k", n_words=64, k=5)
    verdict = {r["k"]: r["maybe_member"] for r in got.collect()}
    assert all(verdict[k] for k in range(300))  # no false negatives
    rejected = sum(1 for k in range(300, 5000) if not verdict[k])
    assert rejected > 4000  # filter actually prunes


# ---------------------------------------------------------------------- bpe


def test_bpe_merge_is_greedy_leftmost(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "aaaa")], "id long, text string"
    )
    sym = bpe.symbolize(df, "text", max_chars=10)
    merged = {
        r["id"]: r["sym"]
        for r in bpe.merge_pair(sym, "a", "a").collect()
    }
    # run parity: leftmost non-overlapping
    assert merged[1] == ["aa", "a"]
    assert merged[2] == ["aa", "aa"]


def test_bpe_merge_prefix_hazard(spark):
    """A merged symbol that merely STARTS with the pair's right side
    must not fire: after merge (a,b) creates 'ab', applying merge
    (x,a) to [x, ab] must leave it untouched. (A delimiter-string
    REPLACE gets this wrong — it would fuse 'x|ab' into 'xab'.)"""
    df = spark.createDataFrame(
        [(1, "abababab"), (2, "xaxaxaxa"), (3, "xab")],
        "id long, text string",
    )
    merges, final = bpe.bpe_train(df, "text", n_merges=2)
    assert (merges[0].left_sym, merges[0].right_sym, merges[0].cnt) == (
        "a", "b", 5,
    )
    assert (merges[1].left_sym, merges[1].right_sym, merges[1].cnt) == (
        "x", "a", 4,
    )
    syms = {r["id"]: r["sym"] for r in final.collect()}
    assert syms[3] == ["x", "ab"]  # NOT ['xab']
    assert syms[2] == ["xa", "xa", "xa", "xa"]


def test_bpe_train_known_trace(spark):
    df = spark.createDataFrame(
        [(1, "abab"), (2, "abab"), (3, "abba")],
        "id long, text string",
    )
    merges, final = bpe.bpe_train(df, "text", n_merges=2)
    # pairs: (a,b) x5, (b,a) x3 -> merge0 = (a,b) cnt 5
    assert (
        merges[0].left_sym,
        merges[0].right_sym,
        merges[0].cnt,
    ) == ("a", "b", 5)
    # after merge0: [ab,ab] x2, [ab,b,a] -> top pair (ab,ab) cnt 2
    assert (
        merges[1].left_sym,
        merges[1].right_sym,
        merges[1].cnt,
    ) == ("ab", "ab", 2)
    syms = {r["id"]: r["sym"] for r in final.collect()}
    assert syms[1] == ["abab"]
    assert syms[3] == ["ab", "b", "a"]


def _naive_bpe(texts, n_merges, max_chars):
    """Token-greedy reference implementation (pure Python)."""
    import re
    from collections import Counter

    seqs = []
    for t in texts:
        c = re.sub("[^a-z ]", "", t[:max_chars].lower())
        if c:
            seqs.append(list(c))
    merges = []
    for it in range(n_merges):
        counts = Counter()
        for s in seqs:
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += 1
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((it, a, b, cnt))
        nxt = []
        for s in seqs:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            nxt.append(out)
        seqs = nxt
    return merges, sorted(map(tuple, seqs))


def test_bpe_matches_naive_reference_on_random_corpora(spark):
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        texts = [
            "".join(rng.choice("aab b") for _ in range(rng.randint(1, 30)))
            for _ in range(12)
        ]
        want_merges, want_seqs = _naive_bpe(texts, 3, 50)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, text string"
        )
        merges, final = bpe.bpe_train(df, "text", n_merges=3, max_chars=50)
        got_merges = [
            (m.iteration, m.left_sym, m.right_sym, m.cnt) for m in merges
        ]
        assert got_merges == want_merges, (seed, got_merges, want_merges)
        got_seqs = sorted(
            tuple(r["sym"]) for r in final.select("sym").collect()
        )
        assert got_seqs == want_seqs, seed


def test_bpe_symbolize_drops_empty_and_caps(spark):
    df = spark.createDataFrame(
        [(1, "漢字"), (2, "xy" * 100)], "id long, text string"
    )
    sym = bpe.symbolize(df, "text", max_chars=6)
    rows = {r["id"]: r["sym"] for r in sym.collect()}
    assert 1 not in rows  # cleans to empty -> dropped
    assert rows[2] == list("xyxyxy")


def test_bloom_probe_inline_matches_join_probe_and_is_shuffle_free(spark):
    members = spark.range(0, 300).select(F.col("id").alias("k"))
    bloom = sketch.bloom_build(members, "k", n_words=64, k=5)
    probe = spark.range(0, 2000).select(F.col("id").alias("k"))
    via_join = {
        r["k"]: r["maybe_member"]
        for r in sketch.bloom_probe(
            probe, bloom, "k", n_words=64, k=5
        ).collect()
    }
    inline = sketch.bloom_probe_inline(probe, bloom, "k", n_words=64, k=5)
    via_inline = {r["k"]: r["maybe_member"] for r in inline.collect()}
    assert via_inline == via_join
    # the filter rides the plan as a literal: pure projection, no
    # exchange of the probe side at all
    plan = inline._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_mixture_schedule_is_shuffle_free_given_plan(spark):
    docs = _toy_docs(spark)
    plan_rows = [
        ("a", 1, 250_000),
        ("b", 5, 0),
    ]
    plan = spark.createDataFrame(
        plan_rows, "lang string, epochs_full long, frac_ppm long"
    )
    sched = mixture.schedule_mixture(
        docs, plan, id_col="doc_id", strata_col="lang"
    )
    phys = sched._jdf.queryExecution().executedPlan().toString()
    # broadcast the |strata|-row plan; the corpus side never shuffles
    assert "BroadcastHashJoin" in phys
    assert "Exchange hashpartitioning" not in phys


def _orders(spark):
    from data_pipeline_mlops_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    return load_table(spark, SF_SMALL, "orders")


def test_bottomk_quantile_accuracy_and_exact_regime(spark):
    """Quantile member of the sketch family: per-priority p50/p95 from
    the k=256 bottom-k hash sample must sit within the binomial
    3-sigma RANK band of the true distribution (rank error ~
    sqrt(q(1-q)/k)); with k >= group size the sample is complete and
    the estimate equals the exact interpolated percentile."""
    from data_pipeline_mlops_spark.functions.sketch import (
        bottomk_quantiles,
    )

    orders = _orders(spark).localCheckpoint()
    est = {
        r["o_orderpriority"]: r
        for r in bottomk_quantiles(
            orders, group_col="o_orderpriority",
            value_col="o_totalprice", key_col="o_orderkey", k=256,
        ).collect()
    }
    vals = {}
    for r in orders.select("o_orderpriority", "o_totalprice").collect():
        vals.setdefault(r[0], []).append(r[1])
    assert set(est) == set(vals)
    for g, r in est.items():
        xs = sorted(vals[g])
        n = len(xs)
        assert r["n_sample"] == min(n, 256)
        for q, col in [(0.5, "p50_est"), (0.95, "p95_est")]:
            # realized rank of the estimate in the TRUE distribution
            rank = sum(1 for x in xs if x <= r[col]) / n
            tol = 3.0 * (q * (1 - q) / 256) ** 0.5
            assert abs(rank - q) <= tol + 1.0 / n, (g, col, rank, q, tol)

    # below capacity: complete sample -> exact interpolated percentile
    exact = {
        r["o_orderpriority"]: r
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    full = {
        r["o_orderpriority"]: r
        for r in bottomk_quantiles(
            orders, group_col="o_orderpriority",
            value_col="o_totalprice", key_col="o_orderkey", k=10**6,
        ).collect()
    }
    for g in exact:
        assert full[g]["p50_est"] == exact[g]["p50"]
        assert full[g]["p95_est"] == exact[g]["p95"]


def test_bottomk_sample_merge_identity(spark):
    """The KMV merge rule holds for the sample itself: bottom-k of the
    whole == bottom-k of (union of per-shard bottom-ks) — shards can
    be sketched independently and combined without re-reading data."""
    from data_pipeline_mlops_spark.functions.sketch import bottomk_sample

    orders = _orders(spark).localCheckpoint()
    kw = dict(group_col="o_orderpriority", key_col="o_orderkey", k=64)
    whole = bottomk_sample(orders, **kw)
    shard_a = bottomk_sample(
        orders.where(F.col("o_orderkey") % 2 == 0), **kw
    )
    shard_b = bottomk_sample(
        orders.where(F.col("o_orderkey") % 2 == 1), **kw
    )
    merged = bottomk_sample(shard_a.unionByName(shard_b), **kw)
    key = lambda r: (r["o_orderpriority"], r["o_orderkey"])  # noqa: E731
    assert sorted(map(key, whole.collect())) == sorted(
        map(key, merged.collect())
    )


def test_bottomk_sample_partition_invariant(spark):
    """The sample is a pure function of the keys (md5 rank + key
    tiebreak), so any physical partitioning yields the same rows."""
    from data_pipeline_mlops_spark.functions.sketch import bottomk_sample

    orders = _orders(spark)
    kw = dict(group_col="o_orderpriority", key_col="o_orderkey", k=32)
    key = lambda r: (r["o_orderpriority"], r["o_orderkey"])  # noqa: E731
    a = sorted(map(key, bottomk_sample(orders.repartition(1), **kw).collect()))
    b = sorted(map(key, bottomk_sample(orders.repartition(16), **kw).collect()))
    assert a == b and len(a) > 0


def test_temperature_weights_flatten_skew(spark):
    """tau=1/2 temperature weights: the largest stratum's weight share
    must be BELOW its raw token share and every smaller stratum's at
    or above it (the multilingual upweighting the rule exists for);
    weights are ppm longs summing to <= 1e6; and the scaled-sqrt
    contract holds exactly."""
    import math

    from data_pipeline_mlops_spark.functions.mixture import (
        temperature_weights,
    )
    from data_pipeline_mlops_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    rows = {
        r["lang"]: r
        for r in temperature_weights(
            docs, strata_col="lang", token_col="n_chars"
        ).collect()
    }
    total = sum(r["available_tokens"] for r in rows.values())
    ppm_sum = sum(r["weight_ppm"] for r in rows.values())
    assert 1_000_000 - len(rows) <= ppm_sum <= 1_000_000
    big = max(rows.values(), key=lambda r: r["available_tokens"])
    small = min(rows.values(), key=lambda r: r["available_tokens"])
    assert big["weight_ppm"] / 1e6 < big["available_tokens"] / total
    assert small["weight_ppm"] / 1e6 > small["available_tokens"] / total
    # exact scaled-sqrt contract: floor(sqrt(n)*1000) drives the ppm
    sqs = {
        k: math.floor(math.sqrt(r["available_tokens"]) * 1000)
        for k, r in rows.items()
    }
    t = sum(sqs.values())
    for k, r in rows.items():
        assert r["weight_ppm"] == sqs[k] * 1_000_000 // t
