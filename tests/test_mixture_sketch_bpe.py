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
    df = spark.createDataFrame([(1, "aaa")], "id long, text string")
    sym = bpe.symbolize(df, "text", max_chars=10)
    merged = bpe.merge_pair(sym, "a", "a")
    # 'a|a|a' -> 'aa|a' (leftmost pair wins; no overlapping merge)
    assert merged.collect()[0]["sym"] == "aa" + bpe.SEP + "a"


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
    # after merge0: ab|ab, ab|ab, ab|b|a -> top pair (ab,ab) cnt 2
    assert (
        merges[1].left_sym,
        merges[1].right_sym,
        merges[1].cnt,
    ) == ("ab", "ab", 2)
    syms = {r["id"]: r["sym"] for r in final.collect()}
    assert syms[1] == "abab"
    assert syms[3] == "ab" + bpe.SEP + "b" + bpe.SEP + "a"


def test_bpe_symbolize_drops_empty_and_caps(spark):
    df = spark.createDataFrame(
        [(1, "漢字"), (2, "xy" * 100)], "id long, text string"
    )
    sym = bpe.symbolize(df, "text", max_chars=6)
    rows = {r["id"]: r["sym"] for r in sym.collect()}
    assert 1 not in rows  # cleans to empty -> dropped
    assert rows[2] == bpe.SEP.join(list("xyxyxy"))
