"""Behavioral tests for the round-13 late additions: Broder
containment near-dup pairs and CCNet head/middle/tail LM bucketing.
The registry oracles check engine parity; these pin the OPERATOR
GUARANTEES — containment catches inclusion pairs Jaccard misses, the
threshold gate is integer-exact, tercile buckets are score-monotone
and ~thirds — on corpora small enough to verify by hand."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_mlops_spark.functions import dedup_text, text


# ------------------------------------------------------- containment


def _inclusion_docs(spark):
    # doc 1: 12-token parent; doc 2: its first 6 tokens (a strict
    # prefix => every excerpt trigram is a parent trigram); doc 3:
    # unrelated text; doc 4: exact copy of doc 1.
    parent = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    rows = [
        (1, parent),
        (2, "w1 w2 w3 w4 w5 w6"),
        (3, "x1 x2 x3 x4 x5 x6 x7 x8"),
        (4, parent),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_catches_inclusion_jaccard_misses(spark):
    docs = _inclusion_docs(spark)
    cont = {
        (r.id_a, r.id_b): r
        for r in dedup_text.containment_pairs(
            docs, id_col="doc_id", threshold_pct=80
        ).collect()
    }
    # excerpt (4 trigrams) wholly inside parent (10 trigrams)
    r = cont[(1, 2)]
    assert r.containment == 1.0
    assert (r.inter, r.sz_a, r.sz_b) == (4, 10, 4)
    # ... but its Jaccard (4/10) fails the same 0.8 threshold
    jac = {
        (x.id_a, x.id_b)
        for x in dedup_text.ngram_jaccard_pairs(
            docs, id_col="doc_id", threshold=0.8
        ).collect()
    }
    assert (1, 2) not in jac
    # exact copies pass both
    assert cont[(1, 4)].containment == 1.0
    assert (1, 4) in jac
    # unrelated doc pairs with nothing
    assert not any(3 in p for p in cont)


def test_containment_gate_is_integer_exact(spark):
    # inter=4, min_sz=5 -> 100*4 = 80*5: the >= gate must INCLUDE the
    # exact-boundary pair (no float round-trip deciding it).
    rows = [
        (1, "a b c d e f g"),   # 5 trigrams
        (2, "a b c d e f x"),   # 5 trigrams, shares 4
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = dedup_text.containment_pairs(
        docs, id_col="doc_id", threshold_pct=80
    ).collect()
    assert len(got) == 1 and got[0].inter == 4
    # one notch tighter excludes it
    assert (
        dedup_text.containment_pairs(
            docs, id_col="doc_id", threshold_pct=81
        ).count()
        == 0
    )


def test_containment_registry_query_plants_excerpts(spark):
    from data_pipeline_mlops_spark.registry import QUERIES

    df = QUERIES["ngram_containment_dups"].spark(
        spark, "/root/testdata/sf0.001"
    )
    rows = df.collect()
    exc = [r for r in rows if r.id_b >= 100_000_000]
    assert exc, "derived excerpt pairs must appear"
    for r in exc:
        # excerpt ids pair parent-first and keep the derivation rule
        assert (r.id_b - 100_000_000) % 7 == 3
        # every excerpt-involving pair that passes containment would
        # fail symmetric Jaccard at the same threshold (the operator's
        # reason to exist), derivable from the exact integers
        jac = r.inter / (r.sz_a + r.sz_b - r.inter)
        if r.id_b - 100_000_000 == r.id_a:  # excerpt vs own parent
            assert r.containment == 1.0
            assert jac < 0.8


# ----------------------------------------------------------- ccnet


def _scored_docs(spark):
    # one language, 9 docs with strictly decreasing LM typicality:
    # "aaaa..." shares the corpus-dominant bigram; gibberish doesn't.
    rows = [(i, "en", "ab" * (20 - i) + "zqxj" * i) for i in range(9)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_ccnet_buckets_are_score_monotone_thirds(spark):
    out = text.lm_quality_buckets(_scored_docs(spark)).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r.score_key)
    assert set(by_bucket) == {"head", "middle", "tail"}
    # 9 docs, distinct scores -> exact thirds
    assert {len(v) for v in by_bucket.values()} == {3}
    # monotone: every head score > every middle score > every tail
    assert min(by_bucket["head"]) > max(by_bucket["middle"])
    assert min(by_bucket["middle"]) > max(by_bucket["tail"])


def test_ccnet_ties_share_a_bucket(spark):
    # 4 identical docs + 2 distinct: the tied block must land in ONE
    # bucket even though exact thirds would split it.
    rows = [(i, "en", "ab ab ab") for i in range(4)] + [
        (10, "en", "cd cd cd"),
        (11, "en", "zq xj qz"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = text.lm_quality_buckets(docs).collect()
    tied = {r.bucket for r in out if r.doc_id < 4}
    assert len(tied) == 1
    assert {r.score_key for r in out if r.doc_id < 4} != {
        r.score_key for r in out if r.doc_id >= 10
    }


def test_ccnet_buckets_per_language_fixture(spark):
    from data_pipeline_mlops_spark.registry import QUERIES

    df = QUERIES["doc_ccnet_buckets"].spark(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    langs = {r.lang for r in rows}
    for lang in langs:
        sub = [r for r in rows if r.lang == lang]
        counts = {}
        for r in sub:
            counts[r.bucket] = counts.get(r.bucket, 0) + 1
        n = len(sub)
        if n >= 6:
            # thirds within tie tolerance: no bucket may be empty and
            # head must hold the best scores
            assert set(counts) == {"head", "middle", "tail"}
            head_min = min(r.score_key for r in sub if r.bucket == "head")
            tail_max = max(r.score_key for r in sub if r.bucket == "tail")
            assert head_min > tail_max
