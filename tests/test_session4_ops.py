"""Behavioral tests for round-5 session-4 operators (the hash-level
oracle parity lives in test_oracle_parity.py)."""

from __future__ import annotations

import math


def test_bm25_matches_hand_computation(spark):
    from data_pipeline_mlops_spark.functions.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "b b b")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_terms_matched, r.score, r.rank)
        for r in bm25_topk(
            docs, ["a", "b"], k=3, k1=1.2, b=0.75
        ).collect()
    }

    def idf(df, n=3):
        return math.log(1.0 + ((float(n) - df) + 0.5) / (df + 0.5))

    def part(tf, dl, df, avgdl=8.0 / 3.0, k1=1.2, b=0.75):
        return idf(df) * (
            tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + (b * dl) / avgdl))
        )

    exp = {
        1: round(0.0 + part(2.0, 3.0, 2) + part(1.0, 3.0, 2), 6),
        2: round(0.0 + part(1.0, 2.0, 2), 6),
        3: round(0.0 + part(3.0, 3.0, 2), 6),
    }
    assert got[1][1] == exp[1]
    assert got[2][1] == exp[2]
    assert got[3][1] == exp[3]
    # doc 1 matches both terms; ranks follow score desc
    assert got[1][0] == 2 and got[2][0] == 1 and got[3][0] == 1
    order = sorted(got, key=lambda d: got[d][2])
    assert [got[d][1] for d in order] == sorted(
        (got[d][1] for d in order), reverse=True
    )


def test_bm25_term_filter_limits_relation(spark):
    """Docs with no query term never reach the scored relation."""
    from data_pipeline_mlops_spark.functions.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "a b"), (3, "q r s")],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["a"], k=10).collect()
    assert [r.doc_id for r in out] == [2]
