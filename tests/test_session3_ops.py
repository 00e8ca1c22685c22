"""Round-5 session-3 operators: fuzzy blocking join, DQ expectation
suites, BPE encode, full-vector k-means + balanced sampling,
dup-cluster keep-best, rolling features.

Oracle parity for all of these is covered by test_oracle_parity; these
tests pin the behavioral contracts the hash can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


# ------------------------------------------------------------------ fuzzy
def test_fuzzy_pairs_respect_blocks_and_distance(spark):
    from data_pipeline_mlops_spark.operators.fuzzy import (
        blocked_levenshtein_pairs,
    )

    names = spark.createDataFrame(
        [("cold rod",), ("old rod",), ("cold bolt",), ("old bolt",),
         ("hot gear",)],
        "name string",
    )
    out = blocked_levenshtein_pairs(
        names,
        "name",
        F.element_at(F.split("name", " "), -1),
        max_dist=3,
    ).collect()
    pairs = {(r.name_a, r.name_b): r.dist for r in out}
    # same block, within distance
    assert pairs[("cold rod", "old rod")] == 1
    assert pairs[("cold bolt", "old bolt")] == 1
    # cross-block pairs never compared, even when close
    assert all(
        a.split()[-1] == b.split()[-1] for a, b in pairs
    )
    # canonical ordering: each unordered pair exactly once
    assert all(a < b for a, b in pairs)
    # singleton block produces nothing
    assert not any("hot gear" in p for p in pairs)


def test_fuzzy_pairs_match_python_levenshtein(spark):
    from data_pipeline_mlops_spark.operators.fuzzy import (
        blocked_levenshtein_pairs,
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    words = ["alpha", "alphas", "alpaca", "beta", "betas", "delta"]
    names = spark.createDataFrame([(w,) for w in words], "name string")
    out = blocked_levenshtein_pairs(
        names, "name", F.substring("name", 1, 1), max_dist=10
    ).collect()
    for r in out:
        assert r.dist == lev(r.name_a, r.name_b), (r.name_a, r.name_b)


# ----------------------------------------------------------- expectations
def test_expectation_suite_counts_violations(spark):
    from data_pipeline_mlops_spark.operators import expectations as X

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -1.0, "A"), (2, 5.0, None), (3, None, "B")],
        "id long, amount double, grp string",
    )
    dim = spark.createDataFrame([(1,), (2,)], "ref_id long")
    rep = {
        r.constraint_name: r
        for r in X.run_expectations(
            df,
            row_checks=[
                X.RowCheck("pos:amount", F.col("amount") > 0),
                X.RowCheck("nn:grp", F.col("grp").isNotNull()),
            ],
            unique_checks=[X.UniqueCheck("uniq:id", ["id"])],
            ref_checks=[X.RefCheck("ref:id", "id", dim, "ref_id")],
        ).collect()
    }
    # NULL predicate counts as a violation (IS NOT TRUE semantics)
    assert rep["pos:amount"].violations == 2
    assert rep["nn:grp"].violations == 1 and not rep["nn:grp"].passed
    assert rep["uniq:id"].violations == 1
    assert rep["ref:id"].violations == 1  # id=3 not in dim
    assert all(r.total == 4 for r in rep.values())


def test_expectation_suite_empty_and_clean(spark):
    from data_pipeline_mlops_spark.operators import expectations as X

    df = spark.createDataFrame([(1,), (2,)], "id long")
    assert X.run_expectations(df).count() == 0
    rep = X.run_expectations(
        df, row_checks=[X.RowCheck("nn:id", F.col("id").isNotNull())]
    ).collect()
    assert rep[0].passed and rep[0].violations == 0


# ------------------------------------------------------------------- bpe
def test_bpe_encode_reproduces_training_symbolization(spark):
    from data_pipeline_mlops_spark.functions import bpe
    from data_pipeline_mlops_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents").limit(40)
    merges, trained = bpe.bpe_train(docs, "text", n_merges=3, max_chars=60)
    encoded = bpe.bpe_encode(docs, merges, "text", max_chars=60)
    t = {r.doc_id: r.sym for r in trained.select("doc_id", "sym").collect()}
    e = {r.doc_id: r.sym for r in encoded.select("doc_id", "sym").collect()}
    assert t == e and len(t) > 0


def test_bpe_encode_applies_to_unseen_text(spark):
    from data_pipeline_mlops_spark.functions.bpe import Merge, bpe_encode

    df = spark.createDataFrame([(1, "banana band")], "id long, t string")
    out = bpe_encode(
        df, [Merge(0, "a", "n", 0), Merge(1, "an", "a", 0)], "t"
    ).collect()[0]
    # banana -> b,an,an,a -> b,ana?  greedy leftmost: [b,an,an,a] then
    # (an,a): leftmost pair at positions (an,an) no; (an,a) at idx 2-3
    assert out.sym == ["b", "an", "ana", " ", "b", "an", "d"]


# --------------------------------------------------- kmeans / sampling
def test_kmeans_assignment_is_total_and_bounded(spark):
    from data_pipeline_mlops_spark.registry import (
        q_cluster_balanced_sample,
        q_embedding_kmeans_clusters,
    )
    from data_pipeline_mlops_spark.sources.tables import load_table

    n = load_table(spark, SF_SMALL, "embeddings").count()
    assigned = q_embedding_kmeans_clusters(spark, SF_SMALL)
    rows = assigned.collect()
    assert len(rows) == n  # every vector assigned exactly once
    assert {r.cluster for r in rows} <= set(range(8))

    sample = q_cluster_balanced_sample(spark, SF_SMALL).collect()
    per = {}
    for r in sample:
        per.setdefault(r.cluster, []).append(r.rank)
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


# ------------------------------------------------------- keep-best dedup
def test_keep_best_keeps_max_quality_per_component(spark):
    from data_pipeline_mlops_spark.registry import q_dup_cluster_keep_best

    rows = q_dup_cluster_keep_best(spark, SF_SMALL).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    kept_total = 0
    for comp, members in by_comp.items():
        kept = [r for r in members if r.keep]
        assert len(kept) == 1
        kept_total += 1
        best = max(
            members, key=lambda r: (r.quality_score, -r.doc_id)
        )
        assert kept[0].doc_id == best.doc_id
        assert all(m.kept_doc == kept[0].doc_id for m in members)
    assert kept_total == len(by_comp)


# ------------------------------------------------------------ chunking
def test_chunks_cover_and_reconstruct(spark):
    from data_pipeline_mlops_spark.functions.text import chunk_tokens

    words = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    rows = sorted(
        chunk_tokens(df, window=64, stride=48).collect(),
        key=lambda r: r.chunk_id,
    )
    # starts advance by stride; every token covered; first `stride`
    # tokens of each chunk concatenate back to the original
    assert [r.start_pos for r in rows] == [1, 49, 97, 145]
    assert rows[-1].n_tokens == 150 - 144  # short tail kept
    recon = []
    for r in rows:
        recon.extend(r.chunk_text.split(" ")[:48])
    assert recon[:150] == words.split(" ")
    # overlap: chunk k shares its last (64-48) tokens with chunk k+1
    a, b = rows[0].chunk_text.split(" "), rows[1].chunk_text.split(" ")
    assert a[48:] == b[: 64 - 48]


# ------------------------------------------------------------ pagerank
def test_pagerank_fixed_points_and_isolated_mass(spark):
    from data_pipeline_mlops_spark.functions.graph import pagerank

    verts = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 1)], "s long, d long"
    )
    pr = {
        r.v: r.pr
        for r in pagerank(
            verts, edges, vertex_col="id", src_col="s", dst_col="d",
            iters=2,
        ).collect()
    }
    # symmetric pair is a fixed point: 0.05 + 0.85*pr stays at pr when
    # the mutual exchange balances; isolated vertex keeps base only
    assert abs(pr[1] - pr[2]) < 1e-12
    assert abs(pr[3] - 0.05) < 1e-9
    assert pr[1] > pr[3]


def test_pagerank_is_partitioning_invariant(spark):
    from data_pipeline_mlops_spark.functions.graph import pagerank

    verts = spark.createDataFrame(
        [(i,) for i in range(20)], "id long"
    )
    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 20) for i in range(20)]
        + [(i, (i * 11 + 1) % 20) for i in range(20)],
        "s long, d long",
    ).where(F.col("s") != F.col("d"))
    a = pagerank(
        verts, edges, vertex_col="id", src_col="s", dst_col="d", iters=3
    ).collect()
    b = pagerank(
        verts.repartition(7), edges.repartition(13),
        vertex_col="id", src_col="s", dst_col="d", iters=3,
    ).collect()
    assert {(r.v, r.pr) for r in a} == {(r.v, r.pr) for r in b}


# ------------------------------------------------------ rolling features
def test_rolling_features_are_leakage_free_monotone(spark):
    from data_pipeline_mlops_spark.registry import (
        q_customer_rolling_features,
    )

    df = q_customer_rolling_features(spark, SF_SMALL)
    bad = df.where(
        (F.col("orders_90d") > F.col("orders_lifetime"))
        | (F.col("spend_90d") > F.col("spend_lifetime") + 0.01)
        | (F.col("orders_90d") < 1)
    ).count()
    assert bad == 0
