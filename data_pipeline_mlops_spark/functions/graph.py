"""Distributed connected components via hash-min label propagation.

Dedup at corpus scale needs CLUSTERS, not just pairs: if A~B and B~C,
the keep/drop decision must see {A, B, C} as one group (the greedy
pair-wise decision in dedup_text.dedup_decisions can drop B and C while
keeping A even when A~C was never verified — fine as a cheap tier, but
cluster-exact survivorship needs components).

Algorithm: every vertex starts labeled with its own id; each round,
every vertex takes the min of its label and its neighbors' labels;
stop when a round changes nothing. Converges in O(component diameter)
rounds — near-dup clusters are shallow (LSH-bucket cliques), so
single-digit rounds in practice, with `max_iters` as the safety bound.
Each round is one shuffle (join on vertex) + one aggregation; lineage
is truncated per round with localCheckpoint so plans stay flat.

This is the iterative-algorithm pattern on DataFrames: driver-side loop
over fully distributed rounds, one scalar action per round for
convergence — the driver never holds vertex data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    vertex_col: str,
    src_col: str,
    dst_col: str,
    max_iters: int = 50,
) -> DataFrame:
    """(vertex, component) for every vertex; component = min vertex id
    reachable through undirected ``edges``. Isolated vertices label
    themselves.

    Raises ``RuntimeError`` if ``max_iters`` rounds pass without
    convergence: hash-min needs O(component diameter) rounds, so a
    chain-shaped component longer than ``max_iters`` hops would
    otherwise yield silently-wrong partial labels (and wrong keep/drop
    survivorship downstream). Extra rounds are cheap once most labels
    are stable, so the default bound is generous; raise it for corpora
    with pathological chain topologies.
    """
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = vertices.select(
        F.col(vertex_col).alias("v"), F.col(vertex_col).alias("label")
    ).localCheckpoint()

    converged = False
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["v"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = (
            labels.join(nbr_min, labels["v"] == nbr_min["a"], "left")
            .select(
                "v",
                F.col("label").alias("old_label"),
                F.least(
                    F.col("label"), F.coalesce("nbr_min", "label")
                ).alias("label"),
            )
            .localCheckpoint()  # also materializes for the two uses below
        )
        changed = stepped.where(
            F.col("label") != F.col("old_label")
        ).count()
        labels = stepped.drop("old_label")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(component diameter exceeds the bound); partial labels would "
            "be silently wrong — raise max_iters"
        )
    return labels.select(F.col("v").alias(vertex_col),
                         F.col("label").alias("component"))


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    vertex_col: str,
    src_col: str,
    dst_col: str,
    iters: int = 3,
    damping: float = 0.85,
    round_dp: int = 10,
) -> DataFrame:
    """Fixed-iteration PageRank with engine-replayable arithmetic:
    (vertex, pr) after ``iters`` power iterations of
    pr(v) = (1-d)/N + d * sum_{u->v} pr(u)/outdeg(u).

    Determinism discipline: each contribution pr(u)/outdeg(u) is
    scaled to a FIXED-POINT integer (round(pr * 1e12 / outdeg)) before
    the neighbor sum, so the reduce is an exact BIGINT sum —
    order/partitioning-independent — and the int -> double conversion
    after the sum is exact as long as total scaled mass stays below
    2^53 (total rank mass is ~1.0, i.e. ~1e12 scaled: 4000x headroom).
    A plain double sum would drift with shuffle order; a DECIMAL sum
    is exact too but its decimal->double CAST rounds differently
    across engines at the last ulp (observed vs DuckDB at sf0.01),
    which the integer path avoids. The new rank rounds to
    ``round_dp``.

    Scale shape: one join edges x (deg, pr) + one groupBy(dst) per
    iteration — the standard shuffle-bound power iteration; lineage is
    truncated per round. The vertex-count scalar N stays distributed
    (broadcast 1-row frame). Vertices with no outgoing edges simply
    contribute nothing (classic dangling-mass simplification, noted so
    the oracle replays the same recurrence).
    """
    v = vertices.select(F.col(vertex_col).alias("v")).distinct()
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    deg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    )
    n_df = v.agg(F.count(F.lit(1)).cast("long").alias("N"))
    pr = v.crossJoin(F.broadcast(n_df)).select(
        "v",
        F.round(F.lit(1.0) / F.col("N"), round_dp).alias("pr"),
    ).localCheckpoint(eager=False)
    base = F.lit(1.0) - F.lit(damping)
    for _ in range(iters):
        contrib = (
            e.join(deg, "src")
            .join(pr.withColumnRenamed("v", "src"), "src")
            .select(
                "dst",
                F.round(F.col("pr") * F.lit(1e12) / F.col("outdeg"), 0)
                .cast("long")
                .alias("contrib"),
            )
        )
        sums = contrib.groupBy("dst").agg(
            F.sum("contrib").cast("long").alias("s")
        )
        pr = (
            v.join(sums, v.v == sums.dst, "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "v",
                F.round(
                    base / F.col("N")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("s"), F.lit(0)).cast("double")
                        / F.lit(1e12)
                    ),
                    round_dp,
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return pr


def label_propagation(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    vertex_col: str,
    src_col: str,
    dst_col: str,
    iters: int = 3,
) -> DataFrame:
    """Synchronous label propagation (community detection, Raghavan et
    al. 2007), made DETERMINISTIC: every round each vertex adopts the
    most frequent label among its neighbors with a total tiebreak
    (count desc, then smallest label) — classic LPA breaks ties
    randomly, which would be unreproducible across engines and runs.
    Vertices with no in-edges keep their current label. Labels start
    as the vertex id. Returns (v, label) after ``iters`` rounds.

    Edges are taken as DIRECTED as given; pass both directions for an
    undirected graph (the co-purchase construction already emits
    both). Per round: one edges⋈labels join (shuffle on dst), one
    (v, label) count aggregation (map-side partials), one per-vertex
    argmax window (partitions are vertex-sized — no skew beyond
    degree skew, the same hot spot PageRank has; salt hub vertices'
    count aggregation at web scale). Lineage is cut per round like
    connected_components, so ``iters`` stays bounded-plan.

    The third iterative graph operator next to connected_components
    (hash-min) and pagerank (power iteration); unlike components, LPA
    finds DENSE communities rather than mere reachability.
    """
    from pyspark.sql import Window

    labels = vertices.select(
        F.col(vertex_col).alias("v"),
        F.col(vertex_col).cast("long").alias("label"),
    )
    e = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    )
    w = Window.partitionBy("__v").orderBy(
        F.col("__n").desc(), F.col("label").asc()
    )
    for _ in range(iters):
        nbr = e.join(
            labels.withColumnRenamed("v", "__d"), "__d"
        ).select(F.col("__s").alias("__v"), "label")
        best = (
            nbr.groupBy("__v", "label")
            .agg(F.count(F.lit(1)).alias("__n"))
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(F.col("__v").alias("v"), F.col("label").alias("__new"))
        )
        labels = (
            labels.join(best, "v", "left")
            .select(
                "v",
                F.coalesce(F.col("__new"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
    return labels
