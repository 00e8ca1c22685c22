"""Distributed BPE merge training: byte-pair-encoding vocabulary
construction as iterated DataFrame aggregation.

Each BPE iteration is (1) count adjacent symbol pairs across the
corpus, (2) pick the most frequent pair (deterministic tiebreak),
(3) merge that pair everywhere. This is how real tokenizer vocabs are
trained (Sennrich et al. 2016; GPT-2's byte-level variant) and it is
inherently a corpus-scale aggregation — exactly the part that does
not fit one machine at 100 TB. Here:

- documents are symbolized into an ``array<string>`` column, so the
  corpus text is carried ONCE per doc, never exploded into
  per-symbol rows between iterations;
- pair counting explodes `zip(sym[:-1], sym[1:])` and groupBys —
  map-side partial counts make the reduce volume |vocab|^2 at most,
  independent of corpus size;
- the winning pair per iteration is ONE driver scalar (argmax with
  cnt DESC, pair ASC tiebreak — reproducible across cluster sizes);
- the merge is a pure-Catalyst ``aggregate`` left fold over the
  symbol array (accumulator = emitted tokens + one pending token),
  which implements EXACT greedy leftmost non-overlapping token
  semantics — including the two cases a string REPLACE on a
  delimiter-joined representation gets wrong: a run like
  ``[a,a,a,a]`` with pair (a,a) must yield ``[aa,aa]``, and a pair
  (x,a) must NOT fire against ``[x, ab]`` just because symbol ``ab``
  starts with ``a``. The DuckDB oracle replays the identical
  semantics via index arithmetic (greedy selection = pair positions
  at even offset from their run start), so the whole training loop
  is engine-checkable bit-for-bit despite the engines using
  different algorithms.

The reference repo has no tokenizer stage (its pandas pipeline
consumes pre-tokenized interactions); this is a north-star
training-data operator per the build brief.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Merge:
    iteration: int
    left_sym: str
    right_sym: str
    cnt: int


def symbolize(
    df: DataFrame, text_col: str = "text", *, max_chars: int = 200
) -> DataFrame:
    """Project each doc to its initial symbol array: lowercase,
    restrict to [a-z ] (engine-portable alphabet), cap at
    ``max_chars``, one single-char symbol per element. Docs that
    clean to empty are dropped (nothing to merge)."""
    clean = F.regexp_replace(
        F.lower(F.substring(F.col(text_col), 1, max_chars)),
        "[^a-z ]",
        "",
    )
    # split at every inter-char boundary; (?!$) emits no trailing "".
    # The empty filter must run on the STRING: split('') is [''] (size
    # 1), so a size guard on the array would keep empty docs.
    return (
        df.withColumn("__clean", clean)
        .where(F.length("__clean") > 0)
        .select("*", F.split(F.col("__clean"), r"(?!$)").alias("sym"))
        .drop("__clean")
    )


def _pair_structs(sym: Column) -> Column:
    n = F.size(sym)
    return F.zip_with(
        F.slice(sym, F.lit(1), n - 1),
        F.slice(sym, F.lit(2), n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def pair_counts(symbolized: DataFrame) -> DataFrame:
    """Corpus-wide adjacent-pair frequencies ``(a, b, cnt)``."""
    return (
        symbolized.select(
            F.explode(_pair_structs(F.col("sym"))).alias("p")
        )
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def merge_pair(symbolized: DataFrame, left: str, right: str) -> DataFrame:
    """Apply one merge everywhere: exact greedy leftmost
    non-overlapping TOKEN semantics, as a Catalyst ``aggregate``
    fold (no UDF, whole-stage codegen). The accumulator carries the
    emitted prefix plus one pending symbol; '' is a safe pending
    sentinel because symbols are never empty."""
    merged_tok = F.lit(left + right)

    def step(acc: Column, x: Column) -> Column:
        out, pend = acc["out"], acc["pend"]
        return (
            F.when(
                pend == "",
                F.struct(out.alias("out"), x.alias("pend")),
            )
            .when(
                (pend == left) & (x == right),
                F.struct(
                    F.concat(out, F.array(merged_tok)).alias("out"),
                    F.lit("").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(out, F.array(pend)).alias("out"),
                    x.alias("pend"),
                )
            )
        )

    def finish(acc: Column) -> Column:
        return F.when(acc["pend"] == "", acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        )

    init = F.struct(
        F.expr("CAST(array() AS ARRAY<STRING>)").alias("out"),
        F.lit("").alias("pend"),
    )
    return symbolized.withColumn(
        "sym", F.aggregate(F.col("sym"), init, step, finish)
    )


def bpe_encode(
    df: DataFrame,
    merges: list[Merge],
    text_col: str = "text",
    *,
    max_chars: int = 200,
) -> DataFrame:
    """Tokenize NEW text with an already-trained merge table: the
    serving half of BPE (train once on the corpus, encode everything
    afterwards — including tables the vocab never saw). Applies the
    merges in training order, each as the same exact-greedy Catalyst
    fold used during training, so encode(train_corpus) reproduces the
    trainer's final symbolization bit-for-bit.

    Scale shape: merges arrive as a driver-side list (the vocab is
    tiny — thousands of rows at real scale, a broadcast at most); the
    text is symbolized once and every merge is a map-side fold with no
    shuffle, so encoding N docs is embarrassingly parallel.
    """
    cur = symbolize(df, text_col, max_chars=max_chars)
    for m in merges:
        cur = merge_pair(cur, m.left_sym, m.right_sym)
    return cur


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 4,
    max_chars: int = 200,
) -> tuple[list[Merge], DataFrame]:
    """Run ``n_merges`` BPE iterations; returns the merge table and
    the final symbolized corpus.

    The driver sees exactly one (pair, count) row per iteration —
    the argmax scalar that steers the next map-side merge (same
    driver-scalar adjudication as functions/graph.py's convergence
    counts). Everything corpus-sized stays distributed.
    """
    cur = symbolize(df, text_col, max_chars=max_chars)
    merges: list[Merge] = []
    for it in range(n_merges):
        top = (
            pair_counts(cur)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        merges.append(Merge(it, row["a"], row["b"], row["cnt"]))
        cur = merge_pair(cur, row["a"], row["b"])
    return merges, cur
