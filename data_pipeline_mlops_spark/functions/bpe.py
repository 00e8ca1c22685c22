"""Distributed BPE merge training: byte-pair-encoding vocabulary
construction as iterated DataFrame aggregation.

Each BPE iteration is (1) count adjacent symbol pairs across the
corpus, (2) pick the most frequent pair (deterministic tiebreak),
(3) merge that pair everywhere. This is how real tokenizer vocabs are
trained (Sennrich et al. 2016; GPT-2's byte-level variant) and it is
inherently a corpus-scale aggregation — exactly the part that does
not fit one machine at 100 TB. Here:

- documents are symbolized into a single string with symbols joined
  by an out-of-alphabet separator (U+001F), so the corpus text is
  carried ONCE per doc, not exploded into per-symbol rows between
  iterations;
- pair counting explodes `zip(sym[:-1], sym[1:])` and groupBys —
  map-side partial counts make the reduce volume |vocab|^2 at most,
  independent of corpus size;
- the winning pair per iteration is ONE driver scalar (argmax with
  cnt DESC, pair ASC tiebreak — reproducible across cluster sizes);
- the merge itself is a literal `replace(sym, a⟂b, ab)` projection —
  map-side, and its leftmost-non-overlapping greedy semantics are
  identical in Spark and DuckDB/ANSI REPLACE, which is what makes
  the whole training loop oracle-replayable bit-for-bit.

The reference repo has no tokenizer stage (its pandas pipeline
consumes pre-tokenized interactions); this is a north-star
training-data operator per the build brief.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"  # unit separator: never appears in the cleaned alphabet


@dataclass(frozen=True)
class Merge:
    iteration: int
    left_sym: str
    right_sym: str
    cnt: int


def symbolize(
    df: DataFrame, text_col: str = "text", *, max_chars: int = 200
) -> DataFrame:
    """Project each doc to its initial symbol string: lowercase,
    restrict to [a-z ] (engine-portable alphabet), cap at
    ``max_chars``, and join the characters with SEP. Docs that clean
    to empty are dropped (nothing to merge)."""
    clean = F.regexp_replace(
        F.lower(F.substring(F.col(text_col), 1, max_chars)),
        "[^a-z ]",
        "",
    )
    seeded = F.regexp_replace(clean, "(.)", "$1" + SEP)
    sym = F.substring(seeded, 1, F.length(seeded) - 1)
    return df.select(
        "*", sym.alias("sym")
    ).where(F.length("sym") > 0)


def _pair_structs(sym: Column) -> Column:
    arr = F.split(sym, SEP)
    n = F.size(arr)
    return F.zip_with(
        F.slice(arr, F.lit(1), n - 1),
        F.slice(arr, F.lit(2), n - 1),
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
    """Apply one merge everywhere: greedy leftmost non-overlapping,
    the REPLACE semantics shared by Spark and ANSI SQL."""
    return symbolized.withColumn(
        "sym",
        F.replace(
            F.col("sym"), F.lit(left + SEP + right), F.lit(left + right)
        ),
    )


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
