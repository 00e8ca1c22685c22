"""Sequence packing: assign documents to fixed-capacity context
windows (bins) for LLM training-data preparation.

Packing is inherently sequential (bin state depends on every earlier
document), so a single global greedy pass cannot be distributed. The
scalable shape: deterministically partition documents into independent
GROUPS (hash/mod on the id), then pack greedily WITHIN each group —
groups pack in parallel, each group's packing is a tiny sequential
fold over its own rows. At 100 TB you size num_groups so one group's
(id, token_count) pairs fit a task comfortably (they're two longs per
doc — millions of docs per group are fine); the text itself never
enters the packing plan.

The fold runs as an Arrow-batched ``applyInPandas`` per group — the
documented pattern for per-partition imperative logic that built-in
operators can't express (a running bin accumulator with reset is not a
window cumsum). Determinism: group assignment and in-group order are
pure functions of the id, so replays and repartitioning cannot change
the packing — the same invariant the dedup/split operators guarantee.

Greedy rule (first-fit sequential): docs are visited in id order;
a doc goes into the current bin unless it would overflow ``capacity``,
in which case it opens the next bin. Docs longer than ``capacity`` are
clipped (they occupy a full bin alone) — the "truncate oversized
sample" policy; splitting one doc across bins is a tokenizer-side
concern, not a packing-side one.

Reference: the reference repo has no packing operator (its pipeline
stops at feature tables); this is part of the training-data extension
surface alongside dedup/quality/lang-id (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = (
    "{id} long, pack_group int, tokens long, pack_bin long, bin_fill long"
)


def pack_greedy(
    docs: DataFrame,
    *,
    id_col: str,
    tokens_col: str,
    capacity: int,
    num_groups: int = 32,
    order: str = "id",
    order_col: str | None = None,
) -> DataFrame:
    """(id, pack_group, tokens, pack_bin, bin_fill) for every doc.

    ``tokens`` is the clipped token count (``min(raw, capacity)``);
    ``pack_bin`` numbers bins within a group from 0 in visit order;
    ``bin_fill`` is the running fill of the doc's bin AFTER adding it.

    ``order`` picks the deterministic visit order within a group:
    ``"id"`` (arrival order — preserves any upstream curriculum) or
    ``"length_desc"`` (longest-first ≈ first-fit-decreasing, the
    classic bin-packing heuristic — measurably less wasted budget, at
    the cost of correlating sample length within a window; id is the
    tiebreak so the order stays a pure function of the data) or
    ``"column"`` (curriculum order: visit by ascending ``order_col`` —
    e.g. a difficulty or quality score — id tiebreak, so each window
    draws from one curriculum stage; standard curriculum-learning data
    prep).
    """
    import pandas as pd

    if order not in ("id", "length_desc", "column"):
        raise ValueError(f"unknown pack order: {order}")
    if order == "column" and order_col is None:
        raise ValueError("order='column' requires order_col")
    schema = PACK_SCHEMA.format(id=id_col)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if order == "length_desc":
            pdf = pdf.sort_values(
                ["tokens", id_col], ascending=[False, True]
            ).reset_index(drop=True)
        elif order == "column":
            pdf = pdf.sort_values(["__ord", id_col]).reset_index(drop=True)
        else:
            pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, fills = [], []
        bin_no, running = 0, 0
        for tok in pdf["tokens"]:
            if running + tok > capacity and running > 0:
                bin_no += 1
                running = 0
            running += tok
            bins.append(bin_no)
            fills.append(running)
        pdf["pack_bin"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf[[id_col, "pack_group", "tokens", "pack_bin", "bin_fill"]]

    cols = [
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(num_groups)).cast("int").alias(
            "pack_group"
        ),
        F.least(F.col(tokens_col), F.lit(capacity))
        .cast("long")
        .alias("tokens"),
    ]
    if order == "column":
        cols.append(F.col(order_col).alias("__ord"))
    prepared = docs.select(*cols)
    return prepared.groupBy("pack_group").applyInPandas(pack, schema)


def pack_stats(packed: DataFrame, *, capacity: int) -> DataFrame:
    """Packing efficiency rollup: bins, mean fill ratio, waste."""
    per_bin = packed.groupBy("pack_group", "pack_bin").agg(
        F.max("bin_fill").alias("fill")
    )
    return per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.round(
            F.avg(F.col("fill") / F.lit(float(capacity))), 6
        ).alias("mean_fill_ratio"),
        (F.lit(capacity) * F.count(F.lit(1)) - F.sum("fill"))
        .cast("long")
        .alias("wasted_tokens"),
    )
