"""As-of (point-in-time) join: match each left row to the latest right
row with ``right.ts <= left.ts`` for the same key.

Spark has no ASOF JOIN operator (pandas/DuckDB do), and the naive
formulation — join on key with a range predicate, then keep the max —
explodes into |left_per_key| x |right_per_key| intermediate rows before
pruning. This implementation uses the union + ordered-window trick
instead: tag both sides, union them, sort each key's timeline once, and
let ``last(payload, ignorenulls=True)`` carry the most recent right
payload forward onto every left row.

Scale shape: exactly ONE shuffle (hash by key for the window), sort
within partitions, no pair fan-out — the per-key cost is
O((|L|+|R|) log(|L|+|R|)) instead of O(|L|x|R|). Skewed keys can reuse
operators/skew.py salting upstream if one key dominates.

Semantics (chosen to match DuckDB/pandas ``merge_asof`` backward
direction):
- non-strict by default (right.ts == left.ts matches); ``strict=True``
  requires right.ts < left.ts;
- ties among right rows at the same ts resolve to the greatest
  ``tiebreak`` value (pass a unique column for determinism);
- left rows with no qualifying right row keep null payloads;
- ``tolerance`` (seconds) nulls matches older than
  ``left.ts - tolerance``, like pandas merge_asof's tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.timeutil import epoch_us

_T = "__asof_t"
_SIDE = "__asof_side"
_TIE = "__asof_tie"
_PAY = "__asof_payload"
_RTS_FIELD = "__asof_matched_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tiebreak: str,
    strict: bool = False,
    tolerance_sec: float | None = None,
    payload_prefix: str = "",
) -> DataFrame:
    """Return ``left`` with ``payload`` columns (prefixed) from the
    as-of matching ``right`` row, plus ``<prefix><right_ts>`` carrying
    the matched row's timestamp (null when unmatched)."""
    out_ts = f"{payload_prefix}{right_ts}"
    out_payload = {c: f"{payload_prefix}{c}" for c in payload}
    # Output names must not collide with left columns (e.g. an empty
    # payload_prefix with left_ts == right_ts): the final select would
    # emit two same-named columns and every downstream reference would
    # die with AMBIGUOUS_REFERENCE far from the cause.
    clash = {out_ts, *out_payload.values()} & set(left.columns)
    if clash:
        raise ValueError(
            f"as-of output column(s) {sorted(clash)} collide with left "
            f"columns; pass a distinct payload_prefix"
        )

    # Sort order within a key's timeline: time, then side. Non-strict
    # places right rows BEFORE left rows at equal ts (so they are
    # visible to the window); strict places them after (invisible).
    right_side, left_side = (1, 0) if strict else (0, 1)

    # The matched right row's ts + payload travel as ONE struct so a
    # single last(ignorenulls) carries them atomically: per-column
    # carries would backfill a NULL payload field from an OLDER right
    # row, tearing fields of different right rows into one result.
    r = right.select(
        F.col(on),
        F.col(right_ts).alias(_T),
        F.lit(right_side).alias(_SIDE),
        F.col(tiebreak).alias(_TIE),
        F.struct(
            F.col(right_ts).alias(_RTS_FIELD),
            *[F.col(c).alias(out_payload[c]) for c in payload],
        ).alias(_PAY),
    )
    # Null _TIE on the left must match the right tiebreak's real type:
    # a hard-coded long would union-coerce (e.g. to string) and turn
    # tie resolution lexicographic.
    tie_type = right.schema[tiebreak].dataType
    l = left.select(
        "*",
        F.col(left_ts).alias(_T),
        F.lit(left_side).alias(_SIDE),
        F.lit(None).cast(tie_type).alias(_TIE),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(_T).asc(), F.col(_SIDE).asc(), F.col(_TIE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [out_ts] + list(out_payload.values())
    unioned = unioned.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))

    result = (
        unioned.where(F.col(_SIDE) == left_side)
        .select(
            *left.columns,
            F.col(_PAY).getField(_RTS_FIELD).alias(out_ts),
            *[
                F.col(_PAY).getField(out_payload[c]).alias(out_payload[c])
                for c in payload
            ],
        )
    )
    if tolerance_sec is not None:
        too_old = (
            epoch_us(left_ts) - epoch_us(out_ts)
        ) > int(tolerance_sec * 1_000_000)
        # single select: every null-out sees the ORIGINAL matched ts
        # (sequential withColumns would null out_ts first and blind the
        # condition for the remaining payload columns)
        result = result.select(
            *[
                F.when(too_old, F.lit(None)).otherwise(F.col(c)).alias(c)
                if c in carried
                else F.col(c)
                for c in result.columns
            ]
        )
    return result
