"""As-of (point-in-time) join: match each left row to the latest right
row with ``right.ts <= left.ts`` (backward), the earliest with
``right.ts >= left.ts`` (forward), or whichever is closest (nearest)
for the same key — the full pandas ``merge_asof`` direction surface.

Spark has no ASOF JOIN operator (pandas/DuckDB do), and the naive
formulation — join on key with a range predicate, then keep the max —
explodes into |left_per_key| x |right_per_key| intermediate rows before
pruning. This implementation uses the union + ordered-window trick
instead: tag both sides, union them, sort each key's timeline once, and
let ``last(payload, ignorenulls=True)`` (backward) or
``first(payload, ignorenulls=True)`` (forward) carry the matching right
payload onto every left row.

Scale shape: exactly ONE shuffle per direction (hash by key for the
window), sort within partitions, no pair fan-out — the per-key cost is
O((|L|+|R|) log(|L|+|R|)) instead of O(|L|x|R|). ``nearest`` composes
one backward and one forward pass (two shuffles on the same key).
Skewed keys can reuse operators/skew.py salting upstream if one key
dominates.

Semantics (chosen to match DuckDB/pandas ``merge_asof``):
- non-strict by default (right.ts == left.ts matches); ``strict=True``
  requires right.ts < left.ts (backward) / > left.ts (forward);
- ties among right rows at the same ts resolve to the greatest
  ``tiebreak`` value backward and the SMALLEST forward (pass a unique
  column for determinism);
- left rows with no qualifying right row keep null payloads;
- ``tolerance`` (seconds) nulls matches farther than tolerance from
  the left timestamp (on the qualifying side), like pandas
  merge_asof's tolerance;
- ``nearest`` picks the smaller absolute gap; an EXACT gap tie picks
  the backward match (pandas' prior-row preference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.timeutil import epoch_us

_T = "__asof_t"
_SIDE = "__asof_side"
_TIE = "__asof_tie"
_PAY = "__asof_payload"
_RTS_FIELD = "__asof_matched_ts"


def _directional(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tiebreak: str,
    strict: bool,
    tolerance_sec: float | None,
    payload_prefix: str,
    forward: bool,
) -> DataFrame:
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

    # Sort order within a key's timeline: time, then side. The match
    # frame is everything up to the current row (backward) or from it
    # on (forward), so equal-ts right rows are made visible or
    # invisible purely by which side of the left row they sort on:
    # backward non-strict puts right BEFORE left (visible), strict
    # after; forward mirrors.
    if forward:
        right_side, left_side = (0, 1) if strict else (1, 0)
    else:
        right_side, left_side = (1, 0) if strict else (0, 1)

    # The matched right row's ts + payload travel as ONE struct so a
    # single last/first(ignorenulls) carries them atomically: per-
    # column carries would backfill a NULL payload field from an OLDER
    # right row, tearing fields of different right rows into one
    # result.
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

    base = Window.partitionBy(on).orderBy(
        F.col(_T).asc(), F.col(_SIDE).asc(), F.col(_TIE).asc()
    )
    if forward:
        # first upcoming right row; _TIE asc => smallest tiebreak wins
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carry = F.first(_PAY, ignorenulls=True).over(w)
    else:
        # latest prior right row; _TIE asc + last => greatest wins
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carry = F.last(_PAY, ignorenulls=True).over(w)
    carried = [out_ts] + list(out_payload.values())
    unioned = unioned.withColumn(_PAY, carry)

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
        gap = (
            (epoch_us(out_ts) - epoch_us(left_ts))
            if forward
            else (epoch_us(left_ts) - epoch_us(out_ts))
        )
        too_far = gap > int(tolerance_sec * 1_000_000)
        # single select: every null-out sees the ORIGINAL matched ts
        # (sequential withColumns would null out_ts first and blind the
        # condition for the remaining payload columns)
        result = result.select(
            *[
                F.when(too_far, F.lit(None)).otherwise(F.col(c)).alias(c)
                if c in carried
                else F.col(c)
                for c in result.columns
            ]
        )
    return result


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
    direction: str = "backward",
) -> DataFrame:
    """Return ``left`` with ``payload`` columns (prefixed) from the
    as-of matching ``right`` row, plus ``<prefix><right_ts>`` carrying
    the matched row's timestamp (null when unmatched).

    ``direction``: ``backward`` (default — latest right.ts <=
    left.ts), ``forward`` (earliest right.ts >= left.ts) or
    ``nearest`` (smaller absolute gap; exact ties prefer backward).
    """
    if direction in ("backward", "forward"):
        return _directional(
            left,
            right,
            on=on,
            left_ts=left_ts,
            right_ts=right_ts,
            payload=payload,
            tiebreak=tiebreak,
            strict=strict,
            tolerance_sec=tolerance_sec,
            payload_prefix=payload_prefix,
            forward=direction == "forward",
        )
    if direction != "nearest":
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest'"
        )

    b_pre, f_pre = "__asof_nb_", "__asof_nf_"
    both = _directional(
        _directional(
            left,
            right,
            on=on,
            left_ts=left_ts,
            right_ts=right_ts,
            payload=payload,
            tiebreak=tiebreak,
            strict=strict,
            tolerance_sec=tolerance_sec,
            payload_prefix=b_pre,
            forward=False,
        ),
        right,
        on=on,
        left_ts=left_ts,
        right_ts=right_ts,
        payload=payload,
        tiebreak=tiebreak,
        strict=strict,
        tolerance_sec=tolerance_sec,
        payload_prefix=f_pre,
        forward=True,
    )
    out_ts = f"{payload_prefix}{right_ts}"
    clash = {
        out_ts,
        *(f"{payload_prefix}{c}" for c in payload),
    } & set(left.columns)
    if clash:
        raise ValueError(
            f"as-of output column(s) {sorted(clash)} collide with left "
            f"columns; pass a distinct payload_prefix"
        )
    b_ts, f_ts = F.col(f"{b_pre}{right_ts}"), F.col(f"{f_pre}{right_ts}")
    d_b = epoch_us(left_ts) - epoch_us(f"{b_pre}{right_ts}")
    d_f = epoch_us(f"{f_pre}{right_ts}") - epoch_us(left_ts)
    use_b: Column = b_ts.isNotNull() & (f_ts.isNull() | (d_b <= d_f))

    def pick(suffix: str, alias: str) -> Column:
        return (
            F.when(use_b, F.col(f"{b_pre}{suffix}"))
            .otherwise(F.col(f"{f_pre}{suffix}"))
            .alias(alias)
        )

    return both.select(
        *left.columns,
        pick(right_ts, out_ts),
        *[pick(c, f"{payload_prefix}{c}") for c in payload],
    )
