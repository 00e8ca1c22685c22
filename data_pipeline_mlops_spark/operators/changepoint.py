"""Two-sided CUSUM change-point detection over bucketed series
(Page 1954 — the classic sequential drift detector; the monitoring
complement to the static outlier tiers in this repo: z-score/MAD flag
points, CUSUM flags sustained LEVEL SHIFTS).

Recurrences (value units, slack ``k``, threshold ``h``)::

    s+_i = max(0, s+_{i-1} + ((x_i - mu) - k))      # upward drift
    s-_i = max(0, s-_{i-1} + ((mu - x_i) - k))      # downward drift
    alert_i = s+_i > h  or  s-_i > h

where ``mu`` is the series' own bucket-mean baseline.

Spark-first split (same shape as operators/ema.py): the corpus-sized
bucketing is one distributed decimal-exact groupBy; the sequential
recurrence runs ``applyInPandas`` over the OUTPUT-SIZED bucket series
(calendar-bounded — no parity-only label needed).

Cross-engine determinism: the bucket mean is ROUNDed to 6 decimals
(both engines' ROUND agrees on these operands — established repo
discipline), which makes its DECIMAL(38,6) cast EXACT, so the baseline
``mu = double(exact decimal sum) / n`` is bit-identical at any
parallelism; each recurrence step is then the fixed expression above
over identical doubles (``max`` is a comparison, not arithmetic).  The
oracle replays the recursion as a recursive CTE like the EMA oracle.
"""

from __future__ import annotations

from collections.abc import Sequence
from decimal import ROUND_HALF_UP, Decimal, localcontext

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_mlops_spark.operators.exact import MONEY_DECIMAL
from data_pipeline_mlops_spark.timeutil import epoch_s

_Q6 = Decimal("0.000001")


def cusum_drift(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    k: float,
    h: float,
    bucket: str = "day",
) -> DataFrame:
    """Per (group, bucket): the 6-decimal bucket mean, both CUSUM
    accumulators, and the drift alert flag.  Returns
    ``(group_cols..., bucket_s, bucket_avg, cusum_pos, cusum_neg,
    drift_alert)``."""
    if k < 0 or h <= 0:
        raise ValueError("require k >= 0 and h > 0")
    group_cols = list(group_cols)
    in_schema = {f.name: f.dataType for f in df.schema.fields}
    out_schema = T.StructType(
        [T.StructField(c, in_schema[c]) for c in group_cols]
        + [
            T.StructField("bucket_s", T.LongType()),
            T.StructField("bucket_avg", T.DoubleType()),
            T.StructField("cusum_pos", T.DoubleType()),
            T.StructField("cusum_neg", T.DoubleType()),
            T.StructField("drift_alert", T.BooleanType()),
        ]
    )
    bucketed = (
        df.groupBy(
            *group_cols,
            epoch_s(F.date_trunc(bucket, F.col(ts_col))).alias(
                "bucket_s"
            ),
        )
        .agg(
            F.round(
                F.sum(F.col(value_col).cast(MONEY_DECIMAL)).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("bucket_avg")
        )
    )

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("bucket_s").reset_index(drop=True)
        with localcontext() as ctx:
            ctx.prec = 60
            s = Decimal(0)
            for x in pdf["bucket_avg"]:
                s += Decimal(float(x)).quantize(
                    _Q6, rounding=ROUND_HALF_UP
                )
        mu = float(s) / len(pdf)
        sp = sn = 0.0
        pos, neg, alert = [], [], []
        for x in pdf["bucket_avg"]:
            x = float(x)
            sp = max(0.0, sp + ((x - mu) - k))
            sn = max(0.0, sn + ((mu - x) - k))
            pos.append(sp)
            neg.append(sn)
            alert.append(sp > h or sn > h)
        pdf["cusum_pos"] = pos
        pdf["cusum_neg"] = neg
        pdf["drift_alert"] = alert
        return pdf[
            group_cols
            + ["bucket_s", "bucket_avg", "cusum_pos", "cusum_neg",
               "drift_alert"]
        ]

    return bucketed.groupBy(*group_cols).applyInPandas(
        kernel, out_schema
    )
