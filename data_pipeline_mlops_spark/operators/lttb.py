"""LTTB series downsampling (Steinarsson, "Downsampling Time Series
for Visual Representation", MSc thesis, U. Iceland 2013) — the
TimescaleDB ``lttb()`` / Grafana default downsampler.

Largest-Triangle-Three-Buckets keeps, per bucket, the point forming
the largest triangle with the PREVIOUSLY SELECTED point and the NEXT
bucket's average point — a sequential, shape-preserving selection that
beats M4 on visual fidelity for spiky series.  The first and last
points are always kept; the interior splits into ``n_out - 2`` buckets
by rank (every bucket non-empty when the series has at least ``n_out``
points; shorter series pass through unchanged).

Spark shape: the selection is inherently sequential per series (each
bucket's choice depends on the previous), so this is the documented
Pandas-kernel path — ``applyInPandas`` over the series key, one series
per group, vectorized numpy area evaluation inside.  Per-group memory
is O(series length): for a series too large for one executor, reduce
with the output-sized M4 aggregation first
(operators/downsample.py::m4_downsample) and run LTTB over the M4
points — the registry labels this operator parity-only with
``event_m4_downsample`` as its scale twin for exactly that reason.

Cross-engine determinism (the DuckDB oracle replays the algorithm as a
recursive CTE over per-bucket candidate lists): every float quantity
is a FIXED expression DAG over identical operands —

- bucket-average time = ``double(exact integer sum) / count``;
- bucket-average value = ``double(exact DECIMAL(38,6) sum of
  half-up-quantized values) / count`` (quantization of a double is
  unambiguous at 6 decimals unless the double's exact expansion ends
  in 5e-7, which no binary double does), mirroring
  ``CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE)``;
- the triangle area is the one expression
  ``abs((a_t - c_t)*(p_v - a_v) - (a_t - p_t)*(c_v - a_v))``
  per candidate — no accumulation, so no association ambiguity;
- ties on the maximum area pick the EARLIEST candidate in
  (ts, tiebreak) order (numpy ``argmax`` first-occurrence =
  ``list_position`` of the list max).

Reference parity: the reference plots raw hourly aggregates
(dags/micro_batch_dashboard.py); LTTB is the at-scale rendering tier
alongside M4.
"""

from __future__ import annotations

from collections.abc import Sequence
from decimal import ROUND_HALF_UP, Decimal, localcontext

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_mlops_spark.timeutil import epoch_s

_Q6 = Decimal("0.000001")


def _avg_exact(t_slice, v_slice) -> tuple[float, float]:
    """(mean time, mean value) with exact distributed-safe sums: the
    time sum is exact int arithmetic; the value sum is an exact
    Decimal(38,6) sum of half-up-quantized doubles, converted to
    double ONCE (matching CAST(SUM(CAST(v AS DECIMAL(38,6))) AS
    DOUBLE) / COUNT(*))."""
    cnt = len(t_slice)
    ts = int(t_slice.sum(dtype=object))
    with localcontext() as ctx:
        ctx.prec = 60
        s = Decimal(0)
        for x in v_slice:
            s += Decimal(float(x)).quantize(_Q6, rounding=ROUND_HALF_UP)
    return float(ts) / cnt, float(s) / cnt


def _lttb_indices(t, v, n_out: int) -> list[int]:
    """Selected row indices for a single (t, v) series already sorted
    by (ts, tiebreak). Pure sequential LTTB; len(t) > n_out >= 3."""
    import numpy as np

    n = len(t)
    nb = n_out
    td = t.astype(np.float64)
    sel = [0]
    a_t, a_v = float(td[0]), float(v[0])
    # interior point j (1..n-2) -> bucket (j-1)*(nb-2) // (n-2);
    # bucket k spans interior ranks [k*(n-2)/(nb-2) ceil boundaries);
    # compute slice bounds by inverting the floor map.
    for k in range(nb - 2):
        # first interior rank with bucket >= k / > k
        lo = -(-(k * (n - 2)) // (nb - 2)) + 1        # ceil div, +1 for j>=1
        hi = -(-((k + 1) * (n - 2)) // (nb - 2)) + 1
        if k < nb - 3:
            nlo, nhi = hi, -(-((k + 2) * (n - 2)) // (nb - 2)) + 1
            c_t, c_v = _avg_exact(t[nlo:nhi], v[nlo:nhi])
        else:
            c_t, c_v = float(td[n - 1]), float(v[n - 1])
        pt = td[lo:hi]
        pv = v[lo:hi]
        areas = np.abs((a_t - c_t) * (pv - a_v) - (a_t - pt) * (c_v - a_v))
        idx = lo + int(np.argmax(areas))
        sel.append(idx)
        a_t, a_v = float(td[idx]), float(v[idx])
    sel.append(n - 1)
    return sel


def lttb_downsample(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    n_out: int,
    tiebreak_col: str,
) -> DataFrame:
    """Per series (``group_cols``), the ``n_out`` LTTB-selected points
    as ``(group_cols..., pos, t_s, value, <tiebreak_col>)`` where
    ``pos`` is the selection order (0 = first point, n_out-1 = last).
    A series with <= ``n_out`` points passes through unchanged
    (pos = rank). ``tiebreak_col`` is required: LTTB is
    order-sensitive, so ties on ``ts`` must break deterministically.
    """
    if n_out < 3:
        raise ValueError("n_out must be at least 3")
    group_cols = list(group_cols)
    in_schema = {f.name: f.dataType for f in df.schema.fields}
    out_schema = T.StructType(
        [T.StructField(c, in_schema[c]) for c in group_cols]
        + [
            T.StructField("pos", T.LongType()),
            T.StructField("t_s", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField(tiebreak_col, in_schema[tiebreak_col]),
        ]
    )
    pts = df.select(
        *group_cols,
        epoch_s(F.col(ts_col)).alias("__t"),
        F.col(value_col).cast("double").alias("__v"),
        F.col(tiebreak_col).alias("__i"),
    )

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values(
            ["__t", "__i"], kind="mergesort"
        ).reset_index(drop=True)
        n = len(pdf)
        t = pdf["__t"].to_numpy(np.int64)
        v = pdf["__v"].to_numpy(np.float64)
        sel = (
            list(range(n))
            if n <= n_out
            else _lttb_indices(t, v, n_out)
        )
        out = pdf.iloc[sel][group_cols + ["__t", "__v", "__i"]].rename(
            columns={"__t": "t_s", "__v": "value", "__i": tiebreak_col}
        ).reset_index(drop=True)
        out.insert(len(group_cols), "pos", pd.RangeIndex(len(sel)))
        return out

    return pts.groupBy(*group_cols).applyInPandas(kernel, out_schema)
