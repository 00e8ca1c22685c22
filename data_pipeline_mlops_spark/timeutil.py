"""Timestamp-type-agnostic epoch helpers.

The driver testdata stores event times as ``timestamp[us]`` WITHOUT a
timezone, which Spark 4.x reads as ``TIMESTAMP_NTZ``.  LTZ-only
operations (``unix_micros``, ``cast("long")``) raise
``DATATYPE_MISMATCH`` on NTZ columns, so every operator that needs an
epoch goes through :func:`epoch_us` instead of calling those directly.

Implementation note — why not ``unix_micros(c.cast("timestamp"))``:
the external driver supplies a PLAIN SparkSession (no pinned UTC
session timezone), and an NTZ -> LTZ cast interprets the wall clock in
the *session* zone, silently shifting every epoch by the zone offset
(and non-linearly across DST).  Instead we compute the wall-clock
microseconds since ``1970-01-01 00:00:00`` with pure NTZ arithmetic
(``timestamp_diff`` of two NTZ values), which never consults the
session timezone.  This matches DuckDB's ``epoch_us()`` on naive
timestamps exactly, under ANY session zone.

For an input that is already ``TIMESTAMP`` (LTZ) the leading
``cast("timestamp_ntz")`` renders the instant in the session zone; the
engine's own sessions pin UTC (session.py) so this is the true epoch
there.  All driver-visible tables are NTZ, so the driver's plain
session never takes the LTZ path.

Everything here is a pure Catalyst expression: no UDF, stays inside
whole-stage codegen.

Reference parity: the reference computes event-time gaps with pandas
naive-``Timestamp`` subtraction (processing layer); this is the
Spark-native equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _ntz_epoch() -> Column:
    # Built per-call: F.expr parses lazily, but keep construction local
    # so importing this module never needs an active session.
    return F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch for TIMESTAMP or TIMESTAMP_NTZ columns.

    NTZ: wall-clock micros since 1970-01-01 (session-timezone
    independent — matches DuckDB ``epoch_us`` on naive timestamps).
    LTZ: true epoch under the engine's pinned-UTC sessions.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND", _ntz_epoch(), c.cast("timestamp_ntz")
    )


def epoch_s(col: Column | str) -> Column:
    """Whole seconds since epoch (floor), type-agnostic like epoch_us.

    Floor (= truncation for post-1970 data) matches DuckDB's
    ``date_diff('second', ...)`` boundary-crossing semantics used by
    the sessionization oracle.
    """
    return F.floor(epoch_us(col) / F.lit(1_000_000)).cast("long")
