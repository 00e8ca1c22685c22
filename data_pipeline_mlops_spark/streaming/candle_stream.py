"""Incremental candlestick maintenance: a persisted per-(series,
bucket) OHLC store updated one micro-batch at a time — the STREAMING
form of the continuous-aggregate tier (operators/ohlc.py is the batch
form; registry `orders_incremental_candles` is the CDC-refresh form).

A live dashboard over a 100 TB stream cannot re-scan history per
refresh; it maintains MERGEABLE partials.  Candlesticks merge
associatively and commutatively, exactly like the CMS deltas in
sketch_stream.py merge by addition:

- open  = struct-min over (ts, tiebreak, value)  (min of mins)
- close = struct-max over (ts, tiebreak, value)  (max of maxes)
- high/low = max/min of partial highs/lows
- n_ticks / volume = sums (volume stays DECIMAL(38,6) in the store so
  the distributed, order-free sum is exact; rounding happens once at
  read time)

so each micro-batch contributes one delta row per touched (series,
bucket) and the current candle table is one fixed-size aggregation
over the delta log — same storage contract as CmsStore: everything in
ONE ManifestTable, each batch a single atomic commit.

Exactly-once under foreachBatch's at-least-once redelivery: candle
merge is NOT idempotent (a replayed delta double-counts volume), so
every commit carries its micro-batch id, ``applied()`` consults the
table first, and ``maintain()`` folds history into one summary row
per (series, bucket) plus a WATERMARK row (max folded batch id) —
identical replay/compaction contract to sketch_stream.CmsStore, and
the same reason it is safe: Structured Streaming batch ids are
monotone and only the tail is redelivered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_mlops_spark.operators.exact import MONEY_DECIMAL
from data_pipeline_mlops_spark.sources.txn import ManifestTable
from data_pipeline_mlops_spark.timeutil import epoch_s

_SCHEMA = (
    "kind string, batch_id long, series string, bucket_s long,"
    " o_t long, o_i long, o_v double, c_t long, c_i long, c_v double,"
    " high double, low double, n_ticks long, volume decimal(38,6)"
)

_MERGE_COLS = [
    "o_t", "o_i", "o_v", "c_t", "c_i", "c_v",
    "high", "low", "n_ticks", "volume",
]


def _merged(rows: DataFrame) -> DataFrame:
    """Fold delta/summary rows into one row per (series, bucket)."""
    o = F.struct(F.col("o_t"), F.col("o_i"), F.col("o_v"))
    c = F.struct(F.col("c_t"), F.col("c_i"), F.col("c_v"))
    omin = F.min(o)
    cmax = F.max(c)
    return rows.groupBy("series", "bucket_s").agg(
        omin.getField("o_t").alias("o_t"),
        omin.getField("o_i").alias("o_i"),
        omin.getField("o_v").alias("o_v"),
        cmax.getField("c_t").alias("c_t"),
        cmax.getField("c_i").alias("c_i"),
        cmax.getField("c_v").alias("c_v"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.sum("n_ticks").cast("long").alias("n_ticks"),
        F.sum("volume").cast(MONEY_DECIMAL).alias("volume"),
    )


class CandleStore:
    """Persisted OHLC partials over a (series, time-bucket) grid;
    every mutation is one atomic manifest commit."""

    def __init__(self, root: str, *, bucket: str = "hour") -> None:
        self.table = ManifestTable(root)
        self.bucket = bucket

    def _rows(self, spark: SparkSession) -> DataFrame | None:
        if self.table.latest_version() is None:
            return None
        return self.table.read(spark)

    def applied(self, spark: SparkSession, batch_id: int) -> bool:
        rows = self._rows(spark)
        if rows is None:
            return False
        hit = rows.where(
            (
                (F.col("kind") == "watermark")
                & (F.col("batch_id") >= batch_id)
            )
            | (
                (F.col("kind") == "delta")
                & (F.col("batch_id") == batch_id)
            )
        )
        return not hit.isEmpty()

    def status(self, spark: SparkSession, batch_id: int) -> tuple[bool, int]:
        """ONE store read answering both per-batch questions: (is
        ``batch_id`` already applied?, how many applied-but-not-yet-
        compacted delta batches sit in the store?). The foreachBatch
        adapter needs both every batch — probing them via applied() +
        pending_deltas() costs two full table scans (ADVICE r12)."""
        rows = self._rows(spark)
        if rows is None:
            return False, 0
        is_delta = F.col("kind") == "delta"
        hit = (
            (F.col("kind") == "watermark")
            & (F.col("batch_id") >= batch_id)
        ) | (is_delta & (F.col("batch_id") == batch_id))
        r = rows.agg(
            F.count(F.when(hit, 1)).alias("__hits"),
            F.count_distinct(
                F.when(is_delta, F.col("batch_id"))
            ).alias("__pending"),
        ).first()
        return bool(r["__hits"]), int(r["__pending"])

    def update(
        self,
        batch_df: DataFrame,
        *,
        series_col: str,
        ts_col: str,
        value_col: str,
        tiebreak_col: str,
        batch_id: int,
        assume_new: bool = False,
    ) -> bool:
        """Merge one batch's per-bucket partials in; returns False
        (no-op) on a redelivered batch id.  ``tiebreak_col`` must be
        numeric (it is cast to long in the store schema); a
        non-numeric id casts to NULL and breaks open/close tie
        determinism. ``assume_new=True`` skips the applied() probe —
        for callers that already adjudicated the batch id via
        status() on the same store version (single-writer only)."""
        spark = batch_df.sparkSession
        if not assume_new and self.applied(spark, batch_id):
            return False
        t = epoch_s(F.col(ts_col))
        edge = F.struct(
            t.alias("t"),
            F.col(tiebreak_col).cast("long").alias("i"),
            F.col(value_col).cast("double").alias("v"),
        )
        omin, cmax = F.min(edge), F.max(edge)
        delta = (
            batch_df.groupBy(
                F.col(series_col).cast("string").alias("series"),
                F.date_trunc(self.bucket, F.col(ts_col)).alias("__b"),
            )
            .agg(
                omin.getField("t").alias("o_t"),
                omin.getField("i").alias("o_i"),
                omin.getField("v").alias("o_v"),
                cmax.getField("t").alias("c_t"),
                cmax.getField("i").alias("c_i"),
                cmax.getField("v").alias("c_v"),
                F.max(F.col(value_col).cast("double")).alias("high"),
                F.min(F.col(value_col).cast("double")).alias("low"),
                F.count(F.lit(1)).alias("n_ticks"),
                F.sum(F.col(value_col).cast(MONEY_DECIMAL)).cast(
                    MONEY_DECIMAL
                ).alias("volume"),
            )
            .select(
                F.lit("delta").alias("kind"),
                F.lit(batch_id).cast("long").alias("batch_id"),
                "series",
                epoch_s(F.col("__b")).alias("bucket_s"),
                *_MERGE_COLS,
            )
        )
        self.table.commit(delta, mode="append")
        return True

    def pending_deltas(self, spark: SparkSession) -> int:
        """Number of applied-but-not-yet-compacted batches: distinct
        delta batch ids currently in the store (maintain() folds them
        into summary rows, so the count resets to 0 on compaction).
        This is the DURABLE compaction-cadence signal — unlike a
        closure counter it survives streaming-query restarts
        (ADVICE r11)."""
        rows = self._rows(spark)
        if rows is None:
            return 0
        return (
            rows.where(F.col("kind") == "delta")
            .select("batch_id")
            .distinct()
            .count()
        )

    def read_candles(self, spark: SparkSession) -> DataFrame:
        """The current candle table: one row per (series, bucket_s)
        with (open, high, low, close, n_ticks, volume) — volume
        rounded once here, exact decimal in the store."""
        rows = self._rows(spark)
        if rows is None:
            return spark.createDataFrame(
                [],
                "series string, bucket_s long, open double,"
                " high double, low double, close double,"
                " n_ticks long, volume double",
            )
        return _merged(
            rows.where(F.col("kind") != "watermark")
        ).select(
            "series",
            "bucket_s",
            F.col("o_v").alias("open"),
            "high",
            "low",
            F.col("c_v").alias("close"),
            "n_ticks",
            F.round("volume", 2).cast("double").alias("volume"),
        )

    def maintain(self, spark: SparkSession) -> None:
        """Fold the delta log into one summary row per (series,
        bucket) + a watermark row; one replace_all commit preserving
        the applied() contract (folded ids sit under the watermark)."""
        rows = self._rows(spark)
        if rows is None:
            return
        summary = _merged(
            rows.where(F.col("kind") != "watermark")
        ).select(
            F.lit("summary").alias("kind"),
            F.lit(-1).cast("long").alias("batch_id"),
            "series",
            "bucket_s",
            *_MERGE_COLS,
        )
        watermark = rows.agg(
            F.max("batch_id").cast("long").alias("batch_id")
        ).select(
            F.lit("watermark").alias("kind"),
            "batch_id",
            F.lit("").alias("series"),
            F.lit(-1).cast("long").alias("bucket_s"),
            *[
                F.lit(0).cast("long").alias(c)
                if c in ("o_t", "o_i", "c_t", "c_i", "n_ticks")
                else F.lit(0.0).cast(MONEY_DECIMAL).alias(c)
                if c == "volume"
                else F.lit(0.0).alias(c)
                for c in _MERGE_COLS
            ],
        )
        self.table.commit(
            summary.unionByName(watermark), mode="replace_all"
        )


def candle_foreach_batch(
    *,
    root: str,
    series_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket: str = "hour",
    maintain_every: int = 32,
):
    """foreachBatch adapter: `stream.writeStream.foreachBatch(this)`.
    The store self-compacts whenever ``maintain_every`` or more
    APPLIED batches have accumulated since the last compaction
    (0 disables). The cadence is derived from DURABLE store state —
    the count of distinct un-folded delta batch ids
    (CandleStore.status) — not a closure counter: empty batches and
    exactly-once-skipped redeliveries don't advance it (ADVICE r10),
    and a streaming-query restart can't reset it (ADVICE r11: the old
    in-memory counter restarted at zero, so restart intervals shorter
    than ``maintain_every`` batches let delta files accumulate
    unboundedly). Both per-batch store questions — applied? and
    pending-delta count — come from ONE status() read (ADVICE r12:
    the applied()+pending_deltas() pair cost two full scans)."""
    store = CandleStore(root, bucket=bucket)

    def body(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        already, pending = store.status(spark, batch_id)
        if already:
            return
        store.update(
            batch_df,
            series_col=series_col,
            ts_col=ts_col,
            value_col=value_col,
            tiebreak_col=tiebreak_col,
            batch_id=batch_id,
            assume_new=True,
        )
        # +1: this batch's delta just landed and is itself un-folded
        if maintain_every and pending + 1 >= maintain_every:
            store.maintain(spark)

    return body
