"""Streaming stateful-store lifetime cost (VERDICT r10 next-round #4):
extend the SCALING_r10c candle-store measurement to the other two
persisted streaming stores —

- streaming/crawl_stream.py  (exact-hash crawl ingest index)
- streaming/dedup_stream.py  (MinHash/LSH near-dup index)

For each: 24 micro-batches at ~10x the volume the r5/r8 artifacts
measured per probe, per-batch wall time, head/tail mean ratio (flat =
per-batch cost tracks batch size, not history size), compaction
cadence (maintain every 8 applied batches), and a final-state check:

- crawl: the streamed corpus equals the batch twin
  (plans/crawl.py::crawl_to_corpus over the concatenation of every
  batch) row-for-row;
- dedup: the index's signature set equals exactly the surviving
  (non-duplicate) decision ids, and a full redelivery of the last
  batch is a decision-identical no-op.

Writes SCALING_r11.json. Run alone (single Spark JVM on this box).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = 24
DOCS_PER_BATCH = 2000
MAINTAIN_EVERY = 8
DUP_SHARE = 10          # 1 in 10 docs repeats an earlier batch's text


def _text_expr():
    """Deterministic per-id document text as a Catalyst expression:
    ~40 words drawn from an id-seeded pattern, so any two ids with the
    same (id % DUP_SHARE == 0 -> mirrored source id) produce identical
    text without driver-side generation."""
    from pyspark.sql import functions as F

    base = F.col("src_id")
    # modulus prime > max id so the 40-residue vector is distinct per
    # src_id: every doc is unique EXCEPT the planted mirrors (the
    # first version used % 97 and collapsed the corpus to 97 texts,
    # which kept the index tiny and proved nothing about growth)
    words = [
        F.concat(
            F.lit(f"tok{k}_"), ((base * (k + 3)) % 1000003).cast("string")
        )
        for k in range(40)
    ]
    return F.concat_ws(" ", F.lit("document body"), *words)


def _batch(spark, b: int, *, html: bool):
    """Batch b's (doc_id, text|html) frame. Every 10th id re-uses the
    text of the same slot one batch earlier (a history duplicate);
    ids are globally unique."""
    from pyspark.sql import functions as F

    lo = b * DOCS_PER_BATCH
    df = spark.range(lo, lo + DOCS_PER_BATCH).select(
        F.col("id").alias("doc_id"),
        # planted history dups mirror a BATCH-0 slot (its text is its
        # own pattern, so the mirror really exists in the store): a
        # steady 10% of every later batch probes the index positively
        F.when(
            (F.col("id") % DUP_SHARE == 0) & (F.col("id") >= DOCS_PER_BATCH),
            F.col("id") % DOCS_PER_BATCH,
        )
        .otherwise(F.col("id"))
        .alias("src_id"),
    )
    df = df.withColumn("text", _text_expr()).drop("src_id")
    if html:
        df = df.select(
            "doc_id",
            F.concat(
                F.lit("<html><body><h1>t</h1><p>"),
                F.col("text"),
                F.lit("</p></body></html>"),
            ).alias("html"),
        )
    return df


def run_crawl(spark) -> dict:
    from pyspark.sql import functions as F

    from data_pipeline_mlops_spark.plans.crawl import crawl_to_corpus
    from data_pipeline_mlops_spark.sources.layout import (
        compact_if_fragmented,
    )
    from data_pipeline_mlops_spark.streaming.crawl_stream import (
        CrawlStore,
        crawl_ingest_batch,
    )

    root = tempfile.mkdtemp(prefix="crawl_life_")
    store = CrawlStore.at(root)
    times = []
    for b in range(BATCHES):
        pages = _batch(spark, b, html=True)
        t0 = time.monotonic()
        crawl_ingest_batch(pages, store, batch_id=b)
        if MAINTAIN_EVERY and b > 0 and b % MAINTAIN_EVERY == 0:
            # the hash index is the per-batch join target; corpus and
            # audit are append-only products
            compact_if_fragmented(
                store.seen, spark, max_txn_dirs=8,
                target_rows_per_file=4_000_000,
            )
        times.append(round(time.monotonic() - t0, 3))

    got = sorted(
        (r["doc_id"], r["text"])
        for r in store.corpus.read(spark)
        .select("doc_id", "text")
        .collect()
    )
    all_pages = _batch(spark, 0, html=True)
    for b in range(1, BATCHES):
        all_pages = all_pages.unionByName(_batch(spark, b, html=True))
    want = sorted(
        (r["doc_id"], r["text"])
        for r in crawl_to_corpus(all_pages).select("doc_id", "text").collect()
    )
    audit = store.audit.read(spark)
    statuses = {
        r["status"]: r["n"]
        for r in audit.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return {
        "store": "crawl_stream.CrawlStore",
        "batches": BATCHES,
        "docs_per_batch": DOCS_PER_BATCH,
        "maintain_every": MAINTAIN_EVERY,
        "maintain_target": "seen (the per-batch anti-join side)",
        "batch_times_sec": times,
        "head_mean_sec": round(statistics.mean(times[1:7]), 3),
        "tail_mean_sec": round(statistics.mean(times[-6:]), 3),
        "tail_over_head": round(
            statistics.mean(times[-6:]) / statistics.mean(times[1:7]), 2
        ),
        "final_equals_batch_twin": got == want,
        "corpus_rows": len(got),
        "audit_status_counts": statuses,
    }


def run_dedup(spark) -> dict:
    from data_pipeline_mlops_spark.sources.layout import (  # noqa: F401
        compact_if_fragmented,
    )
    from data_pipeline_mlops_spark.streaming.dedup_stream import (
        DedupIndex,
        dedup_batch,
    )

    root = tempfile.mkdtemp(prefix="dedup_life_")
    index = DedupIndex(root)
    times = []
    survivors: set[int] = set()
    dups = 0
    for b in range(BATCHES):
        docs = _batch(spark, b, html=False)
        t0 = time.monotonic()
        decisions = dedup_batch(
            docs, index, id_col="doc_id", batch_id=b
        ).collect()
        if MAINTAIN_EVERY and b > 0 and b % MAINTAIN_EVERY == 0:
            index.maintain(spark, max_txn_dirs=8)
        times.append(round(time.monotonic() - t0, 3))
        for r in decisions:
            if r["is_duplicate"]:
                dups += 1
            else:
                survivors.add(r["doc_id"])

    sig_ids = {
        r["doc_id"] for r in index.sigs.read(spark).select("doc_id").collect()
    }
    # full redelivery of the final batch: decision-identical no-op
    last = _batch(spark, BATCHES - 1, html=False)
    replay = dedup_batch(
        last, index, id_col="doc_id", batch_id=BATCHES - 1
    ).collect()
    replay_ok = (
        len(replay) == DOCS_PER_BATCH
        and {
            r["doc_id"]
            for r in index.sigs.read(spark).select("doc_id").collect()
        }
        == sig_ids
    )
    return {
        "store": "dedup_stream.DedupIndex",
        "batches": BATCHES,
        "docs_per_batch": DOCS_PER_BATCH,
        "maintain_every": MAINTAIN_EVERY,
        "maintain_target": "bands+sigs (compact_if_fragmented)",
        "batch_times_sec": times,
        "head_mean_sec": round(statistics.mean(times[1:7]), 3),
        "tail_mean_sec": round(statistics.mean(times[-6:]), 3),
        "tail_over_head": round(
            statistics.mean(times[-6:]) / statistics.mean(times[1:7]), 2
        ),
        "index_equals_survivors": sig_ids == survivors,
        "survivor_count": len(survivors),
        "duplicate_decisions": dups,
        "replay_last_batch_noop": replay_ok,
    }


def main() -> None:
    from data_pipeline_mlops_spark.session import get_spark

    spark = get_spark(app_name="stream-lifetime-r11")
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "metric": "streaming_store_lifetime",
        "runs": [run_crawl(spark), run_dedup(spark)],
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_r11.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out)[:2000])


if __name__ == "__main__":
    main()
