"""Streaming crawl ingest (streaming/crawl_stream.py): per-batch
extraction + gating + exact dedup against the persisted hash index;
exactly-once semantics under full redelivery and crash-window replay;
end state equals the batch twin (plans/crawl.py::crawl_to_corpus)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_mlops_spark.streaming.crawl_stream import (
    CrawlStore,
    crawl_ingest_batch,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and keeps running "
    "through a long meadow with many distinct words to pass quality"
)
LINK_FARM_HTML = (
    "<p>x</p>" + "".join(f"<a href='/{i}'>click here now {i}</a>" for i in range(20))
)


def _page(doc_id: int, body: str) -> tuple[int, str]:
    return doc_id, f"<html><body><h1>t</h1><p>{body}</p></body></html>"


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, html string")


def test_ingest_classifies_and_dedups_across_batches(spark, tmp_path):
    store = CrawlStore.at(str(tmp_path / "crawl"))
    b1 = _mk(spark, [
        _page(1, GOOD),
        _page(2, GOOD + " variant two"),
        _page(3, GOOD),                      # in-batch dup of 1
        (4, LINK_FARM_HTML),                 # link share too high
    ])
    d1 = {r["doc_id"]: r["status"] for r in crawl_ingest_batch(
        b1, store, batch_id=1
    ).collect()}
    assert d1 == {
        1: "accepted", 2: "accepted", 3: "dup_in_batch",
        4: "rejected_gate",
    }
    b2 = _mk(spark, [
        _page(10, GOOD),                     # dup of batch-1 text
        _page(11, GOOD + " brand new text"),
    ])
    d2 = {r["doc_id"]: r["status"] for r in crawl_ingest_batch(
        b2, store, batch_id=2
    ).collect()}
    assert d2 == {10: "dup_history", 11: "accepted"}
    corpus = store.corpus.read(spark)
    assert {r["doc_id"] for r in corpus.collect()} == {1, 2, 11}
    # audit keeps full accounting
    audit = store.audit.read(spark)
    assert audit.count() == 6


def test_full_redelivery_is_noop(spark, tmp_path):
    store = CrawlStore.at(str(tmp_path / "crawl"))
    b1 = _mk(spark, [_page(1, GOOD), _page(2, GOOD + " two")])
    crawl_ingest_batch(b1, store, batch_id=7)
    v_corpus = store.corpus.latest_version()
    v_seen = store.seen.latest_version()
    v_audit = store.audit.latest_version()
    again = crawl_ingest_batch(b1, store, batch_id=7)
    assert {r["status"] for r in again.collect()} == {"accepted"}
    assert store.corpus.latest_version() == v_corpus
    assert store.seen.latest_version() == v_seen
    assert store.audit.latest_version() == v_audit


def test_crash_window_replay_converges(spark, tmp_path):
    # simulate the crash between the corpus/seen commits and the audit
    # marker: state carries the batch's hashes but no marker, so the
    # replay re-classifies its own docs as dup_history and appends
    # NOTHING — corpus/seen end state equals the batch twin
    store = CrawlStore.at(str(tmp_path / "crawl"))
    b1 = _mk(spark, [_page(1, GOOD)])
    crawl_ingest_batch(b1, store, batch_id=1)
    rows_before = store.corpus.read(spark).count()
    seen_before = store.seen.read(spark).count()
    # replay the same docs under a NEW batch id (no marker) — the
    # crash-window shape
    replay = {r["doc_id"]: r["status"] for r in crawl_ingest_batch(
        b1, store, batch_id=2
    ).collect()}
    assert replay == {1: "dup_history"}
    assert store.corpus.read(spark).count() == rows_before
    assert store.seen.read(spark).count() == seen_before


def test_crash_between_seen_and_corpus_commits_converges(spark, tmp_path):
    """THE window the r8 ordering got wrong (ADVICE r8): a crash after
    the seen commit but before the corpus commit. The replay must
    recognize its own prior accepts (self-replays: the index row
    carries this doc_id AND this batch_id), re-insert exactly the
    missing corpus docs, and keep the audit labels 'accepted' — no
    duplicates, no loss, no label degradation."""
    import os

    store = CrawlStore.at(str(tmp_path / "crawl"))
    crawl_ingest_batch(
        _mk(spark, [_page(1, GOOD)]), store, batch_id=0
    )
    b1 = _mk(spark, [_page(10, GOOD + " two"), _page(11, GOOD)])
    crawl_ingest_batch(b1, store, batch_id=1)
    # simulate the crash: roll back the CORPUS commit and the AUDIT
    # marker for batch 1 by deleting their newest manifest versions —
    # seen retains batch 1's hash rows, the exact mid-pair state
    for table in (store.corpus, store.audit):
        v = table.latest_version()
        os.remove(os.path.join(table.txn_path, f"v{v}.json"))
    assert store.corpus.read(spark).count() == 1  # only batch 0's doc

    replay = {r["doc_id"]: r["status"] for r in crawl_ingest_batch(
        b1, store, batch_id=1
    ).collect()}
    # labels faithful: the self-replayed accept stays accepted
    assert replay == {10: "accepted", 11: "dup_history"}
    corpus = store.corpus.read(spark)
    assert sorted(r["doc_id"] for r in corpus.collect()) == [1, 10]
    # one seen row per accepted hash — nothing doubled in the index
    assert store.seen.read(spark).count() == 2

    # and a SECOND full redelivery after convergence is a pure no-op
    v_c, v_s = store.corpus.latest_version(), store.seen.latest_version()
    again = {r["doc_id"]: r["status"] for r in crawl_ingest_batch(
        b1, store, batch_id=1
    ).collect()}
    assert again == replay
    assert store.corpus.latest_version() == v_c
    assert store.seen.latest_version() == v_s


def test_replay_keeps_dup_in_batch_label(spark, tmp_path):
    """ADVICE r9: on crashed-batch replay (state committed, marker
    lost), the in-batch loser joins the seen row the first attempt
    committed — from THIS batch_id, not history — and must keep the
    dup_in_batch label the first attempt gave it, because
    replace_partitions makes the replay's labels final."""
    import os

    store = CrawlStore.at(str(tmp_path / "crawl"))
    b1 = _mk(spark, [_page(10, GOOD), _page(11, GOOD)])  # 11 loses
    first = {r["doc_id"]: r["status"] for r in crawl_ingest_batch(
        b1, store, batch_id=1
    ).collect()}
    assert first == {10: "accepted", 11: "dup_in_batch"}
    # crash shape: marker lost, seen/corpus committed
    v = store.audit.latest_version()
    os.remove(os.path.join(store.audit.txn_path, f"v{v}.json"))
    replay = {r["doc_id"]: r["status"] for r in crawl_ingest_batch(
        b1, store, batch_id=1
    ).collect()}
    assert replay == first  # labels faithful across the replay
    assert store.corpus.read(spark).count() == 1
    assert store.seen.read(spark).count() == 1


def test_legacy_unpartitioned_marker_store_still_noops(spark, tmp_path):
    """ADVICE r9 migration fallback: a store whose audit markers were
    committed by the pre-partitioned revision (root manifest key) must
    still no-op on redelivery — the pruned probe can't see root dirs,
    so the probe falls back to a full audit scan for such stores."""
    store = CrawlStore.at(str(tmp_path / "crawl"))
    b1 = _mk(spark, [_page(1, GOOD), _page(2, GOOD + " two")])
    crawl_ingest_batch(b1, store, batch_id=1)
    # rewrite the audit table the way the OLD revision left it:
    # one unpartitioned snapshot under the root key
    legacy = store.audit.read(spark).localCheckpoint()
    store.audit.commit(legacy, partition_col=None, mode="replace_all")
    assert store.audit.partition_col() is None
    v_c, v_s = store.corpus.latest_version(), store.seen.latest_version()
    again = {r["doc_id"]: r["status"] for r in crawl_ingest_batch(
        b1, store, batch_id=1
    ).collect()}
    assert again == {1: "accepted", 2: "accepted"}
    assert store.corpus.latest_version() == v_c  # no re-ingest
    assert store.seen.latest_version() == v_s

    # MIXED manifest: a post-upgrade batch commits partitioned dirs on
    # top of the legacy root dirs; pre-upgrade batches must STILL no-op
    crawl_ingest_batch(
        _mk(spark, [_page(30, GOOD + " three")]), store, batch_id=2
    )
    assert store.audit.partition_col() == "batch_id"
    assert store.audit.has_unpartitioned_fragments()
    v_c, v_s = store.corpus.latest_version(), store.seen.latest_version()
    again = {r["doc_id"]: r["status"] for r in crawl_ingest_batch(
        b1, store, batch_id=1
    ).collect()}
    assert again == {1: "accepted", 2: "accepted"}
    assert store.corpus.latest_version() == v_c
    assert store.seen.latest_version() == v_s


def test_end_state_equals_batch_twin(spark, tmp_path):
    from data_pipeline_mlops_spark.plans.crawl import crawl_to_corpus

    store = CrawlStore.at(str(tmp_path / "crawl"))
    batches = [
        [_page(1, GOOD), _page(2, GOOD + " two"), (3, LINK_FARM_HTML)],
        [_page(10, GOOD), _page(11, GOOD + " three")],
        [_page(20, GOOD + " two"), _page(21, GOOD + " four")],
    ]
    for i, rows in enumerate(batches):
        crawl_ingest_batch(_mk(spark, rows), store, batch_id=i)
    streamed = store.corpus.read(spark)
    twin = crawl_to_corpus(
        _mk(spark, [r for b in batches for r in b])
    )
    a = {tuple(r) for r in streamed.select(*sorted(streamed.columns)).collect()}
    b = {tuple(r) for r in twin.select(*sorted(twin.columns)).collect()}
    assert a == b
