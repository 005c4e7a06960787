"""Streaming deterministic sampler (streaming/sample.py): the sample
after any prefix of micro-batches must equal the batch group_sample_k
over the union of those batches (the hash-rank monoid), survive replay,
and stay bounded."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.sampling import group_sample_k
from sparkstreaming_gmall_scala_spark.sinks.batch import AppendOnlyIndex
from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.sample import (
    sample_ingest_batch,
    sample_report,
)

K = 20


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )


def _ids(df):
    return sorted(r["event_id"] for r in df.collect())


def test_streamed_sample_equals_batch_at_every_prefix(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    idx = str(tmp_path / "sidx")
    run = sample_ingest_batch(spark, idx, "event_id", "event_type", K)
    b0 = ev.filter(F.col("event_id") % 3 == 0)
    b1 = ev.filter(F.col("event_id") % 3 == 1)
    b2 = ev.filter(F.col("event_id") % 3 == 2)

    run(b0, 0)
    got0 = _ids(sample_report(spark, idx, "event_id", "event_type", K))
    want0 = _ids(group_sample_k(b0, "event_id", "event_type", K))
    assert got0 == want0

    run(b1, 1)
    run(b2, 2)
    got = _ids(sample_report(spark, idx, "event_id", "event_type", K))
    want = _ids(group_sample_k(ev, "event_id", "event_type", K))
    assert got == want  # arrival order never changes the sample


def test_streamed_sample_replay_and_bounded_state(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    idx = str(tmp_path / "sidx2")
    run = sample_ingest_batch(spark, idx, "event_id", "event_type", K)
    b0 = ev.filter(F.col("event_id") % 2 == 0)
    b1 = ev.filter(F.col("event_id") % 2 == 1)
    run(b0, 0)
    run(b1, 1)
    run(b1, 1)  # crash-replay rewrites its own directory, not a new one

    got = _ids(sample_report(spark, idx, "event_id", "event_type", K))
    want = _ids(group_sample_k(ev, "event_id", "event_type", K))
    assert got == want

    # bounded: the index holds at most k × |strata| rows per generation
    n_strata = ev.select("event_type").distinct().count()
    raw = AppendOnlyIndex(idx).read(spark)
    assert raw.count() <= K * n_strata * 2  # two committed generations


def test_streamed_sample_compaction_transparent(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    idx = str(tmp_path / "sidx3")
    run = sample_ingest_batch(
        spark, idx, "event_id", "event_type", K, compact_every=2
    )
    for i in range(4):
        run(ev.filter(F.col("event_id") % 4 == i), i)
    got = _ids(sample_report(spark, idx, "event_id", "event_type", K))
    want = _ids(group_sample_k(ev, "event_id", "event_type", K))
    assert got == want


def test_streamed_weighted_sample_equals_batch_and_replays(spark, sf_dir, tmp_path):
    """Weighted (A-ES) twin: streamed report == batch weighted_sample_k
    over the union at every prefix; a replayed batch changes nothing."""
    from sparkstreaming_gmall_scala_spark.operators.sampling import (
        weighted_sample_k,
    )
    from sparkstreaming_gmall_scala_spark.streaming.sample import (
        weighted_sample_ingest_batch,
        weighted_sample_report,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    idx = str(tmp_path / "widx")
    run = weighted_sample_ingest_batch(
        spark, idx, "doc_id", "n_chars", K, strata_col="lang"
    )
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    run(b0, 0)
    got0 = sorted(
        r["doc_id"]
        for r in weighted_sample_report(
            spark, idx, "doc_id", "n_chars", K, strata_col="lang"
        ).collect()
    )
    want0 = sorted(
        r["doc_id"]
        for r in weighted_sample_k(b0, "doc_id", "n_chars", K, "lang").collect()
    )
    assert got0 == want0
    run(b1, 1)
    run(b1, 1)  # replay of the last batch: identical candidates re-append
    got = sorted(
        r["doc_id"]
        for r in weighted_sample_report(
            spark, idx, "doc_id", "n_chars", K, strata_col="lang"
        ).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in weighted_sample_k(docs, "doc_id", "n_chars", K, "lang").collect()
    )
    assert got == want
