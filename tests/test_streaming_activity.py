"""Streaming exact rolling-distinct activity mart: streamed index ==
batch operator on the same events, replay + compaction idempotent."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.analytics import (
    rolling_distinct_users,
)
from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.activity import (
    activity_ingest_batch,
    rolling_dau_report,
)


@pytest.fixture(scope="module")
def sf_dir():
    d = "/root/testdata/sf0.001"
    if not os.path.isdir(d):
        pytest.skip("testdata missing")
    return d


def test_streamed_activity_equals_batch_with_replay_and_compaction(
    spark, sf_dir, tmp_path
):
    ev = load_table(spark, sf_dir, "events")
    idx = str(tmp_path / "actidx")
    run = activity_ingest_batch(spark, idx, compact_every=2)
    b0 = ev.filter(F.col("event_id") % 3 == 0)
    run(b0, 0)
    run(ev.filter(F.col("event_id") % 3 == 1), 1)
    run(ev.filter(F.col("event_id") % 3 == 2), 2)  # triggers compaction
    want = {
        r["day"]: r["dau_7d"]
        for r in rolling_distinct_users(ev, days=7).collect()
    }
    got = {
        r["day"]: r["dau_7d"]
        for r in rolling_dau_report(spark, idx, days=7).collect()
    }
    assert got == want and want
    # replay a compacted-away batch: identity rows, distinct absorbs
    run(b0, 0)
    got2 = {
        r["day"]: r["dau_7d"]
        for r in rolling_dau_report(spark, idx, days=7).collect()
    }
    assert got2 == want
    # the SAME stored pairs answer a different window length after the
    # fact — the reason the index stores pairs, not per-day counts
    want30 = {
        r["day"]: r["dau_30d"]
        for r in rolling_distinct_users(ev, days=30).collect()
    }
    got30 = {
        r["day"]: r["dau_30d"]
        for r in rolling_dau_report(spark, idx, days=30).collect()
    }
    assert got30 == want30
