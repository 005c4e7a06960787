"""Streaming funnel (streaming/funnel.py): streamed report == batch
event_funnel on the union, EXACT under out-of-order late arrivals (the
property the discarded accumulator design cannot have), replay- and
compaction-transparent."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.funnel import (
    funnel_ingest_batch,
    funnel_report,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_funnel_equals_batch_on_union(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    idx = str(tmp_path / "fidx")
    run = funnel_ingest_batch(spark, idx, compact_every=2)
    b0 = ev.filter(F.col("event_id") % 3 == 0)
    run(b0, 0)
    run(ev.filter(F.col("event_id") % 3 == 1), 1)
    run(ev.filter(F.col("event_id") % 3 == 2), 2)  # triggers compaction

    want = _rows(load_all()["event_funnel"].builder(spark, sf_dir))
    assert _rows(funnel_report(spark, idx)) == want

    # replay a compacted-away batch: unchanged
    run(b0, 0)
    assert _rows(funnel_report(spark, idx)) == want


def test_streamed_funnel_exact_under_late_data(spark, tmp_path):
    """A late EARLY view must retroactively qualify a click that arrived
    before it — the case a per-user first-view/first-click accumulator
    gets wrong (it would have discarded the click as pre-view)."""
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    t = lambda s: f"2024-01-01 00:0{s}:00"  # noqa: E731
    on_time = [
        (1, 7, "view", t(5)),      # late-batch ordering: the LATER view
        (2, 7, "click", t(3)),     # click BEFORE that view's ts
        (3, 7, "purchase", t(4)),
    ]
    late = [
        (4, 7, "view", t(1)),      # the true first view, arriving last
    ]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        [(e, u, y, __import__("datetime").datetime.fromisoformat(ts))
         for e, u, y, ts in rows],
        schema,
    )
    idx = str(tmp_path / "fidx")
    run = funnel_ingest_batch(spark, idx)
    run(mk(on_time), 0)
    # before the late view: click@3 precedes view@5 -> funnel stalls at view
    before = {r["stage"]: r["n_users"] for r in funnel_report(spark, idx).collect()}
    assert before == {"view": 1, "click_after_view": 0, "purchase_after_click": 0}
    run(mk(late), 1)
    # after: first view is t1=:01, click@3 qualifies, purchase@4 follows
    after = {r["stage"]: r["n_users"] for r in funnel_report(spark, idx).collect()}
    assert after == {"view": 1, "click_after_view": 1, "purchase_after_click": 1}


def test_streamed_retention_equals_batch_on_union(spark, sf_dir, tmp_path):
    """Streamed retention over the shared analytics index == the
    user_retention catalog query on the union, through compaction and a
    replay — including the late-cohort-shift case a per-user scalar
    cohort state would get wrong."""
    from sparkstreaming_gmall_scala_spark.streaming.funnel import (
        events_ingest_batch,
        retention_report,
    )

    ev = load_table(spark, sf_dir, "events")
    idx = str(tmp_path / "eidx")
    run = events_ingest_batch(spark, idx, compact_every=2)
    # order batches NEWEST-first so every user's cohort day shifts
    # earlier as later batches land (the retroactive case)
    run(ev.filter(F.col("event_id") % 3 == 2), 0)
    run(ev.filter(F.col("event_id") % 3 == 1), 1)
    run(ev.filter(F.col("event_id") % 3 == 0), 2)  # triggers compaction

    want = _rows(load_all()["user_retention"].builder(spark, sf_dir))
    assert _rows(retention_report(spark, idx)) == want

    run(ev.filter(F.col("event_id") % 3 == 2), 0)  # replay
    assert _rows(retention_report(spark, idx)) == want
