"""Streaming OHLC (streaming/ohlc.py): merged partial bars must equal
the batch event_ohlc on the union — the commutative-monoid argument —
through replay and compaction, under adversarial batch splits that
scatter each hour's first/last events across batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.ohlc import (
    ohlc_ingest_batch,
    ohlc_report,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_ohlc_equals_batch_on_union(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    idx = str(tmp_path / "oidx")
    run = ohlc_ingest_batch(spark, idx, compact_every=2)
    # split by event_id mod 3: every hour's open/close/high/low events
    # land in arbitrary different batches — the merge must reassemble
    # them exactly
    b0 = ev.filter(F.col("event_id") % 3 == 0)
    run(b0, 0)
    run(ev.filter(F.col("event_id") % 3 == 1), 1)
    run(ev.filter(F.col("event_id") % 3 == 2), 2)  # triggers compaction

    want = _rows(load_all()["event_ohlc"].builder(spark, sf_dir))
    assert _rows(ohlc_report(spark, idx)) == want

    # replay a compacted-away batch: (hour, src_batch) dedup absorbs the
    # duplicate partials, bars unchanged
    run(b0, 0)
    assert _rows(ohlc_report(spark, idx)) == want


def test_single_event_hours_and_batch_boundary_opens(spark, tmp_path):
    """Hand case: an hour whose open and close arrive in different
    batches, in the WRONG order (close first) — the ord key, not arrival
    order, must pick open/close."""
    import datetime as dt

    schema = "event_id long, user_id long, event_type string, ts timestamp, value double"
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        [(e, 1, "purchase", dt.datetime.fromisoformat(t), v)
         for e, t, v in rows],
        schema,
    )
    idx = str(tmp_path / "oidx")
    run = ohlc_ingest_batch(spark, idx)
    run(mk([(2, "2024-01-01 10:50:00", 99.0)]), 0)   # close arrives first
    run(mk([(1, "2024-01-01 10:05:00", 11.0)]), 1)   # open arrives later
    bars = ohlc_report(spark, idx).collect()
    assert len(bars) == 1
    b = bars[0]
    assert (b["open"], b["close"], b["high"], b["low"], b["n_events"]) == (
        11.0, 99.0, 99.0, 11.0, 2,
    )


def test_analytics_mart_composition(spark, sf_dir, tmp_path):
    """One stream, every mart: after driving the composed body over
    three batches, funnel, retention, AND OHLC reports all equal their
    batch catalog queries on the union — one ingest, three marts."""
    from sparkstreaming_gmall_scala_spark.streaming.funnel import (
        analytics_mart_batch,
        funnel_report,
        retention_report,
    )

    ev = load_table(spark, sf_dir, "events")
    eidx, oidx = str(tmp_path / "eidx"), str(tmp_path / "oidx")
    run = analytics_mart_batch(spark, eidx, oidx, compact_every=2)
    for i in range(3):
        run(ev.filter(F.col("event_id") % 3 == i), i)

    reg = load_all()
    assert _rows(funnel_report(spark, eidx)) == _rows(
        reg["event_funnel"].builder(spark, sf_dir)
    )
    assert _rows(retention_report(spark, eidx)) == _rows(
        reg["user_retention"].builder(spark, sf_dir)
    )
    assert _rows(ohlc_report(spark, oidx)) == _rows(
        reg["event_ohlc"].builder(spark, sf_dir)
    )


def test_analytics_mart_live_pipeline(spark, tmp_path):
    """The checkpointed wrapper wires the composed body over a real
    file-drop micro-batch."""
    import datetime as dt
    import glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from sparkstreaming_gmall_scala_spark.streaming.funnel import (
        analytics_mart_pipeline,
        funnel_report,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rows = [
        (1, 1, "view", dt.datetime(2024, 1, 1, 10, 0), 1.0),
        (2, 1, "click", dt.datetime(2024, 1, 1, 10, 5), 1.0),
        (3, 1, "purchase", dt.datetime(2024, 1, 1, 10, 9), 42.0),
    ]
    df = spark.createDataFrame(rows, schema)
    src = tmp_path / "src"
    src.mkdir()
    with tempfile.TemporaryDirectory() as tmp:
        df.coalesce(1).write.parquet(os.path.join(tmp, "w"))
        part = glob.glob(os.path.join(tmp, "w", "part-*.parquet"))[0]
        shutil.copy(part, src / "drop0.parquet")
    q = analytics_mart_pipeline(
        spark,
        str(src),
        str(tmp_path / "eidx"),
        str(tmp_path / "oidx"),
        str(tmp_path / "ckpt"),
        schema,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    funnel = {
        r["stage"]: r["n_users"]
        for r in funnel_report(spark, str(tmp_path / "eidx")).collect()
    }
    assert funnel == {
        "view": 1, "click_after_view": 1, "purchase_after_click": 1,
    }
    bars = ohlc_report(spark, str(tmp_path / "oidx")).collect()
    assert len(bars) == 1 and bars[0]["n_events"] == 1


def test_cross_batch_duplicate_events_with_ledger(spark, sf_dir, tmp_path):
    """Regression: a duplicate event redelivered in a LATER batch must
    not double-count. With the id ledger the bars equal the batch query
    (which sees each event once); the funnel/retention marts already
    dedup at report time, so all three marts agree on the dirty
    stream."""
    ev = load_table(spark, sf_dir, "events")
    idx, ledger = str(tmp_path / "oidx"), str(tmp_path / "oids")
    run = ohlc_ingest_batch(spark, idx, compact_every=2, ledger_dir=ledger)
    b0 = ev.filter(F.col("event_id") % 3 == 0)
    b1 = ev.filter(F.col("event_id") % 3 == 1)
    run(b0, 0)
    run(b1.unionByName(b0), 1)          # redelivers ALL of batch 0
    run(ev.filter(F.col("event_id") % 3 == 2), 2)
    run(b0, 0)                           # plus a same-id replay
    want = _rows(load_all()["event_ohlc"].builder(spark, sf_dir))
    assert _rows(ohlc_report(spark, idx)) == want
