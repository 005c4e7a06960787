"""Sketch mart (streaming/sketchmart.py): the composed body must leave
each of the three indexes exactly as its standalone pipeline would —
every report equals its batch twin on the union."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.cms import cms_sketch
from sparkstreaming_gmall_scala_spark.operators.histogram import fixed_histogram
from sparkstreaming_gmall_scala_spark.operators.hll import (
    daily_sketches,
    estimate_daily,
)
from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.cms import cms_report
from sparkstreaming_gmall_scala_spark.streaming.histogram import (
    histogram_report,
)
from sparkstreaming_gmall_scala_spark.streaming.hll import hll_report
from sparkstreaming_gmall_scala_spark.streaming.sketchmart import (
    sketch_mart_batch,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_composed_mart_equals_each_batch_twin(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min("value").cast("double"), F.max("value").cast("double")
    ).collect()[0]
    dirs = {k: str(tmp_path / k) for k in ("cms", "hist", "hll")}
    run = sketch_mart_batch(
        spark, dirs["cms"], dirs["hist"], dirs["hll"],
        hist_lo=b[0], hist_hi=b[1], compact_every=2,
    )
    b0 = ev.filter(F.col("event_id") % 3 == 0)
    run(b0, 0)
    run(ev.filter(F.col("event_id") % 3 == 1), 1)
    run(ev.filter(F.col("event_id") % 3 == 2), 2)  # triggers compaction
    run(b0, 0)  # replay a compacted-away batch into ALL three indexes

    assert _rows(cms_report(spark, dirs["cms"])) == _rows(
        cms_sketch(ev.select("user_id"), "user_id", 4, 256)
    )
    assert _rows(histogram_report(spark, dirs["hist"])) == _rows(
        fixed_histogram(ev.select("value"), "value", 32, lo=b[0], hi=b[1])
    )
    got_hll = {
        r["day"]: r["n_users"]
        for r in estimate_daily(hll_report(spark, dirs["hll"])).collect()
    }
    want_hll = {
        r["day"]: r["n_users"]
        for r in estimate_daily(daily_sketches(ev)).collect()
    }
    assert got_hll == want_hll


def test_sketch_mart_live_pipeline(spark, tmp_path):
    """The checkpointed wrapper drives the composed body over a real
    file-drop micro-batch and every index answers."""
    import datetime as dt
    import glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from sparkstreaming_gmall_scala_spark.operators.cms import cms_estimate
    from sparkstreaming_gmall_scala_spark.operators.hll import estimate_daily
    from sparkstreaming_gmall_scala_spark.streaming.sketchmart import (
        sketch_mart_pipeline,
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
        (i, 1 + i % 2, "view", dt.datetime(2024, 1, 1, 10, i), float(i))
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, schema)
    src = tmp_path / "src"
    src.mkdir()
    with tempfile.TemporaryDirectory() as tmp:
        df.coalesce(1).write.parquet(os.path.join(tmp, "w"))
        part = glob.glob(os.path.join(tmp, "w", "part-*.parquet"))[0]
        shutil.copy(part, src / "drop0.parquet")
    dirs = {k: str(tmp_path / k) for k in ("cms", "hist", "hll")}
    q = sketch_mart_pipeline(
        spark, str(src), dirs["cms"], dirs["hist"], dirs["hll"],
        str(tmp_path / "ckpt"), schema, hist_lo=0.0, hist_hi=10.0,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    est = {
        r["user_id"]: r["est_cnt"]
        for r in cms_estimate(
            cms_report(spark, dirs["cms"]),
            spark.createDataFrame([(1,), (2,)], "user_id long"),
            "user_id", 4, 256,
        ).collect()
    }
    assert est[1] >= 5 and est[2] >= 5
    h = histogram_report(spark, dirs["hist"])
    assert h.agg(F.sum("cnt")).collect()[0][0] == 10
    days = estimate_daily(hll_report(spark, dirs["hll"])).collect()
    assert len(days) == 1 and days[0]["n_users"] == 2
