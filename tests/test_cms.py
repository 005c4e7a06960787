"""Count-min sketch (operators/cms.py, streaming/cms.py): one-sided
error bound on real tables, bounded sketch size, exact streaming merge
(monoid), and replay idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.cms import (
    cms_estimate,
    cms_merge,
    cms_sketch,
)
from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.cms import (
    cms_ingest_batch,
    cms_report,
)

D, W = 4, 256


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_estimate_dominates_truth_with_bounded_overshoot(spark, sf_dir):
    """est >= true for EVERY key (structural: a key's own counts sit in
    each of its cells), and the overshoot stays within a generous
    multiple of the N/width collision bound — a regression pin on the
    deterministic sketch, not a probability claim."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    n = ev.count()
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cms_estimate(
        cms_sketch(ev, "user_id", D, W), truth.select("user_id"),
        "user_id", D, W,
    )
    joined = truth.join(est, "user_id")
    assert joined.filter(F.col("est_cnt") < F.col("true_cnt")).count() == 0
    worst = joined.agg(
        F.max(F.col("est_cnt") - F.col("true_cnt")).alias("d")
    ).collect()[0]["d"]
    assert worst <= 4 * n / W + 1, (worst, n)


def test_sketch_size_is_bounded_by_cells(spark, sf_dir):
    sk = cms_sketch(
        load_table(spark, sf_dir, "lineitem").select("l_partkey"),
        "l_partkey", D, W,
    )
    assert sk.count() <= D * W
    # every cell's count is positive and rows/buckets are in range
    bad = sk.filter(
        (F.col("cnt") <= 0)
        | (F.col("row") < 0) | (F.col("row") >= D)
        | (F.col("bucket") < 0) | (F.col("bucket") >= W)
    )
    assert bad.count() == 0


def test_absent_key_estimates_zero_or_collisions_only(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "k long")
    sk = cms_sketch(df, "k", D, W)
    probe = spark.createDataFrame([(999999,)], "k long")
    est = cms_estimate(sk, probe, "k", D, W).collect()[0]["est_cnt"]
    # absent key: estimate is whatever its 4 cells collide into — with
    # 50 keys in 256 buckets the min cell is overwhelmingly 0; either
    # way it must not exceed the worst single-cell load
    assert 0 <= est <= 50


def test_merge_equals_sketch_of_union(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    parts = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    merged = cms_merge(
        *[cms_sketch(p.select("user_id"), "user_id", D, W) for p in parts]
    )
    want = cms_sketch(ev.select("user_id"), "user_id", D, W)
    assert _rows(merged) == _rows(want)


def test_streamed_sketch_equals_batch_with_replay_and_compaction(
    spark, sf_dir, tmp_path
):
    ev = load_table(spark, sf_dir, "events")
    idx = str(tmp_path / "cmsidx")
    run = cms_ingest_batch(spark, idx, compact_every=2)
    b0 = ev.filter(F.col("event_id") % 3 == 0)
    run(b0, 0)
    run(ev.filter(F.col("event_id") % 3 == 1), 1)
    run(ev.filter(F.col("event_id") % 3 == 2), 2)  # triggers compaction

    want = _rows(cms_sketch(ev.select("user_id"), "user_id", D, W))
    assert _rows(cms_report(spark, idx)) == want

    # replay a compacted-away batch: (row, bucket, src_batch) dedup
    # absorbs the duplicate partials
    run(b0, 0)
    assert _rows(cms_report(spark, idx)) == want

    # the merged sketch serves estimates identical to the batch path
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    est_stream = cms_estimate(
        cms_report(spark, idx), truth.select("user_id"), "user_id", D, W
    )
    est_batch = cms_estimate(
        cms_sketch(ev.select("user_id"), "user_id", D, W),
        truth.select("user_id"), "user_id", D, W,
    )
    assert _rows(est_stream) == _rows(est_batch)


def test_null_keys_are_dropped_not_hashed(spark):
    """Regression: a null key must not hash into a phantom bucket
    (Spark's concat_ws skips nulls; the oracle's || propagates them —
    dropping is the one semantics both engines share)."""
    df = spark.createDataFrame([(1,), (None,), (1,), (None,)], "k long")
    sk = cms_sketch(df, "k", D, W)
    # only key 1's cells exist: depth rows, total count 2 each
    rows = sk.collect()
    assert len(rows) == D and all(r["cnt"] == 2 for r in rows)
    est = cms_estimate(
        sk, df.filter(F.col("k").isNotNull()).distinct(), "k", D, W
    ).collect()
    assert [(r["k"], r["est_cnt"]) for r in est] == [(1, 2)]
