"""HLL sketch index (operators/hll.py, streaming/hll.py): error bound
vs exact counts, lossless merge (sub-sketches union == one-shot
sketch), rolling window correctness, streaming equality with replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.hll import (
    daily_sketches,
    estimate_daily,
    merge_sketch_tables,
    rolling_distinct,
)
from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.hll import (
    hll_ingest_batch,
    hll_report,
)

# lgK=12 → relative std error ~1.04/sqrt(2^12) ≈ 1.6%; 5% is a safe
# deterministic bound for the seeded test tables
TOL = 0.05


def _close_enough(a: int, b: int) -> bool:
    return abs(a - b) <= max(1.0, TOL * b)


def test_daily_estimates_within_tolerance(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    est = {
        r["day"]: r["n_users"]
        for r in estimate_daily(daily_sketches(ev)).collect()
    }
    exact = {
        r["day"]: r["n"]
        for r in ev.select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for d, n in exact.items():
        assert _close_enough(est[d], n), (d, est[d], n)


def test_rolling_mau_matches_exact_windowed_distinct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {
        r["day"]: r["n_users"]
        for r in rolling_distinct(daily_sketches(ev), 30).collect()
    }
    act = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = [r["day"] for r in act.select("day").distinct().collect()]
    for d in days:
        exact = (
            act.filter(
                (F.col("day") <= F.lit(d))
                & (F.col("day") > F.date_sub(F.lit(d), 30))
            )
            .select("user_id")
            .distinct()
            .count()
        )
        assert _close_enough(got[d], exact), (d, got[d], exact)


def test_union_of_subsketches_is_lossless(spark, sf_dir):
    """Register-wise max: daily sketches built over three row-subsets,
    merged, give the IDENTICAL estimates as sketches over all rows —
    the monoid property (exact equality, not tolerance)."""
    ev = load_table(spark, sf_dir, "events")
    parts = [
        daily_sketches(ev.filter(F.col("event_id") % 3 == i))
        for i in range(3)
    ]
    merged_est = {
        r["day"]: r["n_users"]
        for r in estimate_daily(merge_sketch_tables(*parts)).collect()
    }
    oneshot_est = {
        r["day"]: r["n_users"]
        for r in estimate_daily(daily_sketches(ev)).collect()
    }
    assert merged_est == oneshot_est


def test_streamed_index_equals_batch_with_replay(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    idx = str(tmp_path / "hllidx")
    run = hll_ingest_batch(spark, idx, compact_every=2)
    b0 = ev.filter(F.col("event_id") % 3 == 0)
    run(b0, 0)
    run(ev.filter(F.col("event_id") % 3 == 1), 1)
    run(ev.filter(F.col("event_id") % 3 == 2), 2)
    want = {
        r["day"]: r["n_users"]
        for r in estimate_daily(daily_sketches(ev)).collect()
    }
    got = {
        r["day"]: r["n_users"]
        for r in estimate_daily(hll_report(spark, idx)).collect()
    }
    assert got == want
    run(b0, 0)  # replay a compacted-away batch
    got2 = {
        r["day"]: r["n_users"]
        for r in estimate_daily(hll_report(spark, idx)).collect()
    }
    assert got2 == want
