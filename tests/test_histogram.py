"""Histogram family (operators/histogram.py, streaming/histogram.py):
conservation, quantile error bound vs exact percentiles, merge monoid,
streaming equality with replay + compaction, degenerate inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.histogram import (
    fixed_histogram,
    histogram_merge,
    histogram_quantile,
)
from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.histogram import (
    histogram_ingest_batch,
    histogram_report,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_counts_conserve_and_edges_tile(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("value")
    h = fixed_histogram(ev, "value", n_bins=32).cache()
    try:
        assert h.agg(F.sum("cnt")).collect()[0][0] == ev.count()
        assert h.count() <= 32
        rows = sorted(
            (r["bin"], r["lo_edge"], r["hi_edge"]) for r in h.collect()
        )
        # edges are consistent: hi_edge of bin b == lo_edge of bin b+1
        # whenever both bins are present (shared expression tree)
        by_bin = {b: (lo, hi) for b, lo, hi in rows}
        for b, (lo, hi) in by_bin.items():
            if b + 1 in by_bin:
                assert hi == by_bin[b + 1][0], (b, hi, by_bin[b + 1][0])
            assert hi > lo
    finally:
        h.unpersist()


def test_quantile_estimates_within_one_bin_width(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("value")
    nb = 64
    h = fixed_histogram(ev, "value", n_bins=nb)
    qs = [0.1, 0.5, 0.9, 0.99]
    est = {r["q"]: r["estimate"] for r in histogram_quantile(h, qs).collect()}
    bounds = ev.agg(F.min("value"), F.max("value")).collect()[0]
    width = (bounds[1] - bounds[0]) / nb
    exact = ev.agg(
        *[F.expr(f"percentile(value, {q})").alias(str(q)) for q in qs]
    ).collect()[0]
    for q in qs:
        assert abs(est[q] - exact[str(q)]) <= width + 1e-9, (
            q, est[q], exact[str(q)], width,
        )


def test_merge_equals_histogram_of_union(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    b = ev.agg(
        F.min("value").cast("double"), F.max("value").cast("double")
    ).collect()[0]
    lo, hi = b[0], b[1]
    parts = [
        fixed_histogram(
            ev.filter(F.col("event_id") % 3 == i).select("value"),
            "value", 32, lo=lo, hi=hi,
        )
        for i in range(3)
    ]
    want = fixed_histogram(ev.select("value"), "value", 32, lo=lo, hi=hi)
    assert _rows(histogram_merge(*parts)) == _rows(want)


def test_streamed_histogram_equals_batch_with_replay(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min("value").cast("double"), F.max("value").cast("double")
    ).collect()[0]
    lo, hi = b[0], b[1]
    idx = str(tmp_path / "hidx")
    run = histogram_ingest_batch(spark, idx, lo=lo, hi=hi, compact_every=2)
    b0 = ev.filter(F.col("event_id") % 3 == 0)
    run(b0, 0)
    run(ev.filter(F.col("event_id") % 3 == 1), 1)
    run(ev.filter(F.col("event_id") % 3 == 2), 2)
    want = _rows(
        fixed_histogram(ev.select("value"), "value", 32, lo=lo, hi=hi)
    )
    assert _rows(histogram_report(spark, idx)) == want
    run(b0, 0)  # replay a compacted-away batch
    assert _rows(histogram_report(spark, idx)) == want


def test_degenerate_single_value(spark):
    df = spark.createDataFrame([(7.5,)] * 10, "value double")
    h = fixed_histogram(df, "value", n_bins=8).collect()
    assert len(h) == 1
    assert h[0]["bin"] == 0 and h[0]["cnt"] == 10
    # pinned span guard: edges stay finite and ordered
    assert h[0]["hi_edge"] > h[0]["lo_edge"]


def test_null_values_are_excluded(spark):
    """Regression: null values must not be counted into bin 0 (Spark's
    null-skipping greatest) nor a NULL bin (DuckDB's null-propagating
    greatest) — they are excluded, matching the bounds' null-skipping."""
    df = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (None,), (3.0,)], "value double"
    )
    h = fixed_histogram(df, "value", n_bins=4)
    assert h.agg(F.sum("cnt")).collect()[0][0] == 3


def test_streamed_quantile_report_equals_batch_twin(spark, sf_dir, tmp_path):
    """Round-9 streaming-quantiles pin: p50/p95/p99 read off the
    streamed histogram index (streaming/quantile.py) EQUAL the
    value_quantiles_stream catalog builder exactly (deterministic double
    walk over exact integer counts — estimate equality, not tolerance),
    and each estimate is within one bin width of the exact percentile
    computed under the same clamped-to-bounds values."""
    import math

    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
    from sparkstreaming_gmall_scala_spark.streaming.quantile import (
        quantile_report,
    )

    ev = load_table(spark, sf_dir, "events")
    idx = str(tmp_path / "qidx")
    run = histogram_ingest_batch(spark, idx, lo=0.0, hi=500.0)
    run(ev.filter(F.col("event_id") % 2 == 0), 0)
    run(ev.filter(F.col("event_id") % 2 == 1), 1)
    streamed = {
        r["q"]: r["estimate"]
        for r in quantile_report(spark, idx, (0.5, 0.95, 0.99)).collect()
    }
    batch = {
        r["q"]: r["estimate"]
        for r in load_all()["value_quantiles_stream"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert streamed == batch
    width = 500.0 / 32
    clamped = ev.select(
        F.least(F.lit(500.0), F.greatest(F.lit(0.0), F.col("value"))).alias(
            "v"
        )
    )
    exact = clamped.agg(
        *[
            F.expr(f"percentile(v, {q})").alias(str(q))
            for q in (0.5, 0.95, 0.99)
        ]
    ).collect()[0]
    for q in (0.5, 0.95, 0.99):
        assert math.isfinite(streamed[q])
        assert abs(streamed[q] - exact[str(q)]) <= width + 1e-9, (
            q, streamed[q], exact[str(q)],
        )


def test_keyed_histogram_partitions_the_global_one(spark, sf_dir):
    """Keyed histograms under shared bounds are an exact partition of
    the unkeyed histogram: summing the keyed counts over keys
    reproduces every global (bin, cnt) cell, and each key's rows stay
    within n_bins."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    keyed = fixed_histogram(
        ev, "value", n_bins=16, lo=0.0, hi=500.0, keys=("event_type",)
    ).cache()
    try:
        folded = keyed.groupBy("bin", "lo_edge", "hi_edge").agg(
            F.sum("cnt").alias("cnt")
        )
        want = fixed_histogram(
            ev.select("value"), "value", n_bins=16, lo=0.0, hi=500.0
        )
        assert _rows(folded) == _rows(want)
        per_key = keyed.groupBy("event_type").count().collect()
        assert all(r["count"] <= 16 for r in per_key)
    finally:
        keyed.unpersist()


def test_keyed_quantiles_match_per_key_exact_within_bin_width(
    spark, sf_dir, tmp_path
):
    """Per-key quantile walk: every (event_type, q) estimate is within
    one bin width of the exact per-type percentile (values clamped to
    the frozen bounds), and the KEYED streamed index report equals the
    keyed batch twin exactly."""
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
    from sparkstreaming_gmall_scala_spark.streaming.quantile import (
        quantile_report,
    )

    ev = load_table(spark, sf_dir, "events")
    idx = str(tmp_path / "kidx")
    run = histogram_ingest_batch(
        spark, idx, lo=0.0, hi=500.0, keys=("event_type",)
    )
    run(ev.filter(F.col("event_id") % 2 == 0), 0)
    run(ev.filter(F.col("event_id") % 2 == 1), 1)
    streamed = {
        (r["event_type"], r["q"]): r["estimate"]
        for r in quantile_report(
            spark, idx, (0.5, 0.95, 0.99), keys=("event_type",)
        ).collect()
    }
    batch = {
        (r["event_type"], r["q"]): r["estimate"]
        for r in load_all()["type_value_quantiles"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert streamed == batch
    # The sketch's covering-bin walk estimates the LOWER (type-1)
    # quantile: the value at rank ceil(q*n). Both that order statistic
    # and the estimate lie inside the covering bin, so |est - true| <=
    # one bin width holds for ANY distribution — Spark's interpolated
    # percentile() can sit a rank earlier, which in a sparse per-key
    # tail (empty bins between occupied ones) is an unbounded value gap.
    width = 500.0 / 32
    from pyspark.sql import Window as W

    clamped = ev.select(
        "event_type",
        F.least(F.lit(500.0), F.greatest(F.lit(0.0), F.col("value"))).alias(
            "v"
        ),
    )
    ranked = clamped.withColumn(
        "rn", F.row_number().over(W.partitionBy("event_type").orderBy("v"))
    ).withColumn("n", F.count(F.lit(1)).over(W.partitionBy("event_type")))
    exact = {}
    for q in (0.5, 0.95, 0.99):
        rows = (
            ranked.filter(F.col("rn") == F.ceil(F.lit(q) * F.col("n")))
            .select("event_type", "v")
            .collect()
        )
        for r in rows:
            exact[(r["event_type"], q)] = r["v"]
    assert set(streamed) == set(exact)
    for k, est in streamed.items():
        assert abs(est - exact[k]) <= width + 1e-9, (k, est, exact[k])
