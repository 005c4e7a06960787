"""Data-quality gate (operators/quality.py, streaming/quality.py):
quarantine routing must partition the input exactly, the streamed audit
partials must sum to the one-shot batch audit over the union, and replay
must not double-count (the src_batch identity trick)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.quality import (
    expectation_counts,
    orders_rules,
    quarantine_split,
)
from sparkstreaming_gmall_scala_spark.sinks.batch import IdempotentBatchWriter
from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.quality import (
    quality_gate_batch,
    quality_report,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _dirty_orders(spark, sf_dir):
    """Orders with seeded violations: negative price, bogus status, an
    out-of-range date, a malformed priority — ids offset past the real
    keyspace so the seeds are identifiable."""
    o = load_table(spark, sf_dir, "orders")
    bad = o.orderBy("o_orderkey").limit(4).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    seeds = (
        bad.withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 4 == 0, F.lit(-5.0)).otherwise(
                F.col("o_totalprice")
            ),
        )
        .withColumn(
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 4 == 1, F.lit("X")).otherwise(
                F.col("o_orderstatus")
            ),
        )
        .withColumn(
            "o_orderdate",
            F.when(
                F.col("o_orderkey") % 4 == 2,
                F.lit("1970-01-01").cast("timestamp"),
            ).otherwise(F.col("o_orderdate")),
        )
        .withColumn(
            "o_orderpriority",
            F.when(F.col("o_orderkey") % 4 == 3, F.lit("9?BROKEN")).otherwise(
                F.col("o_orderpriority")
            ),
        )
    )
    return o.unionByName(seeds)


def test_quarantine_split_partitions_exactly(spark, sf_dir):
    d = _dirty_orders(spark, sf_dir)
    clean, bad = quarantine_split(d, orders_rules())
    n, nc, nb = d.count(), clean.count(), bad.count()
    assert nc + nb == n
    assert nb >= 4  # every seeded violation lands in quarantine
    # quarantined rows each name at least one rule; clean rows violate none
    assert bad.filter(F.col("failed_rules") == "").count() == 0
    rules = orders_rules()
    any_viol = rules[0][1]
    for _, cond in rules[1:]:
        any_viol = any_viol | cond
    assert clean.filter(any_viol).count() == 0
    assert bad.filter(~any_viol).count() == 0


def test_quarantine_failed_rules_names_every_broken_rule(spark, sf_dir):
    d = _dirty_orders(spark, sf_dir)
    _, bad = quarantine_split(d, orders_rules())
    seeded = {
        r["o_orderkey"] % 4: r["failed_rules"]
        for r in bad.filter(F.col("o_orderkey") >= 10_000_000).collect()
    }
    assert "totalprice_nonneg" in seeded[0]
    assert "status_in_domain" in seeded[1]
    assert "orderdate_in_range" in seeded[2]
    assert "priority_format" in seeded[3]


def test_expectation_counts_match_split(spark, sf_dir):
    """The audit's violation counts and the router must agree rule by
    rule: n_violations == quarantined rows naming that rule."""
    d = _dirty_orders(spark, sf_dir)
    audit = {
        r["rule"]: r["n_violations"]
        for r in expectation_counts(d, orders_rules()).collect()
    }
    _, bad = quarantine_split(d, orders_rules())
    tagged = bad.select(
        F.explode(F.split("failed_rules", ",")).alias("rule")
    ).groupBy("rule").count()
    routed = {r["rule"]: r["count"] for r in tagged.collect()}
    for name, _ in orders_rules():
        assert audit[name] == routed.get(name, 0), name


def test_streamed_audit_equals_batch_and_survives_replay(
    spark, sf_dir, tmp_path
):
    d = _dirty_orders(spark, sf_dir)
    idx = str(tmp_path / "qidx")
    clean_sink = IdempotentBatchWriter(str(tmp_path / "clean"))
    quar_sink = IdempotentBatchWriter(str(tmp_path / "quar"))
    run = quality_gate_batch(
        spark, idx, clean_sink, quar_sink, orders_rules(), id_col="o_orderkey"
    )
    b0 = d.filter(F.col("o_orderkey") % 2 == 0)
    b1 = d.filter(F.col("o_orderkey") % 2 == 1)
    run(b0, 0)
    run(b1, 1)
    run(b1, 1)  # crash-replay of the in-flight batch

    got = _rows(quality_report(spark, idx))
    want = _rows(expectation_counts(d, orders_rules()))
    assert got == want

    # the sinks partition the deduped input exactly, replay included
    n_clean = clean_sink.read(spark).count()
    n_quar = quar_sink.read(spark).count()
    assert n_clean + n_quar == d.count()
    assert quar_sink.read(spark).filter(
        F.col("o_orderkey") >= 10_000_000
    ).count() == 4


def test_streamed_audit_dedups_by_id_within_batch(spark, sf_dir, tmp_path):
    """Uniqueness is ENFORCED: a batch carrying duplicate ids contributes
    each id once to sinks and audit alike."""
    d = _dirty_orders(spark, sf_dir)
    idx = str(tmp_path / "qidx2")
    clean_sink = IdempotentBatchWriter(str(tmp_path / "clean2"))
    quar_sink = IdempotentBatchWriter(str(tmp_path / "quar2"))
    run = quality_gate_batch(
        spark, idx, clean_sink, quar_sink, orders_rules(), id_col="o_orderkey"
    )
    run(d.unionByName(d), 0)
    got = _rows(quality_report(spark, idx))
    want = _rows(expectation_counts(d, orders_rules()))
    assert got == want
    assert (
        clean_sink.read(spark).count() + quar_sink.read(spark).count()
        == d.count()
    )


def test_null_rows_are_not_violations_and_audit_matches_router(
    spark, sf_dir
):
    """Three-valued logic pin: a NULL in a rule's column makes the
    predicate NULL, which counts as NOT violated — audit and router must
    agree on that (the documented operators/quality.py contract)."""
    o = load_table(spark, sf_dir, "orders")
    nulled = o.limit(3).select(
        (F.col("o_orderkey") + 20_000_000).alias("o_orderkey"),
        "o_custkey",
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
        F.lit(None).cast("string").alias("o_orderpriority"),
    )
    d = o.unionByName(nulled)
    rules = orders_rules()
    clean, bad = quarantine_split(d, rules)
    # the all-NULL seeds route clean (no rule fires on NULL)
    assert clean.filter(F.col("o_orderkey") >= 20_000_000).count() == 3
    assert bad.filter(F.col("o_orderkey") >= 20_000_000).count() == 0
    audit = {
        r["rule"]: r["n_violations"]
        for r in expectation_counts(d, rules).collect()
    }
    for name, _ in rules:
        assert audit[name] == 0, name


def test_streaming_zscore_rule_matches_batch_outliers(
    spark, sf_dir, tmp_path
):
    """Frozen-moments anomaly detection composes with the quality gate:
    moments bootstrap once over the corpus (exact decimal sums), the
    z-score Rule scores each arriving batch against them, and the union
    of quarantined rows equals the batch value_outliers set exactly —
    same IEEE tree on both paths."""
    from sparkstreaming_gmall_scala_spark.operators.quality import (
        collect_moments,
        zscore_rule,
    )
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    moments = collect_moments(ev, "event_type", "value")
    assert moments, "expected non-degenerate strata"
    rule = zscore_rule(moments, "event_type", "value")

    idx = str(tmp_path / "zidx")
    clean_sink = IdempotentBatchWriter(str(tmp_path / "zclean"))
    quar_sink = IdempotentBatchWriter(str(tmp_path / "zquar"))
    run = quality_gate_batch(
        spark, idx, clean_sink, quar_sink, [rule], id_col="event_id"
    )
    run(ev.filter(F.col("event_id") % 2 == 0), 0)
    run(ev.filter(F.col("event_id") % 2 == 1), 1)

    streamed = sorted(
        r["event_id"] for r in quar_sink.read(spark).collect()
    )
    batch = sorted(
        r["event_id"]
        for r in load_all()["value_outliers"]
        .builder(spark, sf_dir)
        .collect()
    )
    assert streamed == batch, (len(streamed), len(batch))
