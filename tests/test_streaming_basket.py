"""Streaming market-basket pins: baskets split across batches,
batch≡streaming equality, replay idempotence, compaction under ingest
(streaming/basket.py — r10 verdict #8)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _batch_affinity(spark, rows):
    """The batch definition (plans/tpch.py:brand_affinity) applied to an
    (o, b) pair list in one shot — the oracle twin."""
    ob = spark.createDataFrame(rows, ["o", "b"]).distinct().persist()
    n_orders = ob.select("o").distinct().count()
    freq = ob.groupBy("b").agg(F.count(F.lit(1)).alias("nb"))
    a = ob.select("o", F.col("b").alias("brand_a"))
    c = ob.select("o", F.col("b").alias("brand_b"))
    pairs = (
        a.join(c, "o")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    out = pairs.join(
        freq.withColumnRenamed("b", "brand_a").withColumnRenamed("nb", "na"),
        "brand_a",
    ).join(
        freq.withColumnRenamed("b", "brand_b").withColumnRenamed("nb", "nbb"),
        "brand_b",
    ).select(
        "brand_a",
        "brand_b",
        "n_both",
        F.floor(
            F.col("n_both").cast("double")
            * F.lit(float(n_orders))
            / (F.col("na").cast("double") * F.col("nbb").cast("double"))
            * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("long").alias("lift_ppm"),
    )
    res = {tuple(r) for r in out.collect()}
    ob.unpersist()
    return res


# 6 orders over 4 brands; order 100's basket spans ALL THREE batches and
# order 200's spans two — the cross-batch carry is what's being pinned.
ROWS = [
    (100, "A"), (100, "B"),
    (200, "A"),
    (300, "C"),
]
ROWS2 = [
    (100, "C"),                 # order 100 grows cross-batch
    (200, "B"), (200, "A"),     # (200, A) is a cross-batch DUPLICATE
    (400, "A"), (400, "D"),
]
ROWS3 = [
    (100, "D"), (100, "A"),     # another dup + a fourth brand for 100
    (500, "B"),
    (600, "C"), (600, "D"),
]
ALL = ROWS + ROWS2 + ROWS3


def _dirs(tmp_path):
    return tuple(str(tmp_path / d) for d in ("counters", "carry"))


def _drive(spark, dirs, batches, replay=(), compact_every=None):
    from sparkstreaming_gmall_scala_spark.streaming.basket import (
        basket_ingest_batch,
    )

    counters, carry = dirs
    body = basket_ingest_batch(
        spark, counters, carry, compact_every=compact_every
    )
    for bid, rows in enumerate(batches):
        body(spark.createDataFrame(rows, ["o", "b"]), bid)
        if bid in replay:  # retry: the failure mode foreachBatch promises
            body(spark.createDataFrame(rows, ["o", "b"]), bid)
    return body


def _live(spark, dirs):
    from sparkstreaming_gmall_scala_spark.streaming.basket import (
        brand_affinity_live,
    )

    counters, _ = dirs
    return {tuple(r) for r in brand_affinity_live(spark, counters).collect()}


def test_streamed_affinity_equals_batch_across_splits(spark, tmp_path):
    want = _batch_affinity(spark, ALL)
    dirs = _dirs(tmp_path)
    _drive(spark, dirs, [ROWS, ROWS2, ROWS3])
    assert _live(spark, dirs) == want


def test_replayed_batches_are_idempotent(spark, tmp_path):
    want = _batch_affinity(spark, ALL)
    dirs = _dirs(tmp_path)
    _drive(spark, dirs, [ROWS, ROWS2, ROWS3], replay={0, 1, 2})
    assert _live(spark, dirs) == want


def test_random_split_matches_batch_with_compaction(spark, tmp_path):
    """Any partition of the pair stream (including within-batch duplicate
    rows) folds to the batch answer, with counter compaction running
    between batches."""
    rng = random.Random(11)
    rows = [
        (o, b)
        for o in range(1, 15)
        for b in "ABCDE"
        if rng.random() < 0.5
    ]
    dup_rows = rows + rows[::3]  # duplicates must not double-count
    splits = [[], [], [], []]
    for r in dup_rows:
        splits[rng.randrange(4)].append(r)
    splits = [s if s else [(999, "A")] for s in splits]  # no empty batches
    flat = [r for s in splits for r in s]
    want = _batch_affinity(spark, flat)
    dirs = _dirs(tmp_path)
    _drive(spark, dirs, splits, compact_every=2)
    assert _live(spark, dirs) == want


def _batch_rules(spark, rows):
    """The batch definition (plans/tpch.py:assoc_rules) applied to an
    (o, b) pair list in one shot — the oracle twin for the directional
    rules fold."""
    ob = spark.createDataFrame(rows, ["o", "b"]).distinct().persist()
    n_orders = ob.select("o").distinct().count()
    freq = ob.groupBy("b").agg(F.count(F.lit(1)).alias("nb"))
    a = ob.select("o", F.col("b").alias("antecedent"))
    c = ob.select("o", F.col("b").alias("consequent"))
    pairs = (
        a.join(c, "o")
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    lift = F.floor(
        F.col("n_both").cast("double")
        * F.lit(float(n_orders))
        / (F.col("na").cast("double") * F.col("nc").cast("double"))
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    conf = F.expr("n_both * 1000000L div na")
    out = pairs.join(
        freq.withColumnRenamed("b", "antecedent").withColumnRenamed("nb", "na"),
        "antecedent",
    ).join(
        freq.withColumnRenamed("b", "consequent").withColumnRenamed("nb", "nc"),
        "consequent",
    ).select(
        "antecedent",
        "consequent",
        "n_both",
        conf.alias("confidence_ppm"),
        F.expr(f"n_both * 1000000L div {n_orders}").alias("support_ppm"),
        lift.alias("lift_ppm"),
        ((conf >= 250000) & (lift > 1000000)).alias("actionable"),
    )
    res = {tuple(r) for r in out.collect()}
    ob.unpersist()
    return res


def _rules_live(spark, dirs):
    from sparkstreaming_gmall_scala_spark.streaming.basket import (
        assoc_rules_live,
    )

    counters, _ = dirs
    return {
        tuple(r)
        for r in assoc_rules_live(spark, counters).collect()
    }


def test_streamed_rules_equal_batch_across_splits_and_replay(spark, tmp_path):
    """r12 (r11 verdict #6): the directional rules fold over the SAME
    counter indexes equals the one-shot batch assoc_rules — across the
    basket-spanning split AND with every batch replayed once."""
    want = _batch_rules(spark, ALL)
    dirs = _dirs(tmp_path)
    _drive(spark, dirs, [ROWS, ROWS2, ROWS3], replay={0, 1, 2})
    assert _rules_live(spark, dirs) == want
    # both live folds read the same indexes — no second ingest needed
    assert _live(spark, dirs) == _batch_affinity(spark, ALL)


def test_streamed_rules_random_split(spark, tmp_path):
    rng = random.Random(23)
    rows = [
        (o, b)
        for o in range(1, 12)
        for b in "ABCD"
        if rng.random() < 0.55
    ]
    splits = [[], [], []]
    for r in rows + rows[::4]:
        splits[rng.randrange(3)].append(r)
    splits = [s if s else [(999, "A")] for s in splits]
    flat = [r for s in splits for r in s]
    dirs = _dirs(tmp_path)
    _drive(spark, dirs, splits, compact_every=2)
    assert _rules_live(spark, dirs) == _batch_rules(spark, flat)
