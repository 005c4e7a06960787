"""Streaming moment-mart pins: additive exactness over any batch split,
replay idempotence, compaction, and bit-equality of the streamed scoring
pass with the batch seasonal_outliers query (streaming/moments.py)."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

KEYS = ["event_type", "hr"]


def _frame(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    return df.withColumn("hr", F.hour("ts").cast("int"))


def _rows(seed, n):
    rng = random.Random(seed)
    base = dt.datetime(2024, 3, 1)
    out = []
    for i in range(n):
        out.append(
            (
                i,
                base + dt.timedelta(hours=rng.randrange(3), seconds=i),
                rng.choice(["view", "click", "purchase"]),
                round(rng.uniform(1, 100), 2)
                # one planted extreme value per ~40 rows so the screen fires
                if i % 40 else 100000.0,
            )
        )
    return out


def _drive(spark, tmp_path, batches, replay=(), compact_every=None):
    from sparkstreaming_gmall_scala_spark.streaming.moments import (
        moment_ingest_batch,
    )

    d = str(tmp_path / "moments")
    body = moment_ingest_batch(
        spark, d, KEYS, "value", compact_every=compact_every
    )
    for bid, rows in enumerate(batches):
        body(_frame(spark, rows), bid)
        if bid in replay:
            body(_frame(spark, rows), bid)
    return d


def test_folded_moments_equal_batch_exactly(spark, tmp_path):
    """Any split + replays + compaction: the folded (n, s1, s2) equal the
    one-shot batch moments EXACTLY (decimal sums — no tolerance)."""
    from sparkstreaming_gmall_scala_spark.streaming.moments import (
        _stratum_partial,
        fold_moments,
    )

    rows = _rows(7, 120)
    rng = random.Random(3)
    splits = [[], [], []]
    for r in rows:
        splits[rng.randrange(3)].append(r)
    d = _drive(spark, tmp_path, splits, replay={1}, compact_every=2)
    got = {
        (r["event_type"], r["hr"]): (r["n"], r["s1"], r["s2"])
        for r in fold_moments(spark, d, KEYS).collect()
    }
    want = {
        (r["event_type"], r["hr"]): (r["n"], r["s1"], r["s2"])
        for r in _stratum_partial(_frame(spark, rows), KEYS, "value").collect()
    }
    assert got == want


def test_streamed_scoring_equals_batch_screen(spark, tmp_path):
    """Scoring the full frame against the folded streamed moments
    reproduces the batch screen (same rows, same 6-dp z-scores)."""
    from sparkstreaming_gmall_scala_spark.streaming.moments import (
        _stratum_partial,
        fold_moments,
        score_against_moments,
    )

    rows = _rows(11, 150)
    splits = [rows[:50], rows[50:90], rows[90:]]
    d = _drive(spark, tmp_path, splits)
    ev = _frame(spark, rows)
    streamed = {
        (r["event_id"], r["zscore"])
        for r in score_against_moments(
            ev, fold_moments(spark, d, KEYS), KEYS, "value"
        ).collect()
    }
    batch = {
        (r["event_id"], r["zscore"])
        for r in score_against_moments(
            ev, _stratum_partial(ev, KEYS, "value"), KEYS, "value"
        ).collect()
    }
    assert streamed == batch
    assert streamed  # the planted extremes actually fire the screen


def test_prequential_scoring_uses_only_prior_batches(spark, tmp_path):
    """The live shape: batch N scores against moments(0..N−1) — an event
    extreme vs history must flag even if later data normalizes it."""
    from sparkstreaming_gmall_scala_spark.streaming.moments import (
        fold_moments,
        moment_ingest_batch,
        score_against_moments,
    )

    base = dt.datetime(2024, 3, 1, 5)
    b0 = [(i, base, "view", 10.0 + (i % 3)) for i in range(30)]
    b1 = [(100, base, "view", 500.0), (101, base, "view", 11.0)]
    d = str(tmp_path / "m2")
    body = moment_ingest_batch(spark, d, KEYS, "value")
    body(_frame(spark, b0), 0)
    flagged = score_against_moments(
        _frame(spark, b1), fold_moments(spark, d, KEYS), KEYS, "value"
    ).collect()
    assert {r["event_id"] for r in flagged} == {100}
