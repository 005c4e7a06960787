"""Streaming SPC mart pins: days split across batches, batch≡streaming
equality, replay idempotence, compaction under ingest (streaming/spc.py —
r12, the moment-mart additive discipline applied to the control chart)."""

from __future__ import annotations

import datetime
import random

from pyspark.sql import functions as F


def _batch_spc(spark, rows):
    """The batch definition (operators/spc.py over the one-shot daily
    fold) applied to a (d, cents) row list — the oracle twin."""
    from sparkstreaming_gmall_scala_spark.operators.spc import spc_eval

    df = spark.createDataFrame(rows, "d date, cents long")
    daily = df.groupBy("d").agg(F.sum("cents").alias("y"))
    return {tuple(r) for r in spc_eval(spark, daily).collect()}


def _drive(spark, daily_dir, batches, replay=(), compact_every=None):
    from sparkstreaming_gmall_scala_spark.streaming.spc import (
        spc_ingest_batch,
    )

    body = spc_ingest_batch(spark, daily_dir, compact_every=compact_every)
    for bid, rows in enumerate(batches):
        body(spark.createDataFrame(rows, "d date, cents long"), bid)
        if bid in replay:  # retry: the failure mode foreachBatch promises
            body(spark.createDataFrame(rows, "d date, cents long"), bid)
    return body


def _live(spark, daily_dir):
    from sparkstreaming_gmall_scala_spark.streaming.spc import (
        spc_violations_live,
    )

    return {tuple(r) for r in spc_violations_live(spark, daily_dir).collect()}


def _mk_rows(seed, n_days=40, events_per_day=3):
    """A series engineered to trip BOTH rules: a 10-day low-side run and
    one extreme spike, with every day's cents split over several rows so
    days span batches."""
    rng = random.Random(seed)
    d0 = datetime.date(2024, 1, 1)
    rows = []
    for i in range(n_days):
        d = d0 + datetime.timedelta(days=i)
        if i == 25:
            base = 100000  # the 3-sigma spike
        elif 5 <= i < 15:
            base = 400  # the sustained low-side run
        else:
            base = rng.randrange(900, 1100)
        cuts = sorted(
            rng.randrange(1, base) for _ in range(events_per_day - 1)
        )
        parts = [a - b for a, b in zip(cuts + [base], [0] + cuts)]
        rows += [(d, c) for c in parts if c]
    return rows


def test_streamed_spc_equals_batch_across_splits(spark, tmp_path):
    rows = _mk_rows(7)
    want = _batch_spc(spark, rows)
    assert any(r[4] for r in want)  # rule1 fires somewhere
    assert any(r[5] for r in want)  # rule2 fires somewhere
    rng = random.Random(3)
    splits = [[], [], []]
    for r in rows:
        splits[rng.randrange(3)].append(r)
    d = str(tmp_path / "daily")
    _drive(spark, d, splits)
    assert _live(spark, d) == want


def test_streamed_spc_replay_idempotent_with_compaction(spark, tmp_path):
    rows = _mk_rows(11)
    want = _batch_spc(spark, rows)
    rng = random.Random(5)
    splits = [[], [], [], []]
    for r in rows:
        splits[rng.randrange(4)].append(r)
    splits = [s if s else [(datetime.date(2024, 1, 1), 1)] for s in splits]
    flat = [r for s in splits for r in s]
    want = _batch_spc(spark, flat)
    d = str(tmp_path / "daily")
    _drive(spark, d, splits, replay={0, 1, 2, 3}, compact_every=2)
    assert _live(spark, d) == want


def test_streamed_dow_factors_equal_batch(spark, tmp_path):
    """The second consumer of the same daily index: dow_factors over the
    streamed fold equals dow_factors over the one-shot daily frame —
    across a random split WITH replays."""
    from sparkstreaming_gmall_scala_spark.operators.spc import dow_factors
    from sparkstreaming_gmall_scala_spark.streaming.spc import fold_daily

    rows = _mk_rows(17)
    df = spark.createDataFrame(rows, "d date, cents long")
    want = {
        tuple(r)
        for r in dow_factors(
            df.groupBy("d").agg(F.sum("cents").alias("y"))
        ).collect()
    }
    rng = random.Random(9)
    splits = [[], [], []]
    for r in rows:
        splits[rng.randrange(3)].append(r)
    d = str(tmp_path / "daily")
    _drive(spark, d, splits, replay={1})
    got = {
        tuple(r) for r in dow_factors(fold_daily(spark, d)).collect()
    }
    assert got == want
