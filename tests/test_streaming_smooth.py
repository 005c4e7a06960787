"""Nation-daily mart pins: additive exactness over any batch split,
replay idempotence, compaction, and equality of the live smoothing twins
with their batch queries (streaming/nationdaily.py +
operators/smoothing.py)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey long, n_name string, day date, v long"
    ).select("o_orderkey", "n_name", F.col("day"), "v")


def _rows(seed, n):
    import datetime as dt

    rng = random.Random(seed)
    base = dt.date(2024, 1, 1)
    return [
        (
            i,
            f"NATION_{rng.randrange(4)}",
            base + dt.timedelta(days=rng.randrange(20)),
            rng.randrange(100, 100000),
        )
        for i in range(n)
    ]


def _drive(spark, tmp_path, batches, replay=(), compact_every=None):
    from sparkstreaming_gmall_scala_spark.streaming.nationdaily import (
        nation_daily_ingest_batch,
    )

    d = str(tmp_path / "natday")
    body = nation_daily_ingest_batch(spark, d, compact_every=compact_every)
    for bid, rows in enumerate(batches):
        body(_frame(spark, rows), bid)
        if bid in replay:
            body(_frame(spark, rows), bid)
    return d


def _naive_daily(rows):
    from collections import defaultdict

    out: dict[tuple, int] = defaultdict(int)
    for _, n, d, v in rows:
        out[(n, str(d))] += v
    return dict(out)


def test_fold_equals_naive_over_random_splits_replay_compaction(
    spark, tmp_path
):
    from sparkstreaming_gmall_scala_spark.streaming.nationdaily import (
        fold_nation_daily,
    )

    rows = _rows(5, 400)
    rng = random.Random(55)
    batches = [[], [], []]
    for r in rows:
        batches[rng.randrange(3)].append(r)
    d = _drive(
        spark, tmp_path, batches, replay={1}, compact_every=2
    )
    got = {
        (r["n_name"], str(r["day"])): r["y"]
        for r in fold_nation_daily(spark, d).collect()
    }
    assert got == _naive_daily(rows)


def test_live_twins_equal_batch_queries(spark, sf_dir):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    reg = load_all()
    for batch_name, live_name in [
        ("revenue_ewma", "revenue_ewma_live"),
        ("holt_forecast", "holt_forecast_live"),
    ]:
        batch = {
            tuple(r): None
            for r in reg[batch_name].builder(spark, sf_dir).collect()
        }
        live = {
            tuple(r): None
            for r in reg[live_name].builder(spark, sf_dir).collect()
        }
        assert live == batch, (batch_name, live_name)


def test_smoothing_folds_are_deterministic_over_input_order(spark):
    """The evaluators sort (n_name, day) themselves — a shuffled daily
    frame folds to the identical result (the mart's fold output order is
    partition-dependent, so this is load-bearing for batch ≡ live)."""
    import datetime as dt

    from sparkstreaming_gmall_scala_spark.operators.smoothing import (
        ewma_fold,
        holt_fold,
    )

    rows = [
        ("B", dt.date(2024, 1, d), 1000 * d) for d in range(1, 15)
    ] + [("A", dt.date(2024, 1, d), 50000 - 900 * d) for d in range(1, 15)]
    shuffled = rows[::-1]
    f1 = spark.createDataFrame(rows, "n_name string, day date, y long")
    f2 = spark.createDataFrame(shuffled, "n_name string, day date, y long")
    assert sorted(map(tuple, ewma_fold(f1).collect())) == sorted(
        map(tuple, ewma_fold(f2).collect())
    )
    assert sorted(map(tuple, holt_fold(f1).collect())) == sorted(
        map(tuple, holt_fold(f2).collect())
    )
