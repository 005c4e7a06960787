"""Streaming KMV mart pins: the merge-monoid claim (fold over ANY batch
split equals the one-shot batch estimate exactly), replay idempotence,
compaction, the sub-k degenerate path, and the catalog twin's equality
with kmv_distinct_daily's estimate column (streaming/kmv.py)."""

from __future__ import annotations

import random

import pytest

from sparkstreaming_gmall_scala_spark.streaming.kmv import (
    KMV_A,
    KMV_K,
    KMV_M,
)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id")


def _rows(seed, n, n_users, days=3):
    rng = random.Random(seed)
    return [
        (
            i,
            f"2024-03-{rng.randrange(1, days + 1):02d} 10:00:00",
            rng.randrange(n_users),
        )
        for i in range(n)
    ]


def _naive(rows):
    from collections import defaultdict

    day_users = defaultdict(set)
    for _, ts, u in rows:
        day_users[ts[:10]].add(u)
    out = {}
    for dt, users in day_users.items():
        hashes = sorted((u * KMV_A) % KMV_M for u in users)
        n = len(hashes)
        out[dt] = (
            n
            if n < KMV_K
            else (KMV_K - 1) * KMV_M // hashes[KMV_K - 1]
        )
    return out


def _drive(spark, tmp_path, batches, replay=(), compact_every=None):
    from sparkstreaming_gmall_scala_spark.streaming.kmv import (
        kmv_ingest_batch,
    )

    d = str(tmp_path / "kmv")
    body = kmv_ingest_batch(spark, d, compact_every=compact_every)
    for bid, rows in enumerate(batches):
        body(_frame(spark, rows), bid)
        if bid in replay:
            body(_frame(spark, rows), bid)
    return d


def _fold(spark, d):
    from sparkstreaming_gmall_scala_spark.streaming.kmv import fold_kmv

    return {
        r["dt"]: r["kmv_estimate"] for r in fold_kmv(spark, d).collect()
    }


@pytest.mark.parametrize("seed", [1, 7])
def test_fold_equals_naive_over_random_splits(spark, tmp_path, seed):
    rows = _rows(seed, 600, 300)  # ~200 distinct users/day: > k path
    rng = random.Random(seed + 99)
    batches = [[], [], [], []]
    for r in rows:
        batches[rng.randrange(4)].append(r)
    d = _drive(spark, tmp_path, batches)
    assert _fold(spark, d) == _naive(rows)


def test_sub_k_days_fold_to_exact_counts(spark, tmp_path):
    rows = _rows(3, 200, 40)  # ≤ 40 distinct/day: every day below k
    d = _drive(spark, tmp_path, [rows[:90], rows[90:]])
    want = _naive(rows)
    assert all(v <= 40 for v in want.values())  # exact path everywhere
    assert _fold(spark, d) == want


def test_replay_and_compaction_change_nothing(spark, tmp_path):
    rows = _rows(11, 500, 250)
    batches = [rows[:150], rows[150:300], rows[300:]]
    d1 = _drive(spark, tmp_path / "a", batches)
    d2 = _drive(
        spark, tmp_path / "b", batches, replay={0, 2}, compact_every=2
    )
    assert _fold(spark, d1) == _fold(spark, d2) == _naive(rows)


def test_catalog_twin_matches_batch_estimate(spark, sf_dir):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    reg = load_all()
    batch = {
        r["dt"]: r["kmv_estimate"]
        for r in reg["kmv_distinct_daily"].builder(spark, sf_dir).collect()
    }
    live = {
        r["dt"]: r["kmv_estimate"]
        for r in reg["kmv_distinct_stream"].builder(spark, sf_dir).collect()
    }
    assert live == batch
