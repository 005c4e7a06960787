"""Streaming k-step path-count pins: the steps−1-event cross-batch
carry, batch≡streaming equality over arbitrary splits, replay
idempotence (streaming/paths.py)."""

from __future__ import annotations

import datetime as dt

from sparkstreaming_gmall_scala_spark.operators.analytics import (
    top_paths_frame,
)
from sparkstreaming_gmall_scala_spark.streaming.paths import (
    path_ingest_batch,
    top_paths,
)

COLS = ["user_id", "ts", "event_id", "event_type"]


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


# user 1: a>b>c>d>e — paths a>b>c, b>c>d, c>d>e; split so one path has
# TWO events in the carry (d,e arrive alone in the last batch)
# user 2: x>y in batch 1, z in batch 2 → x>y>z needs a 2-event carry
B1 = [
    (1, _ts(0), 10, "a"),
    (1, _ts(1), 11, "b"),
    (1, _ts(2), 12, "c"),
    (2, _ts(3), 13, "x"),
    (2, _ts(4), 14, "y"),
]
B2 = [
    (1, _ts(5), 20, "d"),
    (2, _ts(6), 21, "z"),
]
B3 = [
    (1, _ts(7), 30, "e"),
    (3, _ts(8), 31, "q"),  # lone event: no paths ever
]


def _batch_paths(spark, rows):
    ev = spark.createDataFrame(rows, COLS)
    return {
        r["path"]: r["n"]
        for r in top_paths_frame(ev, steps=3, top_n=100).collect()
    }


def _drive(spark, tmp_path, batches, replay=None):
    counts = str(tmp_path / "counts")
    carry = str(tmp_path / "carry")
    body = path_ingest_batch(spark, counts, carry, steps=3, compact_every=2)
    for bid, rows in enumerate(batches):
        body(spark.createDataFrame(rows, COLS), bid)
    if replay is not None:
        bid, rows = replay
        body(spark.createDataFrame(rows, COLS), bid)
    return {
        r["path"]: r["n"]
        for r in top_paths(spark, counts, top_n=100).collect()
    }


def test_streamed_paths_equal_batch_with_two_event_carry(spark, tmp_path):
    want = _batch_paths(spark, B1 + B2 + B3)
    # the pinned interesting cases are actually in `want`
    assert want["c>d>e"] == 1 and want["x>y>z"] == 1
    got = _drive(spark, tmp_path, [B1, B2, B3])
    assert got == want


def test_streamed_paths_split_invariant_and_replay(spark, tmp_path):
    want = _batch_paths(spark, B1 + B2 + B3)
    allrows = B1 + B2 + B3
    # a different split: one event per batch for the first 4, rest bulk
    split = [[r] for r in allrows[:4]] + [allrows[4:]]
    got = _drive(spark, tmp_path / "s2", split)
    assert got == want
    # replay the LAST batch (post-compaction in-flight rewrite)
    got2 = _drive(
        spark, tmp_path / "s3", [B1, B2, B3], replay=(2, B3)
    )
    assert got2 == want
