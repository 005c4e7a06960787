"""Streaming transition-matrix pins: cross-batch carry, batch≡streaming
equality, replay idempotence (streaming/transitions.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def _batch_matrix(spark, rows):
    """The batch definition applied in one shot (the oracle twin)."""
    from pyspark.sql import Window

    ev = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type"]
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    c = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("c"))
    tot = c.groupBy("from_type").agg(F.sum("c").alias("c_from"))
    return c.join(tot, "from_type").select(
        "from_type", "to_type", "c", "c_from",
        F.expr("c * 1000000L div c_from").alias("p6"),
    )


B1 = [
    (1, _ts(0), 10, "click"),
    (1, _ts(1), 11, "view"),
    (2, _ts(2), 12, "signup"),
]
B2 = [
    (1, _ts(5), 20, "purchase"),  # cross-batch: view -> purchase
    (2, _ts(6), 21, "click"),     # cross-batch: signup -> click
    (3, _ts(7), 22, "view"),      # new user, no predecessor
    (3, _ts(8), 23, "error"),
]


def _drive(spark, tmp_path, batches):
    from sparkstreaming_gmall_scala_spark.streaming.transitions import (
        transition_ingest_batch,
    )

    counts = str(tmp_path / "counts")
    carry = str(tmp_path / "carry")
    body = transition_ingest_batch(spark, counts, carry)
    for bid, rows in enumerate(batches):
        body(
            spark.createDataFrame(
                rows, ["user_id", "ts", "event_id", "event_type"]
            ),
            bid,
        )
    return counts, carry, body


def test_streamed_matrix_equals_batch_including_boundary(spark, tmp_path):
    from sparkstreaming_gmall_scala_spark.streaming.transitions import (
        transition_matrix,
    )

    counts, _, _ = _drive(spark, tmp_path, [B1, B2])
    got = {
        (r["from_type"], r["to_type"]): (r["c"], r["c_from"], r["p6"])
        for r in transition_matrix(spark, counts).collect()
    }
    want = {
        (r["from_type"], r["to_type"]): (r["c"], r["c_from"], r["p6"])
        for r in _batch_matrix(spark, B1 + B2).collect()
    }
    assert got == want
    # the two boundary transitions exist only via the carry
    assert ("view", "purchase") in got and ("signup", "click") in got


def test_replayed_batch_is_idempotent(spark, tmp_path):
    from sparkstreaming_gmall_scala_spark.streaming.transitions import (
        transition_matrix,
    )

    counts, _, body = _drive(spark, tmp_path, [B1, B2])
    before = sorted(
        tuple(r) for r in transition_matrix(spark, counts).collect()
    )
    # SS replays the last uncommitted batch: re-run batch 1 verbatim —
    # it re-reads carry generation 0 (not the advanced one) and
    # overwrites its own counts partial and carry generation
    body(
        spark.createDataFrame(
            B2, ["user_id", "ts", "event_id", "event_type"]
        ),
        1,
    )
    after = sorted(
        tuple(r) for r in transition_matrix(spark, counts).collect()
    )
    assert after == before


def test_three_way_split_and_within_batch_dup_rows(spark, tmp_path):
    from sparkstreaming_gmall_scala_spark.streaming.transitions import (
        transition_matrix,
    )

    # same stream cut differently (3 batches), plus a duplicated delivery
    # of one event inside a batch (dropDuplicates on event_id absorbs it)
    b1, b2, b3 = B1[:2], [B1[2], B2[0], B2[0]], B2[1:]
    counts, _, _ = _drive(spark, tmp_path, [b1, b2, b3])
    got = {
        (r["from_type"], r["to_type"]): r["c"]
        for r in transition_matrix(spark, counts).collect()
    }
    want = {
        (r["from_type"], r["to_type"]): r["c"]
        for r in _batch_matrix(spark, B1 + B2).collect()
    }
    assert got == want
