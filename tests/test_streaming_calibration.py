"""Live calibration-mart pins (streaming/calibration.py): batch ≡ live
over arbitrary splits and replays, and the label monoid — a
late-arriving smaller-id duplicate flips the old representative's
survival label on the next read with no ingest-time state rewrite."""

from __future__ import annotations

import random


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(seed, n, dup_every=4):
    """Synthetic docs where every ``dup_every``-th doc duplicates an
    earlier one's text — fingerprint groups with >1 member exist."""
    rng = random.Random(seed)
    vocab = ["the", "a", "of", "and", "to", "spark", "stream", "data"]
    rows = []
    for i in range(n):
        if i % dup_every == 3 and rows:
            text = rows[rng.randrange(len(rows))][1]
        else:
            text = " ".join(
                rng.choice(vocab) for _ in range(rng.randrange(3, 25))
            )
        rows.append((i, text))
    return rows


def _drive(spark, tmp_path, batches, replay=(), compact_every=None):
    from sparkstreaming_gmall_scala_spark.streaming.calibration import (
        calib_ingest_batch,
    )

    d = str(tmp_path / "calib")
    body = calib_ingest_batch(spark, d, compact_every=compact_every)
    for bid, rows in enumerate(batches):
        body(_frame(spark, rows), bid)
        if bid in replay:
            body(_frame(spark, rows), bid)
    return d


def _live(spark, d):
    from sparkstreaming_gmall_scala_spark.plans.llm import _calibrate_per_fp
    from sparkstreaming_gmall_scala_spark.streaming.calibration import (
        fold_calib,
    )

    return {
        tuple(r) for r in _calibrate_per_fp(fold_calib(spark, d)).collect()
    }


def _batch(spark, rows):
    from sparkstreaming_gmall_scala_spark.plans.llm import _calibrate_per_fp
    from sparkstreaming_gmall_scala_spark.streaming.calibration import (
        calib_per_doc,
    )

    return {
        tuple(r)
        for r in _calibrate_per_fp(
            calib_per_doc(_frame(spark, rows))
        ).collect()
    }


def test_live_equals_batch_over_random_splits_and_replay(spark, tmp_path):
    rows = _corpus(7, 80)
    rng = random.Random(71)
    batches = [[], [], []]
    for r in rows:
        batches[rng.randrange(3)].append(r)
    d = _drive(spark, tmp_path, batches, replay={1}, compact_every=2)
    assert _live(spark, d) == _batch(spark, rows)


def test_late_smaller_id_duplicate_flips_the_label(spark, tmp_path):
    """The monoid property in isolation: doc 5 is its group's keeper
    until doc 2 (same text, smaller id) arrives in a LATER batch — the
    next read must re-elect doc 2 with no compaction or rewrite."""
    text_dup = "the a of and to"
    text_other = "spark stream data spark"
    b0 = [(5, text_dup), (9, text_other)]
    b1 = [(2, text_dup)]

    d = _drive(spark, tmp_path, [b0])
    first = {r[0]: r for r in _live(spark, d)}
    assert first[5][3] == 1  # keep flag: doc 5 is the representative

    from sparkstreaming_gmall_scala_spark.streaming.calibration import (
        calib_ingest_batch,
    )

    calib_ingest_batch(spark, d)(_frame(spark, b1), 1)
    second = {r[0]: r for r in _live(spark, d)}
    assert second[2][3] == 1  # the smaller id took the group
    assert second[5][3] == 0  # the old representative flipped
    assert second == {r[0]: r for r in _batch(spark, b0 + b1)}
