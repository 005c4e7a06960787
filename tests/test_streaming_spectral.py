"""Streaming Gram mart (streaming/spectral.py): the live spectral audit
equals the batch audit EXACTLY — integer Gram partials are an additive
monoid, so any batch split, replayed batches, and compaction all fold to
the identical matrix and the identical iteration."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.spectral import (
    power_iteration_audit,
    power_iteration_from_gram,
)
from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.spectral import (
    fold_gram,
    gram_ingest_batch,
)


def _batches(emb, n):
    return [
        emb.filter(F.pmod(F.hash("vec_id"), F.lit(n)) == i)
        for i in range(n)
    ]


def test_live_equals_batch_exactly_at_any_split(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    v_batch, share_batch = power_iteration_audit(emb)

    for n, sub in ((2, "a"), (3, "b")):
        idx = str(tmp_path / f"gram_{sub}")
        body = gram_ingest_batch(spark, idx)
        for i, b in enumerate(_batches(emb, n)):
            body(b, i)
        v_live, share_live = power_iteration_from_gram(
            fold_gram(spark, idx)
        )
        assert v_live == v_batch  # EXACT integers, not approximate
        assert share_live == share_batch


def test_replayed_batch_is_absorbed(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "gram")
    body = gram_ingest_batch(spark, idx)
    bs = _batches(emb, 3)
    for i, b in enumerate(bs):
        body(b, i)
    before = fold_gram(spark, idx)
    body(bs[1], 1)  # duplicate delivery rewrites only its own dir
    assert fold_gram(spark, idx) == before


def test_compaction_preserves_the_fold(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "gram")
    body = gram_ingest_batch(spark, idx, compact_every=2)
    for i, b in enumerate(_batches(emb, 3)):
        body(b, i)
    v_live, share_live = power_iteration_from_gram(fold_gram(spark, idx))
    v_batch, share_batch = power_iteration_audit(emb)
    assert v_live == v_batch and share_live == share_batch


def test_gram_partial_is_the_outer_product_sum(spark):
    """Hand matrix: rows (1,2) and (3,4) in micro-units -> M =
    [[10,14],[14,20]] x 1e12 exactly."""
    from sparkstreaming_gmall_scala_spark.streaming.spectral import (
        gram_partial,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    cells = {
        (r["i"], r["j"]): int(r["s"]) for r in gram_partial(df).collect()
    }
    u = 10**12
    assert cells == {
        (1, 1): 10 * u,
        (1, 2): 14 * u,
        (2, 1): 14 * u,
        (2, 2): 20 * u,
    }
