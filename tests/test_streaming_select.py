"""Streaming DSIR selection (streaming/select.py): frozen-model scoring
must equal batch scoring with the same model, replay exactly, and carry
the batch operator's semantics (model-subset scoring ≡ full self-scoring
when the model was trained on a superset)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.dsir import (
    dsir_logweights,
    dsir_score_with_model,
)
from sparkstreaming_gmall_scala_spark.sinks.batch import IdempotentBatchWriter
from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.select import (
    dsir_model_build,
    dsir_score_batch,
    dsir_select_pipeline,
)


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _target(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("lang") == "en").select("doc_id", "text")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_union_of_batches_equals_batch_scoring(spark, sf_dir, tmp_path):
    d = _docs(spark, sf_dir)
    model_dir = str(tmp_path / "model")
    dsir_model_build(d, _target(spark, sf_dir), "doc_id", "text", model_dir)

    sink = IdempotentBatchWriter(str(tmp_path / "out"))
    run = dsir_score_batch(spark, model_dir, sink)
    run(d.filter(F.col("doc_id") % 2 == 0), 0)
    run(d.filter(F.col("doc_id") % 2 == 1), 1)
    streamed = sink.read(spark).drop("batch_id")

    model = spark.read.parquet(model_dir)
    batch = dsir_score_with_model(d, model, "doc_id", "text").withColumn(
        "keep", F.col("avg_logw") >= F.lit(-0.09)
    )
    assert _rows(streamed) == _rows(batch)


def test_self_trained_model_reproduces_dsir_logweights(spark, sf_dir, tmp_path):
    """Persist-then-score must equal the one-plan self-scoring operator —
    the persisted model is the SAME table, so the catalog entry's gated
    oracle transitively covers the streaming scorer's math."""
    d = _docs(spark, sf_dir)
    model_dir = str(tmp_path / "model")
    dsir_model_build(d, _target(spark, sf_dir), "doc_id", "text", model_dir)
    model = spark.read.parquet(model_dir)
    a = _rows(dsir_score_with_model(d, model, "doc_id", "text"))
    b = _rows(dsir_logweights(d, _target(spark, sf_dir), "doc_id", "text"))
    assert a == b


def test_replay_rewrites_identical_rows(spark, sf_dir, tmp_path):
    d = _docs(spark, sf_dir)
    model_dir = str(tmp_path / "model")
    dsir_model_build(d, _target(spark, sf_dir), "doc_id", "text", model_dir)
    sink = IdempotentBatchWriter(str(tmp_path / "out"))
    run = dsir_score_batch(spark, model_dir, sink)
    b0 = d.filter(F.col("doc_id") % 2 == 0)
    run(b0, 0)
    run(d.filter(F.col("doc_id") % 2 == 1), 1)
    before = _rows(sink.read(spark))
    run(b0, 0)  # replay
    assert _rows(sink.read(spark)) == before


def test_unseen_bucket_scores_neutral(spark, tmp_path, sf_dir):
    """A doc whose features all miss the model's buckets scores exactly
    0.0 (the neutral prior) with full n_feats — never null, never a
    crash."""
    d = _docs(spark, sf_dir)
    model_dir = str(tmp_path / "model")
    dsir_model_build(d, _target(spark, sf_dir), "doc_id", "text", model_dir)
    model = spark.read.parquet(model_dir)
    weird = spark.createDataFrame(
        [(999999, "zzqx9 zzqx8 zzqx7")], "doc_id long, text string"
    )
    # force the miss: empty model instead (all buckets absent)
    empty_model = model.filter(F.lit(False))
    (r,) = dsir_score_with_model(
        weird, empty_model, "doc_id", "text"
    ).collect()
    assert r["n_feats"] == 5  # 3 unigrams + 2 bigrams
    assert r["avg_logw"] == 0.0


def test_checkpointed_pipeline_matches_driven_batches(spark, sf_dir, tmp_path):
    from test_streaming import _drop

    from sparkstreaming_gmall_scala_spark.streaming.dedup import DOC_SCHEMA

    d = _docs(spark, sf_dir).limit(60)
    model_dir = str(tmp_path / "model")
    dsir_model_build(
        _docs(spark, sf_dir), _target(spark, sf_dir), "doc_id", "text",
        model_dir,
    )
    rows = [(r["doc_id"], r["text"]) for r in d.collect()]
    src, out, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    os.makedirs(src, exist_ok=True)
    q = dsir_select_pipeline(spark, src, model_dir, out, ckpt)
    try:
        _drop(spark, DOC_SCHEMA, rows[:30], src)
        q.processAllAvailable()
        _drop(spark, DOC_SCHEMA, rows[30:], src)
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = IdempotentBatchWriter(out).read(spark).drop("batch_id")
    model = spark.read.parquet(model_dir)
    batch = dsir_score_with_model(d, model, "doc_id", "text").withColumn(
        "keep", F.col("avg_logw") >= F.lit(-0.09)
    )
    assert _rows(streamed) == _rows(batch)
