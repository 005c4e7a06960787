"""Streaming data selection: DSIR scoring of a document stream against a
frozen, persisted bucket model.

Completes the selection family's streaming story (the curate/dedup/ANN
pattern applied to DSIR): the model — dsir_bucket_model's ≤b-row
(bucket, _l9) table — is trained ONCE on a seed corpus and persisted as
KB-scale parquet; each arriving micro-batch is scored against that
frozen table and the keep rows land in an idempotent per-batch sink.

Frozen-model contract (the streaming/ann.py frozen-centroid argument):
scoring new docs never retrains — retraining per batch would make a
doc's keep decision depend on WHEN it arrived, destroying replay
idempotence; drift is handled by an offline retrain + re-score, which is
just dsir_bucket_model into a fresh model dir. The equality pinned in
tests is therefore: union over batches ≡ batch dsir_score_with_model
over the union with the SAME model — exact, not approximate, because
per-bucket log-ratios are nano-quantized integers and the per-doc mean
is integer arithmetic.

Scale shape per batch: one bucket-count groupBy over the batch (O(batch))
+ a broadcast join against the tiny model — the persisted model is read
per batch (a KB-scale scan) and never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dsir import DSIR_TAU, dsir_bucket_model, dsir_score_with_model
from ..sinks.batch import IdempotentBatchWriter
from .dedup import DOC_SCHEMA
from .sources import file_stream


def dsir_model_build(
    docs: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    model_dir: str,
    b: int = 4096,
) -> None:
    """Train the bucket model on a seed corpus and persist it (≤b rows,
    KB-scale). One-time; the streaming scorer reads it per batch."""
    dsir_bucket_model(docs, target, id_col, text_col, b).write.mode(
        "overwrite"
    ).parquet(model_dir)


def dsir_score_batch(
    spark: SparkSession,
    model_dir: str,
    sink: IdempotentBatchWriter,
    id_col: str = "doc_id",
    text_col: str = "text",
    b: int = 4096,
    tau: float = DSIR_TAU,
):
    """Per-batch body (exposed for direct (batch_df, batch_id) driving):
    score the batch's docs against the frozen model, emit
    (id, n_feats, avg_logw, keep). Replay rewrites the same batch dir
    with identical rows — scoring is a pure function of (batch, model)."""
    model = spark.read.parquet(model_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        new = batch_df.dropDuplicates([id_col])
        scored = dsir_score_with_model(new, model, id_col, text_col, b)
        sink(
            scored.withColumn("keep", F.col("avg_logw") >= F.lit(float(tau))),
            batch_id,
        )

    return process


def dsir_select_pipeline(
    spark: SparkSession,
    src_dir: str,
    model_dir: str,
    out_dir: str,
    checkpoint: str,
    b: int = 4096,
    tau: float = DSIR_TAU,
):
    """Document file-drop stream → per-batch DSIR keep decisions."""
    docs = file_stream(spark, src_dir, DOC_SCHEMA)
    sink = IdempotentBatchWriter(out_dir)
    return (
        docs.writeStream.foreachBatch(
            dsir_score_batch(spark, model_dir, sink, b=b, tau=tau)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def curate_select_batch(
    spark: SparkSession,
    model_dir: str,
    fp_index_dir: str,
    band_index_dir: str,
    docs_sink: IdempotentBatchWriter,
    pairs_sink: IdempotentBatchWriter,
    select_sink: IdempotentBatchWriter,
    eval_docs: DataFrame | None = None,
    compact_every: int | None = None,
    b: int = 4096,
    tau: float = DSIR_TAU,
):
    """Curate → DSIR selection in ONE foreachBatch body (round-7 verdict
    #6): each batch runs the streaming-safe curation recipe (gopher,
    decontamination, PII mask, exact dedup against the fingerprint
    index), then scores the curated KEEPS against the frozen bucket
    model and lands (doc_id, n_feats, avg_logw, keep) in
    ``select_sink`` — a doc dropped by curation never pays featurization,
    and the DSIR decision sees the post-mask text downstream stores.

    Batch-twin equality (pinned in tests/test_streaming_select.py): the
    union of select_sink batches equals ``dsir_score_with_model`` over
    ``corpus_ingest_batch_recipe`` of the union — exact, because scoring
    is a pure function of (doc set, frozen model) and curation's keep
    set is arrival-order independent. Replay rewrites identical rows
    (every stage writes through idempotent per-batch sinks)."""
    from ..operators.dsir import dsir_score_with_model
    from .curate import curate_ingest_batch

    model = spark.read.parquet(model_dir)

    def score_keeps(keeps: DataFrame, batch_id: int) -> None:
        scored = dsir_score_with_model(
            keeps.select("doc_id", F.col("masked_text").alias("text")),
            model,
            "doc_id",
            "text",
            b,
        )
        select_sink(
            scored.withColumn("keep", F.col("avg_logw") >= F.lit(float(tau))),
            batch_id,
        )

    return curate_ingest_batch(
        spark,
        fp_index_dir,
        band_index_dir,
        docs_sink,
        pairs_sink,
        eval_docs=eval_docs,
        compact_every=compact_every,
        keeps_hook=score_keeps,
    )


def curate_select_pipeline(
    spark: SparkSession,
    src_dir: str,
    model_dir: str,
    fp_index_dir: str,
    band_index_dir: str,
    docs_out_dir: str,
    pairs_out_dir: str,
    select_out_dir: str,
    checkpoint: str,
    eval_docs: DataFrame | None = None,
    compact_every: int | None = None,
    b: int = 4096,
    tau: float = DSIR_TAU,
):
    """Document stream → curated corpus + near-dup candidates + DSIR keep
    decisions, one checkpointed query."""
    docs = file_stream(spark, src_dir, DOC_SCHEMA)
    return (
        docs.writeStream.foreachBatch(
            curate_select_batch(
                spark,
                model_dir,
                fp_index_dir,
                band_index_dir,
                IdempotentBatchWriter(docs_out_dir),
                IdempotentBatchWriter(pairs_out_dir),
                IdempotentBatchWriter(select_out_dir),
                eval_docs=eval_docs,
                compact_every=compact_every,
                b=b,
                tau=tau,
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
