"""Sketch mart: one event stream feeding every bounded-state summary.

The composition sibling of streaming/funnel.py's analytics mart: a
single foreachBatch body lands each micro-batch ONCE and fans it into
the three sketch indexes —

  - count-min partials      (who is heavy?        streaming/cms.py)
  - histogram partials      (how are values shaped? streaming/histogram.py)
  - per-day HLL sketches    (how many distinct?   streaming/hll.py)

Each index keeps its own replay/compaction contract (they all ride the
same AppendOnlyIndex lifecycle), each pays only its own O(batch)
aggregate, and every report below equals its batch twin on the union of
batches — the per-family pins already cover that; the composition test
pins that wiring them TOGETHER changes nothing. The batch is persisted
once so the three bodies don't re-read the source.

This is the ops-dashboard shape at 100 TB: the stream maintains a few
KB of sketch state per family, and dashboards (top-k, percentiles,
reach) read the tiny indexes, never the firehose."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .cms import cms_ingest_batch
from .histogram import histogram_ingest_batch
from .hll import hll_ingest_batch


def sketch_mart_batch(
    spark: SparkSession,
    cms_dir: str,
    hist_dir: str,
    hll_dir: str,
    hist_lo: float,
    hist_hi: float,
    key_col: str = "user_id",
    value_col: str = "value",
    compact_every: int | None = None,
):
    """One foreachBatch body maintaining all three sketch indexes.
    Histogram bounds are pinned at build time (the frozen-model
    contract); CMS/HLL need no training at all."""
    cms_body = cms_ingest_batch(
        spark, cms_dir, key_col=key_col, compact_every=compact_every
    )
    hist_body = histogram_ingest_batch(
        spark, hist_dir, lo=hist_lo, hi=hist_hi, value_col=value_col,
        compact_every=compact_every,
    )
    hll_body = hll_ingest_batch(
        spark, hll_dir, key=key_col, compact_every=compact_every
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.persist()
        try:
            b.count()  # materialize once for the three consumers
            cms_body(b, batch_id)
            hist_body(b, batch_id)
            hll_body(b, batch_id)
        finally:
            b.unpersist()

    return process


def sketch_mart_pipeline(
    spark: SparkSession,
    src_dir: str,
    cms_dir: str,
    hist_dir: str,
    hll_dir: str,
    checkpoint: str,
    schema,
    hist_lo: float,
    hist_hi: float,
    compact_every: int | None = None,
):
    """Event file-drop stream → all three sketch indexes, one
    checkpointed query (restart resumes from the checkpoint; replayed
    batches are absorbed by each index's src_batch dedup)."""
    from .sources import file_stream

    ev = file_stream(spark, src_dir, schema)
    return (
        ev.writeStream.foreachBatch(
            sketch_mart_batch(
                spark, cms_dir, hist_dir, hll_dir,
                hist_lo=hist_lo, hist_hi=hist_hi,
                compact_every=compact_every,
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
