"""Streaming SQ8 ingest (streaming/ann.py sq8_*): the codes index grown
per batch under frozen bounds must be indistinguishable from a batch
sq8_encode over the union — probe equality with and without the exact
rerank stage, replay idempotence, compaction transparency, and graceful
clamping of out-of-bounds late arrivals."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.sq import (
    sq8_bounds,
    sq8_encode,
    sq8_topk,
)
from sparkstreaming_gmall_scala_spark.sinks.batch import AppendOnlyIndex
from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.ann import (
    sq8_index_topk,
    sq8_ingest_batch,
)


def _embs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_codes_probe_equals_batch_encode(spark, sf_dir, tmp_path):
    e = _embs(spark, sf_dir)
    bounds = sq8_bounds(e, "embedding")
    queries = e.filter(F.col("doc_id") < 5)
    idx = str(tmp_path / "idx")
    run = sq8_ingest_batch(spark, idx, bounds)
    run(e.filter(F.col("doc_id") % 2 == 0), 0)
    run(e.filter(F.col("doc_id") % 2 == 1), 1)

    for rerank in (None, e):
        streamed = sq8_index_topk(
            queries, idx, "doc_id", "embedding", bounds,
            k=5, rerank=rerank, shortlist=64, dim=64,
        )
        batch = sq8_topk(
            sq8_encode(e, "doc_id", "embedding", bounds),
            queries, "doc_id", "embedding", bounds,
            k=5, rerank=rerank, shortlist=64, dim=64,
        )
        assert _rows(streamed) == _rows(batch)


def test_replay_and_compaction_transparent(spark, sf_dir, tmp_path):
    e = _embs(spark, sf_dir)
    bounds = sq8_bounds(e, "embedding")
    queries = e.filter(F.col("doc_id") < 5)
    idx = str(tmp_path / "idx")
    run = sq8_ingest_batch(spark, idx, bounds, compact_every=2)
    b0 = e.filter(F.col("doc_id") % 3 == 0)
    run(b0, 0)
    run(e.filter(F.col("doc_id") % 3 == 1), 1)
    run(e.filter(F.col("doc_id") % 3 == 2), 2)  # triggers compaction
    want = _rows(
        sq8_index_topk(
            queries, idx, "doc_id", "embedding", bounds,
            k=5, rerank=e, shortlist=64, dim=64,
        )
    )
    # replay batch 0 after compaction: probe unchanged
    run(b0, 0)
    got = _rows(
        sq8_index_topk(
            queries, idx, "doc_id", "embedding", bounds,
            k=5, rerank=e, shortlist=64, dim=64,
        )
    )
    assert got == want
    # and equals the batch encode of the union
    batch = sq8_topk(
        sq8_encode(e, "doc_id", "embedding", bounds),
        queries, "doc_id", "embedding", bounds,
        k=5, rerank=e, shortlist=64, dim=64,
    )
    assert want == _rows(batch)


def test_out_of_bounds_arrivals_clamp(spark, sf_dir, tmp_path):
    """Vectors outside the frozen bounds must clamp to 0/255, not error —
    the graceful-degradation contract for late drift."""
    e = _embs(spark, sf_dir)
    bounds = sq8_bounds(e.filter(F.col("doc_id") < 100), "embedding")
    idx = str(tmp_path / "idx")
    run = sq8_ingest_batch(spark, idx, bounds)
    wild = e.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.transform(
            F.col("embedding"), lambda x: x * F.lit(1000.0)
        ).alias("embedding"),
    ).limit(5)
    run(wild, 0)
    codes = AppendOnlyIndex(idx).read(spark).collect()
    assert codes
    assert all(0 <= c <= 255 for r in codes for c in r["codes"])
