"""Streaming IVF-PQ ingest (streaming/ann.py ivfpq_*): the codes index
grown per batch under frozen quantizers must be indistinguishable from a
batch ivf_pq_encode over the union — probe equality with and without the
exact rerank stage, replay idempotence, compaction transparency."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.pq import (
    ivf_pq_encode,
    ivf_pq_topk,
    pq_train,
)
from sparkstreaming_gmall_scala_spark.operators.similarity import (
    kmeans_centroids,
)
from sparkstreaming_gmall_scala_spark.sinks.batch import AppendOnlyIndex
from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.ann import (
    ivfpq_index_topk,
    ivfpq_ingest_batch,
)


def _embs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )


def _quantizers(spark, sf_dir):
    e = _embs(spark, sf_dir)
    cents = kmeans_centroids(e, "embedding", k=4, iters=2, id_col="doc_id")
    books = pq_train(
        e, "embedding", m=8, ksub=16, id_col="doc_id", centroids=cents
    )
    return cents, books


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_codes_probe_equals_batch_encode(spark, sf_dir, tmp_path):
    e = _embs(spark, sf_dir)
    cents, books = _quantizers(spark, sf_dir)
    queries = e.filter(F.col("doc_id") < 5)
    idx = str(tmp_path / "idx")
    run = ivfpq_ingest_batch(spark, idx, cents, books)
    run(e.filter(F.col("doc_id") % 2 == 0), 0)
    run(e.filter(F.col("doc_id") % 2 == 1), 1)

    streamed = ivfpq_index_topk(
        queries, idx, "doc_id", "embedding", cents, books, k=5, nprobe=2
    )
    batch_index = ivf_pq_encode(e, "doc_id", "embedding", cents, books)
    batch = ivf_pq_topk(
        batch_index, queries, "doc_id", "embedding", cents, books,
        k=5, nprobe=2,
    )
    assert _rows(streamed) == _rows(batch)


def test_streamed_codes_with_exact_rerank_equals_batch(
    spark, sf_dir, tmp_path
):
    """The refine stage (exact cosine over the ADC shortlist, raw
    vectors supplied separately — codes alone can't rerank) agrees with
    the batch pipeline too."""
    e = _embs(spark, sf_dir)
    cents, books = _quantizers(spark, sf_dir)
    queries = e.filter(F.col("doc_id") < 5)
    idx = str(tmp_path / "idx")
    run = ivfpq_ingest_batch(spark, idx, cents, books)
    run(e.filter(F.col("doc_id") % 3 != 0), 0)
    run(e.filter(F.col("doc_id") % 3 == 0), 1)

    streamed = ivfpq_index_topk(
        queries, idx, "doc_id", "embedding", cents, books,
        k=5, nprobe=2, rerank=e,
    )
    batch_index = ivf_pq_encode(e, "doc_id", "embedding", cents, books)
    batch = ivf_pq_topk(
        batch_index, queries, "doc_id", "embedding", cents, books,
        k=5, nprobe=2, rerank=e,
    )
    assert _rows(streamed) == _rows(batch)


def test_replay_and_compaction_transparent(spark, sf_dir, tmp_path):
    e = _embs(spark, sf_dir)
    cents, books = _quantizers(spark, sf_dir)
    queries = e.filter(F.col("doc_id") < 5)
    idx = str(tmp_path / "idx")
    run = ivfpq_ingest_batch(spark, idx, cents, books, compact_every=2)
    for b in range(4):
        run(e.filter(F.col("doc_id") % 4 == b), b)
    before = _rows(
        AppendOnlyIndex(idx, partition_by=("cell",))
        .read(spark)
        .select("doc_id", "cell")
    )
    run(e.filter(F.col("doc_id") % 4 == 3), 3)  # replay last batch
    after = _rows(
        AppendOnlyIndex(idx, partition_by=("cell",))
        .read(spark)
        .select("doc_id", "cell")
    )
    assert before == after

    streamed = ivfpq_index_topk(
        queries, idx, "doc_id", "embedding", cents, books, k=5, nprobe=2
    )
    batch_index = ivf_pq_encode(e, "doc_id", "embedding", cents, books)
    batch = ivf_pq_topk(
        batch_index, queries, "doc_id", "embedding", cents, books,
        k=5, nprobe=2,
    )
    assert _rows(streamed) == _rows(batch)
