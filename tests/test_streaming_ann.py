"""Incremental IVF ANN ingest (streaming/ann.py): the streamed index
must be indistinguishable from a batch-built one — probe equality at
every point, replay idempotence, compaction transparency, and real
partition pruning on the probe scan."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.similarity import (
    ivf_build,
    ivf_probe,
    kmeans_centroids,
)
from sparkstreaming_gmall_scala_spark.sinks.batch import AppendOnlyIndex
from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.ann import (
    ivf_index_topk,
    ivf_ingest_batch,
    ivf_ingest_pipeline,
)

DIM = 64


def _embs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )


def _centroids(spark, sf_dir):
    return kmeans_centroids(
        _embs(spark, sf_dir), "embedding", k=4, iters=2, id_col="doc_id"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_probe_equals_batch_built(spark, sf_dir, tmp_path):
    """Two micro-batches of ingest ≡ one ivf_build over the union: the
    probe must return identical (query, neighbor, score, rank) rows."""
    e = _embs(spark, sf_dir)
    cents = _centroids(spark, sf_dir)
    queries = e.filter(F.col("doc_id") < 5)

    idx = str(tmp_path / "stream_idx")
    run = ivf_ingest_batch(spark, idx, cents, dim=DIM)
    run(e.filter(F.col("doc_id") % 2 == 0), 0)
    run(e.filter(F.col("doc_id") % 2 == 1), 1)
    streamed = ivf_index_topk(
        queries, idx, "doc_id", "embedding", cents, k=5, nprobe=2, dim=DIM
    )

    batch_dir = str(tmp_path / "batch_idx")
    ivf_build(e, "doc_id", "embedding", cents, batch_dir, dim=DIM)
    batch = ivf_probe(
        queries, batch_dir, "doc_id", "embedding", cents, k=5, nprobe=2,
        dim=DIM,
    )
    assert _rows(streamed) == _rows(batch)


def test_mid_stream_probe_sees_exactly_the_ingested_prefix(
    spark, sf_dir, tmp_path
):
    """After batch 0 only, the index answers as a batch build over batch
    0's rows — the index is correct at every point in time, not only at
    the end."""
    e = _embs(spark, sf_dir)
    cents = _centroids(spark, sf_dir)
    half = e.filter(F.col("doc_id") % 2 == 0)
    queries = e.filter(F.col("doc_id") < 5)

    idx = str(tmp_path / "stream_idx")
    ivf_ingest_batch(spark, idx, cents, dim=DIM)(half, 0)
    streamed = ivf_index_topk(
        queries, idx, "doc_id", "embedding", cents, k=5, nprobe=2, dim=DIM
    )
    batch_dir = str(tmp_path / "batch_idx")
    ivf_build(half, "doc_id", "embedding", cents, batch_dir, dim=DIM)
    batch = ivf_probe(
        queries, batch_dir, "doc_id", "embedding", cents, k=5, nprobe=2,
        dim=DIM,
    )
    assert _rows(streamed) == _rows(batch)


def test_replayed_batch_rewrites_itself(spark, sf_dir, tmp_path):
    """Replaying batch 0 after batch 1 committed must leave the index
    content unchanged (its dir overwrites with identical rows — frozen
    centroids make assignment deterministic)."""
    e = _embs(spark, sf_dir)
    cents = _centroids(spark, sf_dir)
    idx = str(tmp_path / "idx")
    run = ivf_ingest_batch(spark, idx, cents, dim=DIM)
    b0 = e.filter(F.col("doc_id") % 2 == 0)
    run(b0, 0)
    run(e.filter(F.col("doc_id") % 2 == 1), 1)
    before = _rows(AppendOnlyIndex(idx, partition_by=("cell",)).read(spark))
    run(b0, 0)  # replay
    after = _rows(AppendOnlyIndex(idx, partition_by=("cell",)).read(spark))
    assert before == after


def test_inline_compaction_transparent_and_bounds_dirs(
    spark, sf_dir, tmp_path
):
    """compact_every folds committed batch dirs into base without
    changing any probe answer; directory count stays O(1)."""
    e = _embs(spark, sf_dir)
    cents = _centroids(spark, sf_dir)
    queries = e.filter(F.col("doc_id") < 5)
    idx = str(tmp_path / "idx")
    run = ivf_ingest_batch(spark, idx, cents, dim=DIM, compact_every=2)
    for b in range(5):
        run(e.filter(F.col("doc_id") % 5 == b), b)
    batch_dirs = [
        n for n in os.listdir(idx) if n.startswith("batch_id=")
    ]
    assert len(batch_dirs) <= 2, batch_dirs  # base holds the rest
    assert os.path.isdir(os.path.join(idx, "base"))

    streamed = ivf_index_topk(
        queries, idx, "doc_id", "embedding", cents, k=5, nprobe=2, dim=DIM
    )
    batch_dir = str(tmp_path / "batch_idx")
    ivf_build(e, "doc_id", "embedding", cents, batch_dir, dim=DIM)
    batch = ivf_probe(
        queries, batch_dir, "doc_id", "embedding", cents, k=5, nprobe=2,
        dim=DIM,
    )
    assert _rows(streamed) == _rows(batch)


def test_probe_scan_prunes_cells(spark, sf_dir, tmp_path):
    """Every generation is cell-partitioned, so the probe's cell join
    must reach the parquet scans as partition filters — unprobed cell
    directories are skipped at scan time, which is the entire reason the
    streamed index partitions by cell."""
    e = _embs(spark, sf_dir)
    cents = _centroids(spark, sf_dir)
    queries = e.filter(F.col("doc_id") < 5)
    idx = str(tmp_path / "idx")
    run = ivf_ingest_batch(spark, idx, cents, dim=DIM)
    run(e, 0)
    topk = ivf_index_topk(
        queries, idx, "doc_id", "embedding", cents, k=5, nprobe=2, dim=DIM
    )
    plan = topk._sc._jvm.PythonSQLUtils.explainString(
        topk._jdf.queryExecution(), "formatted"
    )
    assert (
        "PartitionFilters" in plan or "dynamicpruning" in plan.lower()
    ), plan[:2000]


def test_checkpointed_pipeline_matches_batch(spark, sf_dir, tmp_path):
    """The real writeStream pipeline (file drops, checkpointed) grows the
    same index the driven batch bodies do."""
    from test_streaming import _drop

    from sparkstreaming_gmall_scala_spark.streaming.dedup import EMB_SCHEMA

    e = _embs(spark, sf_dir).limit(60)
    cents = _centroids(spark, sf_dir)
    rows = [(r["doc_id"], [float(x) for x in r["embedding"]]) for r in e.collect()]
    src, idx, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "idx"),
        str(tmp_path / "ckpt"),
    )
    os.makedirs(src, exist_ok=True)
    q = ivf_ingest_pipeline(
        spark, src, idx, ckpt, cents, dim=DIM,
    )
    try:
        _drop(spark, EMB_SCHEMA, rows[:30], src)
        q.processAllAvailable()
        _drop(spark, EMB_SCHEMA, rows[30:], src)
        q.processAllAvailable()
    finally:
        q.stop()
    queries = e.filter(F.col("doc_id") < 5)
    streamed = ivf_index_topk(
        queries, idx, "doc_id", "embedding", cents, k=5, nprobe=2, dim=DIM
    )
    batch_dir = str(tmp_path / "batch_idx")
    ivf_build(e, "doc_id", "embedding", cents, batch_dir, dim=DIM)
    batch = ivf_probe(
        queries, batch_dir, "doc_id", "embedding", cents, k=5, nprobe=2,
        dim=DIM,
    )
    assert _rows(streamed) == _rows(batch)


def test_pipeline_restart_from_checkpoint(spark, sf_dir, tmp_path):
    """Kill the ingest query between batches and restart from the same
    checkpoint: the second query object must continue the SAME index
    (no re-ingest of batch 0, no gap), and the final probe must equal a
    batch build over everything dropped across both query lifetimes."""
    from test_streaming import _drop

    from sparkstreaming_gmall_scala_spark.streaming.dedup import EMB_SCHEMA

    e = _embs(spark, sf_dir).limit(60)
    cents = _centroids(spark, sf_dir)
    rows = [
        (r["doc_id"], [float(x) for x in r["embedding"]]) for r in e.collect()
    ]
    src, idx, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "idx"),
        str(tmp_path / "ckpt"),
    )
    os.makedirs(src, exist_ok=True)

    q1 = ivf_ingest_pipeline(spark, src, idx, ckpt, cents, dim=DIM)
    try:
        _drop(spark, EMB_SCHEMA, rows[:30], src)
        q1.processAllAvailable()
    finally:
        q1.stop()

    q2 = ivf_ingest_pipeline(spark, src, idx, ckpt, cents, dim=DIM)
    try:
        _drop(spark, EMB_SCHEMA, rows[30:], src)
        q2.processAllAvailable()
    finally:
        q2.stop()

    queries = e.filter(F.col("doc_id") < 5)
    streamed = ivf_index_topk(
        queries, idx, "doc_id", "embedding", cents, k=5, nprobe=2, dim=DIM
    )
    batch_dir = str(tmp_path / "batch_idx")
    ivf_build(e, "doc_id", "embedding", cents, batch_dir, dim=DIM)
    batch = ivf_probe(
        queries, batch_dir, "doc_id", "embedding", cents, k=5, nprobe=2,
        dim=DIM,
    )
    assert _rows(streamed) == _rows(batch)
    # exactly one batch dir per committed micro-batch, no duplicates
    dirs = sorted(
        n for n in os.listdir(idx) if n.startswith("batch_id=")
    )
    assert dirs == ["batch_id=0", "batch_id=1"], dirs
