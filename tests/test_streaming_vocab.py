"""Streaming token/pair counts (streaming/vocab.py): union of partial
aggregates must equal the batch count over the union, survive replay and
compaction (the src_batch identity trick), and reproduce the catalog
queries' ranked tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.bpe import (
    pair_counts,
    tokens_col,
)
from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.vocab import (
    pair_counts_streamed,
    pair_ingest_batch,
    vocab_counts,
    vocab_ingest_batch,
    vocab_top,
)


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_vocab_equals_batch_on_union(spark, sf_dir, tmp_path):
    d = _docs(spark, sf_dir)
    idx = str(tmp_path / "vidx")
    run = vocab_ingest_batch(spark, idx)
    b0 = d.filter(F.col("doc_id") % 2 == 0)
    run(b0, 0)
    run(d.filter(F.col("doc_id") % 2 == 1), 1)

    want = _rows(
        d.select(F.explode(tokens_col(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert _rows(vocab_counts(spark, idx)) == want

    # replay batch 0: identical totals (partials overwrite their own dir)
    run(b0, 0)
    assert _rows(vocab_counts(spark, idx)) == want


def test_streamed_vocab_top_matches_catalog_query(spark, sf_dir, tmp_path):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    d = _docs(spark, sf_dir)
    idx = str(tmp_path / "vidx")
    run = vocab_ingest_batch(spark, idx)
    run(d.filter(F.col("doc_id") % 3 != 2), 0)
    run(d.filter(F.col("doc_id") % 3 == 2), 1)
    want = _rows(load_all()["vocab_top_tokens"].builder(spark, sf_dir))
    assert _rows(vocab_top(spark, idx, 200)) == want


def test_streamed_pairs_equal_batch_and_survive_compaction(
    spark, sf_dir, tmp_path
):
    d = _docs(spark, sf_dir)
    idx = str(tmp_path / "pidx")
    run = pair_ingest_batch(spark, idx, compact_every=2)
    b0 = d.filter(F.col("doc_id") % 3 == 0)
    run(b0, 0)
    run(d.filter(F.col("doc_id") % 3 == 1), 1)
    run(d.filter(F.col("doc_id") % 3 == 2), 2)  # triggers compaction

    want = _rows(
        pair_counts(d.select(tokens_col(F.col("text")).alias("toks")))
    )
    assert _rows(pair_counts_streamed(spark, idx)) == want

    # replay a compacted-away batch: the rewritten batch dir duplicates
    # rows already folded into base — the (key, src_batch) dedup absorbs
    # them, totals unchanged (the counter-index crash contract)
    run(b0, 0)
    assert _rows(pair_counts_streamed(spark, idx)) == want
