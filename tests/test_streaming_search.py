"""Live BM25 postings-index pins: split invariance (any batching of the
corpus yields the batch query's exact top-k — idf/avgdl re-fold over the
union), replay idempotence, incremental re-ranking as the corpus grows,
and the catalog twin's equality with bm25_search
(streaming/search.py)."""

from __future__ import annotations

import random

QUERY = ("spark", "stream", "window")


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(seed, n):
    rng = random.Random(seed)
    vocab = ["spark", "stream", "window", "table", "row", "agg", "join"]
    return [
        (
            i,
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 30))),
        )
        for i in range(n)
    ]


def _drive(spark, tmp_path, batches, replay=(), compact_every=None):
    from sparkstreaming_gmall_scala_spark.streaming.search import (
        bm25_ingest_batch,
    )

    d = str(tmp_path / "bm25")
    body = bm25_ingest_batch(spark, d, QUERY, compact_every=compact_every)
    for bid, rows in enumerate(batches):
        body(_frame(spark, rows), bid)
        if bid in replay:
            body(_frame(spark, rows), bid)
    return d


def _live(spark, d):
    from sparkstreaming_gmall_scala_spark.streaming.search import (
        bm25_search_live,
    )

    return [
        tuple(r) for r in bm25_search_live(spark, d, QUERY).collect()
    ]


def _batch(spark, rows):
    from sparkstreaming_gmall_scala_spark.operators.textstats import (
        bm25_rank,
    )

    return [
        tuple(r)
        for r in bm25_rank(
            _frame(spark, rows), "doc_id", "text", QUERY
        ).collect()
    ]


def test_live_topk_equals_batch_over_random_splits(spark, tmp_path):
    rows = _corpus(3, 120)
    rng = random.Random(33)
    batches = [[], [], [], []]
    for r in rows:
        batches[rng.randrange(4)].append(r)
    d = _drive(spark, tmp_path, batches, replay={2})
    assert _live(spark, d) == _batch(spark, rows)


def test_index_grows_and_reranks_incrementally(spark, tmp_path):
    """idf/avgdl are corpus-level: after more docs arrive, the live
    read must equal the batch answer over the ENLARGED corpus, not a
    stale mix — i.e. stats re-fold, they are not frozen at ingest."""
    first, second = _corpus(7, 60), [
        (1000 + i, t) for i, t in enumerate(
            t for _, t in _corpus(8, 60)
        )
    ]
    from sparkstreaming_gmall_scala_spark.streaming.search import (
        bm25_ingest_batch,
    )

    d = str(tmp_path / "bm25grow")
    body = bm25_ingest_batch(spark, d, QUERY)
    body(_frame(spark, first), 0)
    assert _live(spark, d) == _batch(spark, first)
    body(_frame(spark, second), 1)
    assert _live(spark, d) == _batch(spark, first + second)


def test_catalog_twin_matches_batch_query(spark, sf_dir):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    reg = load_all()
    batch = [
        tuple(r) for r in reg["bm25_search"].builder(spark, sf_dir).collect()
    ]
    live = [
        tuple(r)
        for r in reg["bm25_search_live"].builder(spark, sf_dir).collect()
    ]
    assert live == batch
