"""Streaming per-cell mart (streaming/cells.py): live ≡ batch at every
prefix, replay idempotence, and the drift signal actually firing on a
shifted corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.kmeans_exact import (
    cluster_drift_frame,
    exact_kmeans,
)
from sparkstreaming_gmall_scala_spark.sources.tables import load_table
from sparkstreaming_gmall_scala_spark.streaming.cells import (
    cell_partial,
    cells_ingest_batch,
    cluster_drift_report,
    fold_cells,
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def frozen(spark, corpus):
    _, cents = exact_kmeans(corpus, "vec_id", "embedding", k=4, iters=2)
    return cents


def _report_rows(df):
    return sorted(map(tuple, df.collect()))


def _batch_report(spark, df, cents):
    """One-shot report over ``df`` under the frozen centroids — the
    ground truth each live prefix must reproduce."""
    folded = {
        (int(r["cell"]), int(r["pos"])): (int(r["s"]), int(r["n"]))
        for r in cell_partial(df, cents).collect()
    }
    return cluster_drift_report(spark, cents, folded)


def test_live_equals_batch_at_every_prefix(spark, corpus, frozen, tmp_path):
    idx = str(tmp_path / "cells")
    body = cells_ingest_batch(spark, idx, frozen)
    batches = [
        corpus.filter(F.pmod(F.hash("vec_id"), F.lit(3)) == i)
        for i in range(3)
    ]
    seen = None
    for i, b in enumerate(batches):
        body(b, i)
        seen = b if seen is None else seen.unionByName(b)
        live = cluster_drift_report(spark, frozen, fold_cells(spark, idx))
        assert _report_rows(live) == _report_rows(
            _batch_report(spark, seen, frozen)
        ), f"prefix {i}"


def test_replay_is_idempotent(spark, corpus, frozen, tmp_path):
    idx = str(tmp_path / "cells")
    body = cells_ingest_batch(spark, idx, frozen)
    b0 = corpus.filter(F.pmod(F.hash("vec_id"), F.lit(2)) == 0)
    b1 = corpus.filter(F.pmod(F.hash("vec_id"), F.lit(2)) == 1)
    body(b0, 0)
    body(b1, 1)
    before = _report_rows(
        cluster_drift_report(spark, frozen, fold_cells(spark, idx))
    )
    body(b1, 1)  # crash-replay of the committed batch
    after = _report_rows(
        cluster_drift_report(spark, frozen, fold_cells(spark, idx))
    )
    assert before == after


def test_full_ingest_matches_batch_entry(spark, corpus, frozen, tmp_path):
    """After all batches, the live report equals cluster_drift_frame on
    the whole corpus (whose internal centroids are the same frozen ones
    — same corpus, same closed-form recurrence)."""
    idx = str(tmp_path / "cells")
    body = cells_ingest_batch(spark, idx, frozen)
    for i in range(3):
        body(corpus.filter(F.pmod(F.hash("vec_id"), F.lit(3)) == i), i)
    live = cluster_drift_report(spark, frozen, fold_cells(spark, idx))
    batch = cluster_drift_frame(corpus, "vec_id", "embedding", k=4, iters=2)
    assert _report_rows(live) == _report_rows(batch)


def test_drift_fires_on_shifted_corpus(spark, corpus, frozen, tmp_path):
    """Freeze-time drift is small (one extra Lloyd step on a converging
    run); streaming in a SHIFTED copy of the corpus must strictly grow
    total drift² — the monitor's whole point."""
    idx = str(tmp_path / "cells")
    body = cells_ingest_batch(spark, idx, frozen)
    body(corpus, 0)
    base = sum(
        r["drift2"]
        for r in cluster_drift_report(
            spark, frozen, fold_cells(spark, idx)
        ).collect()
    )
    shifted = corpus.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, x -> CAST(x + 0.5 AS FLOAT))"
        ).alias("embedding"),
    )
    body(shifted, 1)
    after = sum(
        r["drift2"]
        for r in cluster_drift_report(
            spark, frozen, fold_cells(spark, idx)
        ).collect()
    )
    assert after > base
