"""IVF-SQ8 semantics (round 9, verdict #3): the cell-pruned scalar-
quantized ANN path — recall floors, partition pruning on the persisted
index, entry-level caching determinism, and index/probe agreement on the
directional cell assignment. The flat-SQ8 exactness contract lives in
tests/test_similarity.py; the clustered-fixture floor in
tests/test_recall_clustered.py."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.similarity import (
    brute_force_topk,
    kmeans_centroids,
)
from sparkstreaming_gmall_scala_spark.operators.sq import (
    _ivf_residual_frame,
    _unit_centroids,
    ivf_sq8_encode,
    ivf_sq8_topk,
    sq8_bounds,
)
from sparkstreaming_gmall_scala_spark.sources import load_table


def _build(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(e, "embedding", k=8, iters=2, id_col="vec_id")
    bounds = sq8_bounds(
        _ivf_residual_frame(e, "vec_id", "embedding", cents), "res"
    )
    return e, cents, bounds


def test_ivf_sq8_recall_and_partition_pruning(spark, sf_dir, tmp_path):
    """Reranked recall clears the uniform-corpus floor at nprobe=4/8
    (coverage-bounded — the clustered fixture is the operating point),
    the persisted cell-partitioned index serves an identical result to
    the in-memory frame, and the probe's scan carries a PartitionFilter
    on cell — unprobed cell directories are never read."""
    e, cents, bounds = _build(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < 10)
    index = ivf_sq8_encode(e, "vec_id", "embedding", cents, bounds)

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(
            e, queries, "vec_id", "embedding", k=5
        ).collect()
    }
    mem_rows = ivf_sq8_topk(
        index, queries, "vec_id", "embedding", cents, bounds,
        k=5, nprobe=4, rerank=e, shortlist=128,
    ).collect()
    mem = {(r["query_id"], r["neighbor_id"]) for r in mem_rows}
    recall = len(exact & mem) / len(exact)
    assert recall >= 0.5, f"recall {recall:.2f}"

    idx_dir = str(tmp_path / "ivfsq8")
    index.write.partitionBy("cell").parquet(idx_dir)
    persisted = spark.read.parquet(idx_dir)
    per_df = ivf_sq8_topk(
        persisted, queries, "vec_id", "embedding", cents, bounds,
        k=5, nprobe=4, rerank=e, shortlist=128,
    )
    per_rows = per_df.collect()
    assert sorted(map(tuple, per_rows)) == sorted(map(tuple, mem_rows))
    # the reranked result materializes driver-side (r10: bounded-refine
    # probe shape), so the partition-pruning pin reads the LAZY
    # approx-only probe plan — same pruned index scan either way
    lazy = ivf_sq8_topk(
        persisted, queries, "vec_id", "embedding", cents, bounds,
        k=5, nprobe=4, rerank=None,
    )
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    # identify the index scan by its column set, not the path — Spark
    # truncates the Location string to ~100 chars and pytest tmp paths
    # are long enough to cut the directory name off
    scan_lines = [
        l for l in plan.split("\n")
        if "Scan parquet" in l and "_cnorm" in l and "cell#" in l
    ]
    assert any(
        "cell" in l
        and "PartitionFilters: [" in l
        and "cell#" in l.split("PartitionFilters:")[1][:200]
        for l in scan_lines
    ), plan[:3000]


def test_ivf_sq8_entry_cached_and_deterministic(spark, sf_dir):
    """The knn_ivf_sq8 catalog entry: a second call serves the cached
    /tmp index and returns the identical ranking (deterministic
    quantizers — hash-ordered k-means sample, exact residual bounds)."""
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    reg = load_all()
    a = sorted(tuple(r) for r in reg["knn_ivf_sq8"].builder(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in reg["knn_ivf_sq8"].builder(spark, sf_dir).collect())
    assert a == b
    assert len(a) == 50  # 10 queries × top-5


def test_directional_assignment_index_probe_agree(spark, sf_dir):
    """The index side (_directional_cell: Column argmax of dot(x, ĉ),
    ties → lowest index via array_position) and the probe side (numpy
    stable argsort of −q·ĉᵀ) must rank cells identically — a query
    vector placed in the corpus probes its own cell first."""
    e, cents, bounds = _build(spark, sf_dir)
    assigned = {
        r["vec_id"]: r["cell"]
        for r in _ivf_residual_frame(e, "vec_id", "embedding", cents)
        .select("vec_id", "cell")
        .collect()
    }
    rows = e.select("vec_id", "embedding").collect()
    u = np.asarray(_unit_centroids(cents), dtype=np.float64)
    for r in rows[:200]:
        x = np.array(r["embedding"], dtype=np.float64)
        best = int(np.argsort(-(x @ u.T), kind="stable")[0])
        assert assigned[r["vec_id"]] == best, r["vec_id"]


def test_ivf_sq8_reconstruction_norm(spark, sf_dir):
    """_cnorm stored at build time equals ||centroid[cell] +
    decode(codes)|| recomputed locally (the probe divides by it, so a
    drifted norm silently mis-ranks)."""
    e, cents, bounds = _build(spark, sf_dir)
    index = ivf_sq8_encode(e, "vec_id", "embedding", cents, bounds)
    mn = np.array([b[0] for b in bounds])
    diff = np.array([float(b[1]) - float(b[0]) for b in bounds])
    c_arr = np.asarray(cents, dtype=np.float64)
    for r in index.limit(50).collect():
        dec = mn + np.array(r["codes"], dtype=np.float64) * diff / 255.0
        recon = c_arr[r["cell"]] + dec
        assert abs(float(np.sqrt((recon * recon).sum())) - r["_cnorm"]) < 1e-6
