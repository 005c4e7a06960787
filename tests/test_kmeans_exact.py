"""Exact-integer Lloyd k-means (operators/kmeans_exact.py): bit-parity
with an independent numpy implementation of the closed-form spec,
partitioning-invariance, the keep-on-empty centroid rule, and the
full-oracle IVF probe's recall floor vs brute force."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.kmeans_exact import (
    exact_kmeans,
    ivf_det_topk,
    quantize,
)
from sparkstreaming_gmall_scala_spark.sources.tables import load_table


def _ref_kmeans(vecs, ids, k, iters):
    """Independent reference: the module docstring's spec, straight
    Python ints (no Spark, no DuckDB)."""
    order = np.argsort(ids, kind="stable")
    Q = [
        [int(math.floor(float(x) * 1e6 + 0.5)) for x in vecs[i]]
        for i in range(len(ids))
    ]
    cents = [list(Q[i]) for i in order[:k]]

    def assign(cents):
        out = []
        for q in Q:
            out.append(
                min(
                    (
                        sum((a - b) * (a - b) for a, b in zip(q, cents[j])),
                        j,
                    )
                    for j in range(k)
                )
            )
        return out

    for _ in range(iters):
        a = assign(cents)
        nxt = [list(c) for c in cents]
        for j in range(k):
            members = [i for i, (_, jj) in enumerate(a) if jj == j]
            if members:
                for p in range(len(Q[0])):
                    s = sum(Q[i][p] for i in members)
                    nxt[j][p] = int(math.floor(s / len(members) + 0.5))
        cents = nxt
    fin = assign(cents)
    return (
        {int(ids[i]): (fin[i][1], fin[i][0]) for i in range(len(ids))},
        cents,
    )


def test_numpy_parity_sf0001(spark, sf_dir):
    """Every (cluster, dist) assignment AND the final centroid matrix
    match the independent reference exactly on the real corpus."""
    e = load_table(spark, sf_dir, "embeddings")
    asg, cents = exact_kmeans(e, "vec_id", "embedding", k=4, iters=2)
    got = {r["vec_id"]: (r["cluster"], r["dist"]) for r in asg.collect()}

    pdf = e.select("vec_id", "embedding").toPandas()
    ref, ref_cents = _ref_kmeans(
        list(pdf["embedding"]), list(pdf["vec_id"]), k=4, iters=2
    )
    assert cents == ref_cents
    assert got == ref


def test_partitioning_invariance(spark, sf_dir):
    """Identical output from a 7-partition shuffle of the input — the
    integer argmin and decimal sums are order-free by construction."""
    e = load_table(spark, sf_dir, "embeddings")
    a1, c1 = exact_kmeans(e, "vec_id", "embedding", k=4, iters=2)
    a2, c2 = exact_kmeans(
        e.repartition(7), "vec_id", "embedding", k=4, iters=2
    )
    assert c1 == c2
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_empty_cluster_keeps_centroid(spark):
    """A seed duplicated elsewhere loses every member at the first
    assignment (ties go to the LOWEST cluster index), and its centroid
    must stay put rather than NaN/vanish — the COALESCE rule both
    engines implement."""
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),  # seed 1 == seed 0 ⇒ cluster 1 empties
        (2, [1.0, 1.0]),
        (3, [1.0, 1.0]),  # seed 3 == seed 2 ⇒ cluster 3 empties
        (4, [0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    asg, cents = exact_kmeans(df, "vec_id", "embedding", k=4, iters=2)
    # Trace: iter-1 ties send each duplicate to the LOWER index, so
    # clusters 1 and 3 empty and keep their seeds; centroid 0 moves to
    # mean{0,1,4}, after which the origin duplicates are CLOSER to the
    # kept seed centroid 1 — iter-2 reassigns them there and centroid 0
    # converges onto point 4 alone. Cluster 3 stays empty both rounds
    # (centroid 2 lands exactly on the duplicate pair, winning ties).
    assert cents == [
        [100_000, 0],          # mean of {4}
        [0, 0],                # recaptured the origin duplicates
        [1_000_000, 1_000_000],  # mean of {2, 3}
        [1_000_000, 1_000_000],  # empty both rounds: kept seed verbatim
    ]
    got = {r["vec_id"]: r["cluster"] for r in asg.collect()}
    # final assignment: ties on the identical centroids 2/3 go LOW
    assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 0}


def test_quantize_convention(spark):
    """floor(x·1e6 + 0.5) — half-up, negative-safe (floor, not trunc)."""
    df = spark.createDataFrame(
        [(0, [0.0000005, -0.0000005, -1.25])], ["vec_id", "embedding"]
    )
    q = quantize(df, "vec_id", "embedding").collect()[0]["q"]
    assert q == [1, 0, -1_250_000]


def test_kcenter_numpy_parity(spark, sf_dir):
    """Selected ids, selection order, and the full cover match an
    independent greedy implementation exactly."""
    from sparkstreaming_gmall_scala_spark.operators.kmeans_exact import (
        kcenter_greedy,
    )

    e = load_table(spark, sf_dir, "embeddings")
    cover, sel = kcenter_greedy(e, "vec_id", "embedding", m=5)
    got = {r["vec_id"]: (r["center_id"], r["dist"]) for r in cover.collect()}

    pdf = e.select("vec_id", "embedding").toPandas()
    ids = list(pdf["vec_id"])
    Q = {
        int(i): [int(math.floor(float(x) * 1e6 + 0.5)) for x in v]
        for i, v in zip(pdf["vec_id"], pdf["embedding"])
    }

    def d(a, b):
        return sum((x - y) * (x - y) for x, y in zip(Q[a], Q[b]))

    ref_sel = [min(ids)]
    for _ in range(4):
        # max of min-dist-to-selected, ties to the smallest id
        ref_sel.append(
            max(
                (i for i in ids),
                key=lambda i: (min(d(i, s) for s in ref_sel), -i),
            )
        )
    assert sel == ref_sel
    ref_cover = {}
    for i in ids:
        best = min(
            (d(i, s), step, s) for step, s in enumerate(ref_sel)
        )
        ref_cover[i] = (best[2], best[0])
    assert got == ref_cover


def test_kcenter_geometric(spark):
    """Four well-separated 2-D blobs + m=4 ⇒ greedy picks one exemplar
    per blob (the diversity guarantee) and the coverage radius is the
    intra-blob spread, not the inter-blob distance."""
    from sparkstreaming_gmall_scala_spark.operators.kmeans_exact import (
        kcenter_greedy,
    )

    blobs = {0: (0.0, 0.0), 1: (10.0, 0.0), 2: (0.0, 10.0), 3: (10.0, 10.0)}
    rows = []
    for b, (cx, cy) in blobs.items():
        for i in range(3):
            rows.append((b * 10 + i, [cx + 0.01 * i, cy]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cover, sel = kcenter_greedy(df, "vec_id", "embedding", m=4)
    assert sorted(i // 10 for i in sel) == [0, 1, 2, 3]
    radius = max(r["dist"] for r in cover.collect())
    # intra-blob spread: 0.02 units = 20000 micro-units, squared
    assert radius <= (20_000) ** 2


def test_semantic_dedup_det_witnesses(spark, sf_dir):
    """Soundness AND completeness of the keep-first rule against a
    brute-force recomputation: a doc is dropped iff some lower-id doc in
    its cell scores 6-dp cosine ≥ threshold against it."""
    from sparkstreaming_gmall_scala_spark.operators.kmeans_exact import (
        semantic_dedup_exact,
    )

    e = load_table(spark, sf_dir, "embeddings")
    out = semantic_dedup_exact(
        e, "vec_id", "embedding", threshold=0.30, k=4, iters=2, dim=64
    ).collect()
    cells = {r["vec_id"]: r["cell"] for r in out}
    keep = {r["vec_id"]: r["keep"] for r in out}
    assert len(out) == e.count()  # one row per doc
    assert not all(keep.values())  # the threshold bites on this corpus

    pdf = e.select("vec_id", "embedding").toPandas()
    V = {int(i): [float(x) for x in v]
         for i, v in zip(pdf["vec_id"], pdf["embedding"])}

    def _fold_dot(xs, ys):
        # left-to-right fold, matching the engines' summation order
        # bit-for-bit (np.dot pairwise summation can differ in the ulp)
        acc = 0.0
        for x, y in zip(xs, ys):
            acc += x * y
        return acc

    def score(a, b):
        c = _fold_dot(V[a], V[b]) / (
            math.sqrt(_fold_dot(V[a], V[a]))
            * math.sqrt(_fold_dot(V[b], V[b]))
        )
        return math.floor(c * 1e6 + 0.5) / 1e6

    ids = sorted(V)
    for j in ids:
        witness = any(
            cells[i] == cells[j] and score(i, j) >= 0.30
            for i in ids
            if i < j
        )
        assert keep[j] == (not witness), j


def test_ivf_det_recall_floor(spark, sf_dir):
    """nprobe=2 of 4 cells on the near-uniform corpus: recall@5 must
    beat the coverage floor's neighborhood (IVF's documented worst
    case ~nprobe/k) — and the result must be a per-query subset of the
    brute-force ranking restricted to the probed cells (checked
    implicitly by exactness elsewhere; here: recall + shape)."""
    from sparkstreaming_gmall_scala_spark.operators.similarity import (
        brute_force_topk,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    truth = brute_force_topk(e, q, "vec_id", "embedding", k=5, dim=64)
    got = ivf_det_topk(
        e, q, "vec_id", "embedding",
        k=5, clusters=4, iters=2, nprobe=2, dim=64,
    )
    t = {(r["query_id"], r["neighbor_id"]) for r in truth.collect()}
    g = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    assert len(g) == 50  # 10 queries × full top-5 (cells are never empty)
    assert len(t & g) / len(t) >= 0.4


def test_ivf_det_clustered_recall(spark, tmp_path):
    """On a mixture-of-Gaussians corpus (the RECALL.md clustered
    fixture's shape) the coarse quantizer concentrates true neighbors:
    nprobe=2 of 4 recall@5 ≥ 0.9."""
    from sparkstreaming_gmall_scala_spark.operators.similarity import (
        brute_force_topk,
    )
    from sparkstreaming_gmall_scala_spark.sources.synth import (
        clustered_embeddings_arrays,
    )

    vecs, labels = clustered_embeddings_arrays(
        n=400, dim=16, k_clusters=4, sigma=0.15, seed=42
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        ["vec_id", "embedding"],
    )
    q = df.filter(F.col("vec_id") < 10)
    truth = brute_force_topk(df, q, "vec_id", "embedding", k=5, dim=16)
    got = ivf_det_topk(
        df, q, "vec_id", "embedding",
        k=5, clusters=4, iters=2, nprobe=2, dim=16,
    )
    t = {(r["query_id"], r["neighbor_id"]) for r in truth.collect()}
    g = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    assert len(t & g) / len(t) >= 0.9
