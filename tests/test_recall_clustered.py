"""ANN recall floors on CLUSTERED embeddings (round-7 verdict #5).

The driver's synthetic embeddings are near-uniform, which caps every
pruning index at its coverage fraction and makes the uniform-data floors
(test_similarity.py) uninformative about real corpora. This file runs the
same catalog ANN builders over the deterministic mixture-of-Gaussians
fixture (sources/synth.py — seeded numpy, no RNG at query time) and
enforces the much higher floors cluster structure buys:

  measured at n=1500 / 8 centers / sigma 0.15 / seed 42:
    knn_lsh 0.82, knn_ivf 1.00, knn_pq 1.00, knn_ivf_pq 1.00

Everything end to end is deterministic (seeded fixture, hash-seeded
quantizers), so these are exact reproductions, not flaky samples; floors
sit a margin below the measured values only to survive intentional
parameter retuning, not noise. The IVF-PQ floor is the round-8 headline:
raw-vector PQ codes scored 0.48 here — residual encoding (faiss
IndexIVFPQ) plus 8-bit codebooks is what holds it at 1.0.
"""

from __future__ import annotations

import pytest

from sparkstreaming_gmall_scala_spark.plans.catalog import load_all


@pytest.fixture(scope="module")
def clustered_dir(tmp_path_factory):
    from sparkstreaming_gmall_scala_spark.sources.synth import (
        write_clustered_embeddings,
    )

    return write_clustered_embeddings(
        str(tmp_path_factory.mktemp("clustered")), n=1500
    )


@pytest.fixture(scope="module")
def truth(spark, clustered_dir):
    t: dict[int, set[int]] = {}
    rows = load_all()["knn_bruteforce"].builder(spark, clustered_dir).collect()
    for r in rows:
        t.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return t


@pytest.mark.parametrize(
    "name,floor",
    [
        ("knn_lsh", 0.7),
        ("knn_ivf", 0.9),
        ("knn_pq", 0.9),
        ("knn_ivf_pq", 0.9),
        ("knn_sq8", 0.9),
        # round-9 IVF-SQ8 (directional cells × residual SQ8): measured
        # 1.00 on this fixture and 0.76 uniform (vs ivf_pq's 0.62)
        ("knn_ivf_sq8", 0.9),
        # r15 multi-probe operating point (nprobe 6 of 8): ≥ the
        # nprobe=3 sibling by construction (superset of probed cells)
        ("knn_ivf_probe6", 0.9),
    ],
)
def test_clustered_recall_floor(spark, clustered_dir, truth, name, floor):
    got: dict[int, set[int]] = {}
    for r in load_all()[name].builder(spark, clustered_dir).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    recall = hits / total
    assert recall >= floor, f"{name}: clustered recall {recall:.3f} < {floor}"


def test_clustered_fixture_is_deterministic(tmp_path):
    """Same seed ⇒ byte-identical fixture (the no-RNG-at-measure-time
    discipline RECALL.md's reproducibility claim rests on)."""
    from sparkstreaming_gmall_scala_spark.sources.synth import (
        clustered_embeddings_arrays,
    )

    va, la = clustered_embeddings_arrays(n=200)
    vb, lb = clustered_embeddings_arrays(n=200)
    assert (va == vb).all() and (la == lb).all()
    # and clusters genuinely separate ANGULARLY (the ANN family ranks by
    # cosine): a point's cosine to its own center must far exceed any
    # cross-center cosine. (Euclidean noise norm σ√dim ≈ 1.2 is NOT small
    # next to the √2 inter-center distance — it's the 64-dim angular
    # concentration that makes true neighbors intra-cluster.)
    import numpy as np

    centers = np.stack([va[la == c].mean(axis=0) for c in range(8)])
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    unit = va / np.linalg.norm(va, axis=1, keepdims=True)
    own = np.array([unit[i] @ centers[la[i]] for i in range(len(unit))])
    cross = (centers @ centers.T)[np.triu_indices(8, 1)]
    assert own.mean() > 0.5
    assert np.abs(cross).max() < 0.35
