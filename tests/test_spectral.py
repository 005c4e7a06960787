"""Exact-integer power-iteration spectral audit (operators/spectral.py):
convergence on the pathology it exists to catch, numpy agreement, and
the exact-arithmetic invariants."""

from __future__ import annotations

import numpy as np

from sparkstreaming_gmall_scala_spark.operators.spectral import (
    _tdiv,
    power_iteration_audit,
)
from sparkstreaming_gmall_scala_spark.sources.synth import (
    clustered_embeddings_arrays,
)


def _df(spark, vecs):
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_mean_dominated_corpus_converges_to_numpy(spark):
    """The audit's target pathology: an UNCENTERED corpus whose common
    mean component dominates (the ABTT/whitening case). λ₁ ≫ λ₂, so 3
    power steps align with numpy's exact top eigenvector and the
    dominant share reads high."""
    vecs, _ = clustered_embeddings_arrays(n=600)
    offset = np.ones(64, dtype=np.float64) / 4.0
    vecs = vecs.astype(np.float64) + offset
    v, share_ppm = power_iteration_audit(_df(spark, vecs))

    A = np.floor(vecs * 1e6 + 0.5)
    M = A.T @ A
    evals, evecs = np.linalg.eigh(M)
    vt = evecs[:, -1]
    vv = np.array(v, dtype=np.float64)
    cos = abs(vv @ vt) / (np.linalg.norm(vv) * np.linalg.norm(vt))
    assert cos > 0.99, cos
    true_share = evals[-1] / np.trace(M)
    assert true_share > 0.5  # the fixture really is mean-dominated
    # Rayleigh share is a lower bound on the true share and close to it
    assert 0 < share_ppm / 1e6 <= true_share + 1e-9
    assert share_ppm / 1e6 > 0.9 * true_share


def test_spread_corpus_reads_low_share(spark):
    """A well-spread (near-isotropic) corpus must NOT read as
    anisotropic: the estimated dominant share stays near 1/dim."""
    vecs, _ = clustered_embeddings_arrays(n=600)
    _, share_ppm = power_iteration_audit(_df(spark, vecs))
    assert share_ppm / 1e6 < 0.25


def test_vector_is_ppm_normalized_ints(spark):
    vecs, _ = clustered_embeddings_arrays(n=200)
    v, _ = power_iteration_audit(_df(spark, vecs))
    assert len(v) == 64
    assert all(isinstance(x, int) for x in v)
    assert max(abs(x) for x in v) == 1_000_000  # max component pins ppm


def test_tdiv_truncates_toward_zero():
    assert _tdiv(7, 2) == 3 and _tdiv(-7, 2) == -3
    assert _tdiv(0, 5) == 0
    import pytest

    with pytest.raises(ValueError):
        _tdiv(1, 0)


def _pca(spark, vecs):
    from sparkstreaming_gmall_scala_spark.operators.spectral import (
        pca_audit,
    )

    return pca_audit(_df(spark, vecs))


def test_pca_converges_on_variance_dominated_corpus(spark):
    """A corpus that VARIES along one line: centered top direction =
    that line; 3 steps align with numpy's exact top eigenvector of
    B = n*M - mu mu^T and the PCA share reads high."""
    rng_vecs, _ = clustered_embeddings_arrays(n=400, sigma=0.05)
    u = np.ones(64) / 8.0
    signs = np.where(np.arange(400) % 2 == 0, 1.0, -1.0)
    vecs = 0.05 * rng_vecs.astype(np.float64) + signs[:, None] * u
    v, share_ppm = _pca(spark, vecs)

    A = np.floor(vecs * 1e6 + 0.5)
    n = A.shape[0]
    M = A.T @ A
    mu = A.sum(axis=0)
    B = n * M - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(B)
    vt = evecs[:, -1]
    vv = np.array(v, dtype=np.float64)
    cos = abs(vv @ vt) / (np.linalg.norm(vv) * np.linalg.norm(vt))
    assert cos > 0.99, cos
    assert share_ppm / 1e6 > 0.5


def test_pca_vs_raw_classify_the_mean_pathology(spark):
    """The signature distinction between the two audits: an OFFSET
    (mean-dominated) corpus fires the raw Gram audit but NOT the
    centered one — centering removes exactly the mean direction."""
    base, _ = clustered_embeddings_arrays(n=400)
    vecs = base.astype(np.float64) + np.ones(64) / 4.0
    _, raw_share = power_iteration_audit(_df(spark, vecs))
    _, pca_share = _pca(spark, vecs)
    assert raw_share / 1e6 > 0.5  # mean-dominated: raw fires
    assert pca_share / 1e6 < 0.3  # centering removes it
    # and on the spread corpus both stay low
    _, raw2 = power_iteration_audit(_df(spark, base))
    _, pca2 = _pca(spark, base)
    assert raw2 / 1e6 < 0.25 and pca2 / 1e6 < 0.3
