"""Arrow outer-product Gram kernel (r14 verdict #5): the mapInPandas
int64-matmul + big-int-fold path must carry the EXACT same integers as
the posexplode reference — cell-for-cell, moment-for-moment, and
through the full centered audit. The kernel is the headline/ingest
route; the explode path stays as the oracle-shaped reference."""

from __future__ import annotations

import numpy as np

from sparkstreaming_gmall_scala_spark.operators.spectral import (
    collect_moments,
    collect_moments_fast,
    gram_cells_kernel,
    pca_audit,
)
from sparkstreaming_gmall_scala_spark.sources.synth import (
    clustered_embeddings_arrays,
)
from sparkstreaming_gmall_scala_spark.streaming.spectral import (
    gram_partial,
    gram_partial_kernel,
)


def _df(spark, vecs):
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _mixed_sign_vecs(n=300):
    """Clustered fixture shifted to guarantee NEGATIVE components — the
    trunc-vs-floor and object-fold sign paths must both be exercised."""
    vecs, _ = clustered_embeddings_arrays(n=n)
    vecs = vecs.astype(np.float64)
    vecs[:, ::2] -= 0.8
    return vecs


def _cells(df):
    return {(int(r["i"]), int(r["j"])): int(r["s"]) for r in df.collect()}


def test_kernel_cells_equal_posexplode_reference(spark):
    e = _df(spark, _mixed_sign_vecs()).repartition(7)  # multi-partition fold
    ref = _cells(gram_partial(e))
    got = _cells(
        gram_cells_kernel(e).groupBy("i", "j").sum("s").withColumnRenamed(
            "sum(s)", "s"
        )
    )
    assert got == ref
    assert len(ref) == 64 * 64


def test_streaming_kernel_partial_matches_reference(spark):
    e = _df(spark, _mixed_sign_vecs(n=150))
    assert _cells(gram_partial_kernel(e)) == _cells(gram_partial(e))


def test_collect_moments_fast_matches_reference(spark):
    e = _df(spark, _mixed_sign_vecs()).repartition(5)
    n_ref, mu_ref, gram_ref = collect_moments(e)
    n_k, mu_k, gram_k = collect_moments_fast(e)
    assert (n_k, mu_k) == (n_ref, mu_ref)
    assert gram_k == gram_ref
    # cross-check one moment against numpy's exact integers — the
    # DataFrame stores array<float>, so replicate the float32 round-trip
    # before the float64 quantization
    q = np.floor(
        _mixed_sign_vecs().astype(np.float32).astype(np.float64) * 1e6 + 0.5
    ).astype(object)
    assert n_ref == q.shape[0]
    assert mu_ref == [int(x) for x in q.sum(axis=0)]


def test_pca_audit_identical_through_either_path(spark):
    e = _df(spark, _mixed_sign_vecs(n=200))
    v_k, share_k = pca_audit(e, use_kernel=True)
    v_r, share_r = pca_audit(e, use_kernel=False)
    assert v_k == v_r and share_k == share_r


def test_gram_fast_power_iteration_equals_data_pass_audit(spark):
    """r16 (r15 verdict #1a): embed_spectral_audit now collects M via
    the Arrow kernel and iterates driver-side — must equal the per-round
    data-pass reference (power_iteration_audit) integer-for-integer."""
    from sparkstreaming_gmall_scala_spark.operators.spectral import (
        collect_gram_fast,
        power_iteration_audit,
        power_iteration_from_gram,
    )

    e = _df(spark, _mixed_sign_vecs(n=200)).repartition(5)
    gram = collect_gram_fast(e)
    v_fast, share_fast = power_iteration_from_gram(gram, dim=64, iters=3)
    v_ref, share_ref = power_iteration_audit(e, "vec_id", "embedding", dim=64)
    assert v_fast == v_ref and share_fast == share_ref
