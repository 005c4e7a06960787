"""Exact-integer spectral audit of an embedding matrix.

Dominant right-singular direction of the (quantized) embedding matrix A
via POWER ITERATION on M = AᵀA, with every number an exact integer so
the result is bit-identical under any partitioning and any engine:

* embeddings quantize once to micro-units (``floor(x·1e6 + 0.5)``),
* each iteration is two exact passes — ``u = A·v`` (per-row dot against
  the 64 broadcast literals of v) and ``w = Aᵀ·u`` (64 DECIMAL(38,0)
  sums in ONE aggregate, no shuffle wider than a single row),
* the 64-component normalization ``v ← (w·1e6) div max|w|`` happens
  driver-side in Python big-int arithmetic (trunc-toward-zero division,
  the holt_forecast discipline, so DuckDB's ``//`` reproduces it),
* the returned quality figure is the exact Rayleigh share
  ``λ/trace(M) = |A·v|²·1e6 div (vᵀv · Σ‖rowᵢ‖²)`` in ppm.

Why a training-data pipeline wants it: a healthy embedding corpus
spreads energy across directions; a collapsed/anisotropic one
concentrates it (the "dominant direction" pathology — common after
contrastive-training failures and the reason whitening/ABTT
post-processing exists). ``dominant_share_ppm`` is that diagnostic as
one exact number; the eigenvector itself localizes the direction.

Magnitude budget (documented so the DECIMAL(38,0) sums provably fit):
|q| ≤ 2e6 (unit-ish embeddings), |v| ≤ 1e6 ⇒ |u| ≤ 64·2e12 ≈ 1.3e14;
|w| ≤ n·2e6·1.3e14 ≈ n·2.6e20 — inside 1e38 up to n ≈ 4e17 rows;
|A·v|² sums ≤ n·1.7e28 — inside 1e38 up to n ≈ 6e9 rows (a 100 TB
embedding table is ~1e9-1e10 rows; beyond that, drop the quantization
to 1e5 units).

Convergence is the standard power-iteration story (rate = λ₂/λ₁ per
step); THREE fixed steps are a deterministic ESTIMATE, and the oracle
computes the identical estimate — exactness here is about the
computation, not eigen-convergence. Near-flat spectra (a well-spread
corpus — including this repo's synthetic fixtures, by design)
under-estimate the top direction; the pathological corpora the audit
exists to catch are mean-dominated/collapsed, where λ₁ ≫ λ₂ and 3
steps align with numpy's true top eigenvector to cosine > 0.99
(pinned on an offset fixture in tests/test_spectral.py).

Reference: no counterpart (north-star embedding-quality op; the
fixed-iteration exact-integer discipline is operators/pagerank.py's).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (DuckDB ``//`` semantics
    for the signs we use; Python ``//`` floors, which differs for
    negative numerators — the holt_forecast lesson)."""
    if b <= 0:
        raise ValueError("divisor must be positive")
    return a // b if a >= 0 else -((-a) // b)


def power_iteration_from_gram(
    gram: dict[tuple[int, int], int],
    dim: int = 64,
    iters: int = 3,
    share_scale: int = 1,
):
    """The SAME power iteration evaluated from a materialized integer
    Gram matrix M = AᵀA (``gram[(i, j)]`` 1-indexed): w = M·v replaces
    the two data passes, everything else — seed, trunc-div
    normalization, Rayleigh share — is identical arithmetic, so the
    result equals ``power_iteration_audit`` on the same rows EXACTLY
    (w_d = Σ_e M_de·v_e = Σ_i q_id·(q_i·v) by integer associativity;
    num = |A·v|² = vᵀMv). This is the live twin's read side: M is an
    additive integer monoid over row outer-products, so a streaming
    mart of per-batch Gram partials folds to the identical M."""
    m = [[gram.get((i + 1, j + 1), 0) for j in range(dim)] for i in range(dim)]
    v = [1_000_000] * dim

    def matvec(vec):
        return [sum(m[d][e] * vec[e] for e in range(dim)) for d in range(dim)]

    for _ in range(iters):
        w = matvec(v)
        mx = max(max(abs(x) for x in w), 1)
        v = [_tdiv(x * 1_000_000, mx) for x in w]
    # The Rayleigh share is scale-invariant in v, so it can be computed
    # from a coarsened copy (share_scale > 1) when the matrix entries
    # are large — the centered audit's move to keep the ORACLE's HUGEINT
    # arithmetic inside 2^127 while v itself stays full ppm precision.
    vs = [_tdiv(x, share_scale) for x in v]
    mvs = matvec(vs)
    num = sum(vs[d] * mvs[d] for d in range(dim))
    trace = sum(m[d][d] for d in range(dim))
    den = sum(x * x for x in vs)
    share_ppm = _tdiv(num * 1_000_000, max(den * trace, 1))
    return v, share_ppm


def collect_moments(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
):
    """One pass over the quantized frame → ``(n, mu, gram)``: row count,
    the 64 exact column sums, and the 4096 exact Gram cells (as a
    {(i, j): int} dict). These three are everything the CENTERED audit
    needs: n²·Cov = n·M − μμᵀ, all integers."""
    q = emb.select(
        F.expr(
            f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) "
            "* 1000000 + 0.5) AS BIGINT))"
        ).alias("q")
    )
    left = q.select(F.posexplode("q").alias("i0", "qi"), F.col("q"))
    cells = left.select(
        (F.col("i0") + 1).alias("i"), "qi",
        F.posexplode("q").alias("j0", "qj"),
    )
    gram_rows = (
        cells.groupBy("i", (F.col("j0") + 1).alias("j"))
        .agg(
            F.sum(
                F.col("qi").cast("decimal(38,0)") * F.col("qj")
            ).alias("s")
        )
        .collect()
    )
    gram = {(int(r["i"]), int(r["j"])): int(r["s"]) for r in gram_rows}
    mu_row = q.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(
                F.element_at("q", d + 1).cast("decimal(38,0)")
            ).alias(f"m{d}")
            for d in range(dim)
        ],
    ).first()
    n = int(mu_row["n"])
    mu = [int(mu_row[f"m{d}"]) for d in range(dim)]
    return n, mu, gram


def centered_matrix(
    n: int, mu: list[int], gram: dict, dim: int = 64
) -> dict:
    """B = n·M − μμᵀ — the n²-scaled covariance, exact integers. Top
    eigenvector of B = the true PCA direction (centering removes the
    mean component the raw Gram audit is dominated by)."""
    return {
        (i + 1, j + 1): n * gram.get((i + 1, j + 1), 0) - mu[i] * mu[j]
        for i in range(dim)
        for j in range(dim)
    }


def pca_audit(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 3,
):
    """The CENTERED spectral audit — the true PCA top direction: one
    distributed pass collects (n, μ, M), the driver builds the exact
    integer B = n·M − μμᵀ (= n²·Cov) and runs the same trunc-div power
    iteration on it. Centering is what separates 'the corpus has a big
    mean component' (the raw Gram audit fires, this one doesn't) from
    'the corpus VARIES along one direction' (both fire) — the pair is
    pinned against each other in tests/test_spectral.py. The Rayleigh
    share uses a //1000-coarsened v (share_scale) so the cross-engine
    oracle's HUGEINT arithmetic provably fits; v itself is full ppm."""
    n, mu, gram = collect_moments(emb, vec_col, dim)
    b = centered_matrix(n, mu, gram, dim)
    return power_iteration_from_gram(
        b, dim=dim, iters=iters, share_scale=1000
    )


def power_iteration_audit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 3,
):
    """Run the exact-integer power iteration; returns
    ``(v, dominant_share_ppm)`` where ``v`` is the ppm-normalized
    integer eigenvector estimate (list of ``dim`` Python ints) and the
    share is the Rayleigh quotient over the trace, in ppm."""
    q = emb.select(
        F.col(id_col).alias("_id"),
        F.expr(
            f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) "
            "* 1000000 + 0.5) AS BIGINT))"
        ).alias("q"),
    ).persist()
    q.count()  # one materialization serves every pass below

    def u_col(v: list[int]):
        lits = F.array(*[F.lit(int(x)) for x in v])
        # q·v: per-element products ≤ 2e12, 64-term sum ≤ 1.3e14 — long
        return F.aggregate(
            F.zip_with("q", lits, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    v = [1_000_000] * dim
    for _ in range(iters):
        with_u = q.select("q", u_col(v).alias("_u"))
        row = with_u.agg(
            *[
                F.sum(
                    F.element_at("q", d + 1).cast("decimal(38,0)")
                    * F.col("_u")
                ).alias(f"w{d}")
                for d in range(dim)
            ]
        ).first()
        w = [int(row[f"w{d}"]) for d in range(dim)]
        mx = max(max(abs(x) for x in w), 1)
        v = [_tdiv(x * 1_000_000, mx) for x in w]

    final = q.select("q", u_col(v).alias("_u")).agg(
        F.sum(
            F.col("_u").cast("decimal(38,0)") * F.col("_u")
        ).alias("num"),
        F.sum(
            F.aggregate(
                "q",
                F.lit(0).cast("decimal(38,0)"),
                lambda acc, x: acc + x.cast("decimal(38,0)") * x,
            )
        ).alias("trace"),
    ).first()
    q.unpersist()
    num, trace = int(final["num"]), int(final["trace"])
    den = sum(x * x for x in v)
    share_ppm = _tdiv(num * 1_000_000, max(den * trace, 1))
    return v, share_ppm
