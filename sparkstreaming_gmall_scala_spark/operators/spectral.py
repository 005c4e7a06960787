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


def gram_cells_kernel(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    with_moments: bool = False,
) -> DataFrame:
    """Arrow outer-product kernel for the Gram/moments pass (r14 verdict
    #5). Quantization stays JVM-side (the same ``transform`` expression
    as the posexplode reference, so the integers are identical by
    construction); each ``mapInPandas`` partition then accumulates
    qᵀq as ONE int64 numpy matmul per Arrow batch and folds batches
    into exact Python big-ints (object dtype — the DECIMAL(38,0) fold
    guard: a long-lived partition can never silently wrap int64), and
    emits its ≤ dim²+dim+1 partial cells as DECIMAL(38,0) rows for a
    tiny JVM-side sum. Identical integers to the posexplode reference
    by associativity of integer addition (pinned in
    tests/test_spectral_kernel.py), ~an order of magnitude less work:
    the explode path materializes n·dim² cell rows through the
    aggregate, the kernel one BLAS-shaped matmul per Arrow batch.

    ``with_moments`` adds (i=0, j=0) → n and (i=d, j=0) → Σ q_d rows so
    ONE pass carries everything the centered audit needs.

    Per-batch int64 safety: |q| ≤ 2e6 ⇒ |q_i·q_j| ≤ 4e12; Arrow batches
    are ≤ 10k rows (spark.sql.execution.arrow.maxRecordsPerBatch) ⇒
    per-batch cell sums ≤ 4e16 ≪ 2^63. The cross-batch fold is object
    arithmetic, so the only hard ceiling is DECIMAL(38,0) itself —
    checked loudly before emitting."""
    import pandas as pd

    q = emb.select(
        F.expr(
            f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) "
            "* 1000000 + 0.5) AS BIGINT))"
        ).alias("q")
    )

    def part(batches):
        import decimal

        import numpy as np

        total = None
        mu = None
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.asarray(
                [np.asarray(r, dtype=np.int64) for r in pdf["q"]],
                dtype=np.int64,
            )
            partial = m.T @ m  # int64-exact at Arrow batch size
            colsum = m.sum(axis=0, dtype=np.int64)
            if total is None:
                total = partial.astype(object)
                mu = colsum.astype(object)
            else:
                total += partial  # object + int64 → Python big-int
                mu += colsum
            n += m.shape[0]
        if total is None:
            return
        if int(np.abs(total).max()) >= 10**38:
            raise OverflowError(
                "Gram partial exceeds DECIMAL(38,0) — drop the "
                "quantization scale (module docstring magnitude budget)"
            )
        d = total.shape[0]
        ii, jj, ss = [], [], []
        for i in range(d):
            for j in range(d):
                ii.append(i + 1)
                jj.append(j + 1)
                ss.append(decimal.Decimal(int(total[i, j])))
        if with_moments:
            ii.append(0)
            jj.append(0)
            ss.append(decimal.Decimal(n))
            for i in range(d):
                ii.append(i + 1)
                jj.append(0)
                ss.append(decimal.Decimal(int(mu[i])))
        yield pd.DataFrame({"i": ii, "j": jj, "s": ss})

    return q.mapInPandas(part, schema="i INT, j INT, s DECIMAL(38,0)")


def collect_moments_fast(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
):
    """``collect_moments``' Arrow-kernel twin: ONE distributed pass (the
    posexplode reference pays the cells aggregate plus a separate μ/n
    aggregate) returning the same ``(n, mu, gram)`` integers exactly."""
    folded = (
        gram_cells_kernel(emb, vec_col, dim, with_moments=True)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    gram: dict[tuple[int, int], int] = {}
    mu = [0] * dim
    n = 0
    for r in folded:
        i, j, s = int(r["i"]), int(r["j"]), int(r["s"])
        if i == 0 and j == 0:
            n = s
        elif j == 0:
            mu[i - 1] = s
        else:
            gram[(i, j)] = s
    return n, mu, gram


def collect_gram_fast(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
) -> dict[tuple[int, int], int]:
    """ONE Arrow-kernel pass → the exact integer Gram dict M = AᵀA
    (r16, r15 verdict #1a): the input to ``power_iteration_from_gram``,
    whose docstring carries the associativity proof that the driver
    iteration over M equals ``power_iteration_audit`` on the same rows
    EXACTLY — so the batch audit can ride the same kernel that fixed
    the pca audit instead of one 64-sum DECIMAL aggregate (with fresh
    codegen) per power-iteration round."""
    folded = (
        gram_cells_kernel(emb, vec_col, dim)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    return {(int(r["i"]), int(r["j"])): int(r["s"]) for r in folded}


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
    use_kernel: bool = True,
):
    """The CENTERED spectral audit — the true PCA top direction: one
    distributed pass collects (n, μ, M), the driver builds the exact
    integer B = n·M − μμᵀ (= n²·Cov) and runs the same trunc-div power
    iteration on it. Centering is what separates 'the corpus has a big
    mean component' (the raw Gram audit fires, this one doesn't) from
    'the corpus VARIES along one direction' (both fire) — the pair is
    pinned against each other in tests/test_spectral.py. The Rayleigh
    share uses a //1000-coarsened v (share_scale) so the cross-engine
    oracle's HUGEINT arithmetic provably fits; v itself is full ppm.
    The moments pass rides the Arrow kernel by default (r14 verdict #5
    — same integers, one pass, no dim² row fan-out); ``use_kernel=
    False`` keeps the posexplode reference path (the oracle's shape)."""
    if use_kernel:
        n, mu, gram = collect_moments_fast(emb, vec_col, dim)
    else:
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
