"""SQ8 scalar quantization — the byte-bounded ANN path that stays
entirely JVM-side.

Completes the faiss compression progression (Flat → LSH → IVF → PQ →
IVF-PQ → **SQ8**, faiss's IndexScalarQuantizer/SQ8): each float32
dimension quantizes independently to one uint8 against per-dimension
[min, max] bounds, so a 64-dim vector (256 B) stores as 64 codes (4×
smaller; 8× against float64 pipelines) with NO codebook training — the
"bounds" are two exact aggregates. PQ compresses harder (32×) but needs
trained codebooks and numpy ADC scans; SQ8's encode, decode, and scoring
are all pure Column expressions (transform/zip_with/aggregate folds +
codegen'd fixed-dim chains for the hot pairwise scoring), so the whole
path stays JVM-side with zero Python workers — and, unlike PQ/IVF, it is exactly reproducible cross-engine: min/max
are order-independent aggregates and encode/decode is fixed-order IEEE
double arithmetic, which is why knn_sq8 carries a full hash-checked
DuckDB oracle while the trained-quantizer family is rows-only.

At 100 TB: bounds are one narrow posexplode + groupBy(pos) agg (dim
output rows); encode is one scan landing the codes table (store it
partitioned/bucketed like any projection of the corpus); probes scan
codes + decode in codegen, shortlist per query, and exact-rerank only
shortlist-sized raw-vector reads — same refine discipline as pq_topk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _pair_score, _rank_topk, _with_norm


def sq8_bounds(corpus: DataFrame, vec_col: str) -> list[tuple[float, float]]:
    """Per-dimension (min, max) over the corpus — the SQ8 "training" step.
    Exact order-independent aggregates (no sampling, no RNG): the same
    bounds on any engine, any partitioning. One distributed pass,
    ``dim`` output rows."""
    rows = (
        corpus.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        .orderBy("pos")
        .collect()
    )
    return [(r["mn"], r["mx"]) for r in rows]


def _lit_arr(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def sq8_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    bounds: list[tuple[float, float]],
) -> DataFrame:
    """(id, codes array<int>): code_i = clamp(floor((x_i − mn_i) · 255 /
    (mx_i − mn_i) + 0.5), 0, 255); a degenerate dimension (mx == mn)
    codes to 0. Pure Column transform — no UDF, no shuffle. The operation
    order ((x − mn) · 255.0) / (mx − mn) is part of the contract: the
    DuckDB oracle evaluates the identical IEEE-double sequence, so codes
    match bit-for-bit cross-engine."""
    mn = _lit_arr([b[0] for b in bounds])
    mx = _lit_arr([b[1] for b in bounds])

    def code(x: Column, i: Column) -> Column:
        lo = F.element_at(mn, i + 1)
        hi = F.element_at(mx, i + 1)
        q = F.floor((x.cast("double") - lo) * 255.0 / (hi - lo) + 0.5)
        clamped = F.least(F.greatest(q, F.lit(0)), F.lit(255))
        return F.when(hi > lo, clamped).otherwise(F.lit(0)).cast("int")

    return corpus.select(
        F.col(id_col).alias(id_col),
        F.transform(F.col(vec_col), code).alias("codes"),
    )


def sq8_decode_col(
    codes: Column, bounds: list[tuple[float, float]]
) -> Column:
    """Decoded vector as array<double>: mn_i + (c_i · (mx_i − mn_i)) /
    255.0 — the reconstruction the probe scores against (fixed operation
    order, oracle-mirrored)."""
    mn = _lit_arr([b[0] for b in bounds])
    mx = _lit_arr([b[1] for b in bounds])
    return F.transform(
        codes,
        lambda c, i: F.element_at(mn, i + 1)
        + (
            c.cast("double")
            * (F.element_at(mx, i + 1) - F.element_at(mn, i + 1))
        )
        / 255.0,
    )


def sq8_cnorm_col(
    codes: Column, bounds: list[tuple[float, float]]
) -> Column:
    """||decode(codes)|| as one HOF fold per corpus ROW (never per pair)
    — same decode tree as sq8_decode_col, summed acc + x·x from 0.0 (the
    oracle's list_reduce order). Stays a fold on purpose: an unrolled
    64-term decode chain blows janino's method limit and drops the whole
    scan out of codegen (measured ~40% SLOWER than the fold — the
    knn_lsh lesson again). Persisted indexes precompute this column at
    build time (``sq8_with_norm``) so probes skip it entirely."""
    mn = _lit_arr([b[0] for b in bounds])
    diff = _lit_arr([float(b[1]) - float(b[0]) for b in bounds])
    dec_arr = F.zip_with(
        codes,
        F.arrays_zip(mn.alias("mn"), diff.alias("df")),
        lambda c, b: b.getField("mn")
        + (c.cast("double") * b.getField("df")) / 255.0,
    )
    return F.sqrt(
        F.aggregate(dec_arr, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def sq8_with_norm(
    encoded: DataFrame, bounds: list[tuple[float, float]]
) -> DataFrame:
    """Attach the precomputed ``_cnorm`` column to an encoded codes
    table — the build-time step for persisted/streamed SQ8 indexes."""
    return encoded.withColumn(
        "_cnorm", sq8_cnorm_col(F.col("codes"), bounds)
    )


def sq8_topk(
    codes: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    bounds: list[tuple[float, float]],
    k: int = 5,
    rerank: DataFrame | None = None,
    shortlist: int = 32,
    dim: int | None = None,
) -> DataFrame:
    """ANN top-k over the SQ8 codes table. The approximate cosine's dot
    is ALGEBRAICALLY SPLIT so the per-pair work is one multiply-add per
    dimension over a 2-field zip:

        dot(q, decode(c)) = Σ q_i·mn_i  +  Σ c_i · t_i,
        t_i = (q_i·(mx_i − mn_i)) / 255

    — the first sum (``_qmn``) and the adjusted query ``t`` depend only
    on the QUERY, so both precompute on the tiny broadcast side, and the
    codes-side scan never touches mn/mx at all. Every sum here is an
    UNROLLED getItem chain (functions/vectors.py:dot_fixed discipline),
    not an ``F.aggregate`` fold: higher-order-function lambdas are
    interpreted PER ELEMENT, and on the pairwise path that
    interpretation overhead — not the arithmetic — was the probe's
    bottleneck (measured: fold forms ~5 s, unrolled ~sub-2 s at sf0.1);
    per-dimension bounds enter as scalar literals, so the chains stay
    inside whole-stage codegen with zero array allocation per pair.
    The split is a REASSOCIATION of the naive Σ q_i·decode_i — a
    different IEEE-double result — so the expression tree here and in
    the DuckDB oracle (plans/llm.py knn_sq8) are the contract and must
    change together. (Chain start a[0]·b[0] ≡ the fold's 0.0 + a[0]·b[0]
    exactly, and lit(mx−mn) precomputed in Python is the identical IEEE
    subtraction DuckDB evaluates — both checked by the oracle hash.)
    Per-query shortlist by (approx desc, id), then — with ``rerank`` —
    exact cosine over only the shortlisted raw vectors (the pq_topk
    refine shape, minus the Python workers). Deterministic end to end,
    so the catalog entry carries a full DuckDB oracle."""
    d = dim if dim is not None else len(bounds)
    mn = _lit_arr([b[0] for b in bounds])
    diff = _lit_arr([float(b[1]) - float(b[0]) for b in bounds])

    qsel = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    if dim is not None:
        q = _with_norm(qsel, "qvec", "_qnorm", dim)
    else:
        from ..functions.vectors import norm as _vnorm

        q = qsel.withColumn("_qnorm", _vnorm(F.col("qvec")))
    # query-only precomputes (broadcast side, |queries| rows — HOF folds,
    # off the hot path): _qmn = Σ q_i·mn_i ; t_i = (q_i·(mx_i − mn_i))/255
    q = q.withColumn(
        "_qmn",
        F.aggregate(
            F.zip_with(
                F.col("qvec"), mn, lambda x, m: x.cast("double") * m
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    ).withColumn(
        "_t",
        F.zip_with(
            F.col("qvec"), diff, lambda x, s: (x.cast("double") * s) / 255.0
        ),
    )
    if "_cnorm" in codes.columns:
        # persisted index carries the precomputed norms (sq8_with_norm at
        # build time — norms are per-row derived data that belong IN the
        # index, the faiss convention); probes skip the decode fold and
        # the plan loses its largest expression
        c = codes.select(
            F.col(id_col).alias("neighbor_id"), F.col("codes"), "_cnorm"
        )
    else:
        c = codes.select(
            F.col(id_col).alias("neighbor_id"),
            F.col("codes"),
            sq8_cnorm_col(F.col("codes"), bounds).alias("_cnorm"),
        )
    # per-pair: _qmn + Σ c_i·t_i — one codegen'd multiply-add chain over
    # two plain (join-materialized) array columns; _t crosses the
    # broadcast exchange as data, so CollapseProject cannot inline its
    # defining expressions into this chain (the O(dim²) trap)
    from ..functions.vectors import dot_fixed

    pair_dot = F.col("_qmn") + dot_fixed(F.col("codes"), F.col("_t"), d)
    approx = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "approx",
            F.floor(
                (pair_dot / (F.col("_qnorm") * F.col("_cnorm"))) * 1e6 + 0.5
            )
            / 1e6,
        )
    )
    n_short = max(shortlist, k + 1) if rerank is not None else k + 1
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id")
    )
    short = (
        approx.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_short)
        .select("query_id", "neighbor_id", "approx")
    )
    if rerank is None:
        scored = short.select(
            "query_id", "neighbor_id", F.col("approx").alias("score")
        )
        return _rank_topk(scored, k)
    qdf = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    cvec = rerank.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    rq = _with_norm(qdf, "qvec", "_qnorm", dim)
    rc = _with_norm(cvec, "cvec", "_cnorm", dim)
    scored = (
        rc.join(F.broadcast(short.select("query_id", "neighbor_id")), "neighbor_id")
        .join(F.broadcast(rq), "query_id")
        .withColumn("score", _pair_score(dim))
        .select("query_id", "neighbor_id", "score")
    )
    return _rank_topk(scored, k)
