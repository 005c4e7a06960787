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
    """ANN top-k over the SQ8 codes table: the approximate cosine folds
    DIRECTLY over the codes — decode happens inside the one O(dim)
    aggregate per pair, never as a reusable decoded-array column.
    (A decoded `transform(...)` column looks cleaner, but Catalyst's
    CollapseProject inlines the alias into every ``getItem(i)`` of an
    unrolled dot chain, turning the scan O(dim²) per pair — measured 6 s
    vs sub-2 s for the fold form on the sf0.1 bench.) Per-query
    shortlist by (approx desc, id), then — with ``rerank`` — exact
    cosine over only the shortlisted raw vectors (the pq_topk refine
    shape, minus the Python workers). Deterministic end to end (same
    element order and arithmetic as sq8_decode_col), so the catalog
    entry carries a full DuckDB oracle."""
    mn = _lit_arr([b[0] for b in bounds])
    mx = _lit_arr([b[1] for b in bounds])

    def dec(s: Column) -> Column:
        # decoded element from a zipped struct: mn + (c·(mx − mn))/255
        return s.getField("mn") + (
            s.getField("c").cast("double")
            * (s.getField("mx") - s.getField("mn"))
        ) / 255.0

    def zipped(codes_col: Column, *extra: tuple[str, Column]) -> Column:
        cols = [codes_col.alias("c"), mn.alias("mn"), mx.alias("mx")]
        cols += [c.alias(n) for n, c in extra]
        return F.arrays_zip(*cols)

    # ||decode(codes)||: one fold per corpus row
    cnorm = F.sqrt(
        F.aggregate(
            zipped(F.col("codes")),
            F.lit(0.0),
            lambda acc, s: acc + dec(s) * dec(s),
        )
    )
    qsel = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    if dim is not None:
        q = _with_norm(qsel, "qvec", "_qnorm", dim)
    else:
        from ..functions.vectors import norm as _vnorm

        q = qsel.withColumn("_qnorm", _vnorm(F.col("qvec")))
    c = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("codes"),
        cnorm.alias("_cnorm"),
    )
    # dot(qvec, decode(codes)): one fold per pair, decode inside
    pair_dot = F.aggregate(
        zipped(F.col("codes"), ("q", F.col("qvec"))),
        F.lit(0.0),
        lambda acc, s: acc + s.getField("q").cast("double") * dec(s),
    )
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
