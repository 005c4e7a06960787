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

from ..functions.vectors import dot_fixed
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
    # ONE F.lit call (r16): per-element lits pay a py4j round trip each
    return F.lit([float(v) for v in vals])


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
    interpreted PER ELEMENT on the pairwise path, while the chains stay
    inside whole-stage codegen with zero array allocation per pair.
    The chains are built via dot_fixed's STRING fast path (one F.expr
    parse): round 9 measured the probe at 5.4 s with Column-by-Column
    chain construction — ~4 py4j round trips per term put >4 s of the
    total in DataFrame construction/analysis on the driver, dwarfing
    the ~1.4 s of actual execution — vs ~1.5 s total with the
    single-parse form (identical analyzed tree either way).
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

    pair_dot = F.col("_qmn") + dot_fixed("codes", "_t", d)
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
    return _exact_rerank(short, queries, rerank, id_col, vec_col, dim, k)


def _exact_rerank(
    short: DataFrame,
    queries: DataFrame,
    rerank: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int | None,
    k: int,
) -> DataFrame:
    """The refine stage shared by the SQ8 probes: exact 6-dp cosine over
    ONLY the shortlisted raw vectors (broadcast point lookups, never a
    corpus scan), ranked with the family-wide (score desc, id) tiebreak."""
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


def _unit_centroids(centroids: list[list[float]]) -> list[list[float]]:
    """Centroid DIRECTIONS ĉ = c/||c|| (zero centroids stay zero) —
    computed driver-side over the k×dim matrix, plain Python floats so
    the assignment expression embeds them as stable literals."""
    out = []
    for c in centroids:
        n = sum(float(x) * float(x) for x in c) ** 0.5
        out.append([float(x) / n for x in c] if n > 0.0 else [0.0] * len(c))
    return out


def _directional_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """argmax_j dot(vec, ĉ_j) over the UNIT-normalized centroids, ties →
    lowest index. The metric here is cosine, so cells must partition by
    DIRECTION: raw-space L2 argmin (the plain-IVF rule) splits uniform
    data by magnitude as much as angle, and a query's cosine neighbors
    scatter across cells — measured round 9: recall@5 0.76 at nprobe=4/8
    with L2 assignment vs 1.00 probing all cells; directional assignment
    restores IVF-PQ-level coverage (its normalized-space L2 is the same
    ranking, since ||x̂−ĉ||² = 2−2·dot(x̂,ĉ) is monotone in the dot).
    dot(vec, ĉ_j) itself is magnitude-invariant for the ARGMAX, so the
    row vector never needs normalizing — no per-row norm column to leak
    into a HOF lambda (the CollapseProject O(dim²) trap)."""
    from .similarity import _fold_dots

    # one transform over one 2-D literal (r16 — see _fold_dots): same
    # per-centroid fold arithmetic, bit-identical dots and argmax
    d_arr = _fold_dots(vec, _unit_centroids(centroids))
    return (F.array_position(d_arr, F.array_max(d_arr)) - 1).cast("int")


def _ivf_residual_frame(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
) -> DataFrame:
    """(id, cell, res): directional coarse-cell assignment (see
    _directional_cell) plus the residual x − centroid[cell] against the
    RAW centroid (the reconstruction target — x̂ = centroid + decoded
    residual must approximate x itself), all pure Column expressions.
    Cell assignment sits in its OWN projection (the kmeans_centroids
    discipline) so the k-dot array is built once per row, not re-derived
    inside the residual zip."""
    cents2d = F.lit([[float(x) for x in c] for c in centroids])
    assigned = corpus.select(
        F.col(id_col).alias(id_col),
        F.col(vec_col).alias("_v"),
        _directional_cell(F.col(vec_col), centroids).alias("cell"),
    )
    return assigned.select(
        id_col,
        "cell",
        F.zip_with(
            F.col("_v"),
            F.element_at(cents2d, F.col("cell") + 1),
            lambda x, c: x.cast("double") - c,
        ).alias("res"),
    )


def ivf_sq8_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    bounds: list[tuple[float, float]],
) -> DataFrame:
    """The IVF-SQ8 index rows (id, cell, codes, _cnorm) — faiss
    "IVF,SQ8" with residual encoding: coarse cells bound the CANDIDATES
    (write the output ``partitionBy("cell")`` and probes prune unprobed
    cell directories), SQ8 codes bound the BYTES at 1 byte/dimension,
    and because codes quantize the RESIDUAL x − centroid[cell] (which
    concentrates near zero) the per-step quantization error is far
    smaller than flat SQ8's for the same 8 bits — the IndexIVFPQ
    residual argument (operators/pq.py:pq_train), applied to the scalar
    quantizer. ``bounds`` are per-dimension [min, max] over the
    residuals (sq8_bounds on _ivf_residual_frame's ``res``).

    ``_cnorm`` stores the RECONSTRUCTION norm ||centroid[cell] +
    decode(codes)|| at build time, so probes score approximate cosine
    without touching raw vectors. Everything here is pure Column
    expressions — the whole build is one corpus scan plus the bounds
    aggregation, zero Python workers (the SQ8 family property; the
    coarse centroids come from kmeans_centroids' distributed passes)."""
    mn = _lit_arr([b[0] for b in bounds])
    mx = _lit_arr([b[1] for b in bounds])
    cents2d = F.lit([[float(x) for x in c] for c in centroids])

    def code(x: Column, i: Column) -> Column:
        lo = F.element_at(mn, i + 1)
        hi = F.element_at(mx, i + 1)
        q = F.floor((x.cast("double") - lo) * 255.0 / (hi - lo) + 0.5)
        clamped = F.least(F.greatest(q, F.lit(0)), F.lit(255))
        return F.when(hi > lo, clamped).otherwise(F.lit(0)).cast("int")

    res = _ivf_residual_frame(corpus, id_col, vec_col, centroids)
    coded = res.select(
        id_col, "cell", F.transform(F.col("res"), code).alias("codes")
    )
    # reconstruction x̂ = centroid[cell] + decode(codes); _cnorm = ||x̂||.
    # Its own projection so the codes transform above isn't inlined into
    # the decode tree (the CollapseProject-across-two-consumers trap).
    recon = F.zip_with(
        sq8_decode_col(F.col("codes"), bounds),
        F.element_at(cents2d, F.col("cell") + 1),
        lambda d, c: d + c,
    )
    return coded.withColumn(
        "_cnorm",
        F.sqrt(F.aggregate(recon, F.lit(0.0), lambda acc, x: acc + x * x)),
    )


def ivf_sq8_topk(
    index: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    bounds: list[tuple[float, float]],
    k: int = 5,
    nprobe: int = 4,
    rerank: DataFrame | None = None,
    shortlist: int = 32,
    dim: int | None = None,
) -> DataFrame:
    """ANN top-k over an IVF-SQ8 index: each query probes only its
    ``nprobe`` nearest coarse cells (``cell IN (...)`` becomes partition
    pruning on a cell-partitioned parquet index — unprobed cell
    DIRECTORIES are never opened), scores the pruned codes with the
    split approximate dot, shortlists, and exact-reranks.

    The split-dot extends sq8_topk's with the centroid term:

        dot(q, x̂) = dot(q, centroid_c) + Σ q_i·mn_i + Σ c_i·t_i

    where the first two terms and t_i = (q_i·(mx_i − mn_i))/255 depend
    only on the (query, probed cell) pair — both precompute DRIVER-side
    over the bounded collected query batch (the pq_topk contract), so
    the codes-side scan is one codegen'd multiply-add chain per pair,
    zero Python workers. At 100 TB the scan cost is nprobe/k_cells of
    the codes table read as 1-byte/dim rows; raw-vector IO is
    shortlist-sized point lookups in the refine stage.

    Probe-latency shape (round-9 verdict #5, 1.5 s → sub-second): the
    per-(query, cell) probe table embeds as a LITERAL cell→probes map
    in ONE parsed expression (plain double literals round-trip exactly)
    exploded against the pruned codes — no createDataFrame, no
    broadcast-exchange job; the probes-for-this-cell lookup is an
    element_at against the map literal. With ``rerank``, the refine
    stage runs DRIVER-side over the collected shortlist (bounded at
    |queries|·shortlist rows — the same query-batch contract as the
    collect above): raw vectors arrive via one single-parse ``IN``
    point-lookup scan (predicate pushdown, never a corpus scan), and
    the exact cosine reproduces the JVM chain bit-for-bit (left-to-
    right float64 accumulation, same floor tree) — verified equal to
    the previous in-Spark _exact_rerank output. Three bounded jobs
    total: query collect, shortlist, vector lookup."""
    import numpy as np

    d = dim if dim is not None else len(bounds)
    cents = np.asarray(centroids, dtype=np.float64)
    ucents = np.asarray(_unit_centroids(centroids), dtype=np.float64)
    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        raise ValueError("ivf_sq8_topk needs a non-empty query batch")
    q_ids = [int(r[id_col]) for r in q_rows]
    q = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    if q.shape[1] != d:
        raise ValueError(f"expected {d}-dim query vectors, got {q.shape[1]}")
    # probe cells by DIRECTION — the same dot(q, ĉ) ranking the index's
    # _directional_cell assignment uses (negated: argsort ascending,
    # stable ties → lowest cell index, matching array_position)
    probed = np.argsort(-(q @ ucents.T), axis=1, kind="stable")[:, :nprobe]
    mn_v = np.array([b[0] for b in bounds], dtype=np.float64)
    diff_v = np.array(
        [float(b[1]) - float(b[0]) for b in bounds], dtype=np.float64
    )
    qmn = q @ mn_v
    t = q * diff_v / 255.0
    # left-to-right norm — the exact chain norm_fixed codegens, reused
    # verbatim by the driver-side refine below
    _qn = q[:, 0] * q[:, 0]
    for i in range(1, d):
        _qn = _qn + q[:, i] * q[:, i]
    qnorm = np.sqrt(_qn)
    by_cell: dict[int, list[int]] = {}
    for j in range(len(q_ids)):
        for c in probed[j]:
            by_cell.setdefault(int(c), []).append(j)

    def _d(v: float) -> str:  # repr round-trips doubles exactly
        return f"CAST('{float(v)!r}' AS DOUBLE)"

    entries = []
    for c, js in sorted(by_cell.items()):
        structs = ",".join(
            f"named_struct('query_id',{q_ids[j]}L,"
            f"'_qmn2',{_d(qmn[j] + q[j] @ cents[c])},"
            f"'_qnorm',{_d(qnorm[j])},"
            f"'_t',array({','.join(_d(v) for v in t[j])}))"
            for j in js
        )
        entries.append(f"{c}, array({structs})")
    map_sql = "map(" + ",".join(entries) + ")"
    cells = sorted(by_cell)
    pruned = index.filter(F.col("cell").isin(cells)).select(
        F.col(id_col).alias("neighbor_id"), "cell", "codes", "_cnorm"
    )
    exp = pruned.select(
        "neighbor_id",
        "codes",
        "_cnorm",
        F.explode(
            F.expr(f"element_at({map_sql}, CAST(cell AS INT))")
        ).alias("p"),
    ).select(
        "neighbor_id",
        "codes",
        "_cnorm",
        F.col("p.query_id").alias("query_id"),
        F.col("p._qmn2").alias("_qmn2"),
        F.col("p._qnorm").alias("_qnorm"),
        F.col("p._t").alias("_t"),
    )
    pair_dot = F.col("_qmn2") + dot_fixed("codes", "_t", d)
    approx = exp.filter(
        F.col("neighbor_id") != F.col("query_id")
    ).withColumn(
        "approx",
        F.floor(
            (pair_dot / (F.col("_qnorm") * F.col("_cnorm"))) * 1e6 + 0.5
        )
        / 1e6,
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
    # driver-side refine over the BOUNDED shortlist (<= |q|·n_short rows)
    import math
    from collections import defaultdict

    srows = short.select("query_id", "neighbor_id").collect()
    schema = "query_id long, neighbor_id long, score double, rank integer"
    if not srows:
        return index.sparkSession.createDataFrame([], schema)
    need = sorted({int(r["neighbor_id"]) for r in srows})
    in_sql = f"`{id_col}` IN (" + ",".join(str(v) for v in need) + ")"
    vecs = {
        int(r[id_col]): np.array(r[vec_col], dtype=np.float64)
        for r in rerank.filter(F.expr(in_sql))
        .select(id_col, vec_col)
        .collect()
    }
    qv = {q_ids[j]: q[j] for j in range(len(q_ids))}
    qnm = {q_ids[j]: float(qnorm[j]) for j in range(len(q_ids))}
    byq: dict[int, list[tuple[float, int]]] = defaultdict(list)
    for r in srows:
        qid, nid = int(r["query_id"]), int(r["neighbor_id"])
        a, b = qv[qid], vecs[nid]
        dot = a[0] * b[0]
        nn = b[0] * b[0]
        for i in range(1, d):
            dot = dot + a[i] * b[i]
            nn = nn + b[i] * b[i]
        score = (
            math.floor(float(dot) / (qnm[qid] * math.sqrt(float(nn))) * 1e6 + 0.5)
            / 1e6
        )
        byq[qid].append((score, nid))
    out = []
    for qid in sorted(byq):
        ranked = sorted(byq[qid], key=lambda x: (-x[0], x[1]))[:k]
        out.extend(
            (qid, nid, s, rk) for rk, (s, nid) in enumerate(ranked, 1)
        )
    return index.sparkSession.createDataFrame(out, schema)
