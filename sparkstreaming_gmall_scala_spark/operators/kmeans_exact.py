"""Exact-integer Lloyd k-means: clustering whose every output bit is
reproducible in ANSI SQL.

The float k-means behind the IVF family (``similarity.kmeans_centroids``)
is rows-only by necessity: its seeds order by Spark's Murmur3 hash and
its means accumulate in floats, neither reproducible in DuckDB. This
variant removes both excuses with a closed-form spec:

* embeddings quantize once to micro-units
  (``CAST(floor(x·1e6 + 0.5) AS BIGINT)`` — the spectral-audit
  convention), so distances are exact integers;
* seeds are the quantized vectors of the ``k`` smallest ids —
  deterministic, no RNG, no hash order;
* assignment is integer squared-distance argmin with ties to the lowest
  cluster index;
* the centroid update rounds the exact mean half-up:
  ``floor(double(Σq)/n + 0.5)`` — both engines compute the identical
  IEEE double quotient of exact integers (budget below), so the rounded
  centroid is bit-identical;
* a cluster that loses every member keeps its previous centroid
  (COALESCE against the prior generation — the same rule in both
  engines).

With a fixed iteration count the whole recurrence unrolls into plain
CTEs, so the per-vector assignment carries a full value-hash oracle —
the first member of the clustering/IVF family that does. ``iters`` is
deliberately small (Lloyd converges fast for a coarse quantizer; faiss
defaults to 10 for real indexes, and the catalog entry uses 2 — enough
to move every centroid off its seed, cheap enough to unroll).

Scale shape (100 TB): each iteration is ONE distributed pass over the
quantized corpus — a codegen'd k×dim argmin fold per row, then a
(k·dim)-cell partial aggregate; only the k×dim centroid matrix ever
reaches the driver (the ``kmeans_centroids`` discipline). The quantized
frame is cached once and reused across iterations.

Magnitude budget: |q| ≤ scale·max|x| (micro-units of unit-norm-ish
embeddings ⇒ ~1e6), so a 64-dim squared distance ≤ 64·(2e6)² ≈ 2.6e14 —
comfortably int64. Per-cluster sums stay exact in DECIMAL(38,0)
Spark-side / HUGEINT oracle-side; the half-up rounding needs
``|Σq| < 2^53`` for the double cast to be exact, i.e. ~9e9 member-rows
per cluster at micro-unit scale — beyond that, raise the rounding to a
wider exact division (the spectral module's documented boundary).

No reference counterpart (the reference has no vector ops at all; its
nearest analog is the per-key groupBy of ads/TrademarkStatApp.scala).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def quantize(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, q): embeddings in exact micro-units — ``floor(x·1e6 + 0.5)``
    per dim as BIGINT, the repo's one quantization convention."""
    return df.select(
        F.col(id_col),
        F.expr(
            f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) "
            f"* {SCALE} + 0.5) AS BIGINT))"
        ).alias("q"),
    )


def _argmin_struct(qname: str, centroids: list[list[int]]) -> Column:
    """(dist, cluster) of the nearest centroid: array_min over k
    (dist, j) structs — lexicographic struct order ties to the lowest j,
    matching the oracle's ``ORDER BY dist, j``."""
    entries = []
    for j, cent in enumerate(centroids):
        lits = ", ".join(f"{int(c)}L" for c in cent)
        entries.append(
            F.struct(
                F.expr(
                    f"aggregate(zip_with({qname}, array({lits}), "
                    "(a, b) -> (a - b) * (a - b)), "
                    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
                ).alias("d"),
                F.lit(j).alias("j"),
            )
        )
    return F.array_min(F.array(*entries))


def exact_kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 2,
) -> tuple[DataFrame, list[list[int]]]:
    """Run the closed-form Lloyd recurrence; return (assignments,
    final_centroids).

    ``assignments`` is (id, cluster, dist): every row's nearest centroid
    AFTER ``iters`` updates, with its integer squared distance — the
    frame the oracle reproduces value-for-value. ``final_centroids`` is
    the k×dim integer matrix (driver-side, for composing probes)."""
    q = quantize(df, id_col, vec_col).persist()
    try:
        seeds = q.orderBy(id_col).limit(k).collect()
        if len(seeds) < k:
            raise ValueError(f"need >= {k} vectors to seed k={k} clusters")
        cents = [[int(x) for x in r["q"]] for r in seeds]

        for _ in range(iters):
            # Assignment in its own projection BELOW the explode (the
            # kmeans_centroids two-step: a Project never collapses across
            # a Generate, so the k×dim argmin fold runs once per ROW, not
            # once per exploded cell).
            assigned = q.select(
                _argmin_struct("q", cents)["j"].alias("cluster"), "q"
            )
            parts = (
                assigned.select(
                    "cluster", F.posexplode("q").alias("pos", "x")
                )
                .groupBy("cluster", "pos")
                .agg(
                    F.sum(F.col("x").cast("decimal(38,0)")).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
            # k×dim cells only — the legitimate post-aggregation collect.
            nxt = [list(c) for c in cents]  # empty cluster ⇒ keep previous
            for r in parts:
                s, n = int(r["s"]), int(r["n"])
                # floor(double(Σq)/n + 0.5): identical IEEE quotient in
                # DuckDB (|Σq| < 2^53 per the module budget)
                nxt[r["cluster"]][r["pos"]] = int(math.floor(s / n + 0.5))
            cents = nxt

        final = q.select(
            F.col(id_col),
            _argmin_struct("q", cents).alias("_a"),
        ).select(
            id_col,
            F.col("_a")["j"].alias("cluster"),
            F.col("_a")["d"].alias("dist"),
        )
        return final, cents
    finally:
        q.unpersist()


def kcenter_greedy(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 5,
) -> tuple[DataFrame, list[int]]:
    """Greedy k-center (farthest-point) coreset selection — the
    2-approximation for the k-center cover and the standard diversity
    primitive for training-data selection (pick the m most mutually
    distant exemplars).

    Closed-form spec (every step reproducible in SQL): the seed is the
    smallest id; each following center is the point maximizing the
    MINIMUM integer squared distance to the already-selected set, ties
    to the smallest id. Returns (assignment, selected_ids): the
    assignment maps every point to its nearest selected center
    (ties to the earliest-selected center), with the integer distance —
    the k-center COVER, whose max distance is the coverage radius.

    Scale shape: each greedy step is ONE distributed argmax pass
    (codegen'd min-over-selected fold, TakeOrdered(1)); only the m
    selected vectors (m×dim ints) ever reach the driver. m passes total
    — the algorithm is inherently sequential in m, so pick small m (the
    coreset use-case) or switch to k-means for large m.
    """
    q = quantize(df, id_col, vec_col).persist()
    try:
        seed = q.orderBy(id_col).limit(1).collect()
        if not seed:
            raise ValueError("empty input")
        sel_ids = [seed[0][id_col]]
        sel_vecs = [[int(x) for x in seed[0]["q"]]]

        for _ in range(1, m):
            # min distance to the selected set, as array_min over the
            # per-center folds (same struct-order trick as _argmin_struct)
            mind = F.array_min(
                F.array(
                    *[
                        F.expr(
                            "aggregate(zip_with(q, array("
                            + ", ".join(f"{int(c)}L" for c in v)
                            + "), (a, b) -> (a - b) * (a - b)), "
                            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
                        )
                        for v in sel_vecs
                    ]
                )
            )
            far = (
                q.select(F.col(id_col), F.col("q"), mind.alias("_d"))
                .orderBy(F.col("_d").desc(), F.col(id_col))
                .limit(1)
                .collect()[0]
            )
            sel_ids.append(far[id_col])
            sel_vecs.append([int(x) for x in far["q"]])

        # cover: nearest selected center per point, ties to the
        # earliest-selected (struct order on (dist, step))
        entries = []
        for step, (cid, v) in enumerate(zip(sel_ids, sel_vecs)):
            entries.append(
                F.struct(
                    F.expr(
                        "aggregate(zip_with(q, array("
                        + ", ".join(f"{int(c)}L" for c in v)
                        + "), (a, b) -> (a - b) * (a - b)), "
                        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
                    ).alias("d"),
                    F.lit(step).alias("s"),
                    F.lit(cid).alias("c"),
                )
            )
        best = F.array_min(F.array(*entries))
        cover = q.select(
            F.col(id_col), best.alias("_b")
        ).select(
            id_col,
            F.col("_b")["c"].alias("center_id"),
            F.col("_b")["d"].alias("dist"),
        )
        return cover, sel_ids
    finally:
        q.unpersist()


def cluster_drift_frame(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Per-cell occupancy and centroid drift under the exact k-means
    cells: (cell, n, drift2) where drift2 = Σ_d (m_d − c_d)² between the
    FROZEN centroid c and the half-up-rounded mean m of the cell's
    current members — exactly "how far would one more Lloyd update move
    this centroid". At freeze time drift is near zero; as the corpus
    shifts it grows — the re-train-the-quantizer signal for an IVF
    index, and the batch ground truth the streaming mart twin
    (streaming/cells.py) must reproduce. An empty cell reports n=0,
    drift2=0 (its mean IS its centroid — the keep-on-empty rule).

    Integer end to end, so the live twin shares this entry's oracle
    verbatim (per-cell sums and counts are an additive monoid; the
    assignment is per-row under frozen centroids — batch-split
    invariant)."""
    cells, cents = exact_kmeans(df, id_col, vec_col, k=k, iters=iters)
    q = quantize(df, id_col, vec_col)
    mean_rows = (
        cells.select(id_col, "cluster")
        .join(q, id_col)
        .select("cluster", F.posexplode("q").alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(
            F.sum(F.col("x").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    # k×dim cells — the bounded post-aggregation collect; the drift
    # arithmetic is the same half-up quotient the centroid update uses
    spark = df.sparkSession
    stats = {}
    for r in mean_rows:
        j, pos = int(r["cluster"]), int(r["pos"])
        n, s = int(r["n"]), int(r["s"])
        m = int(math.floor(s / n + 0.5))
        cnt, drift = stats.get(j, (0, 0))
        stats[j] = (n, drift + (m - cents[j][pos]) ** 2)
    rows = [
        (j, stats.get(j, (0, 0))[0], stats.get(j, (0, 0))[1])
        for j in range(k)
    ]
    return spark.createDataFrame(rows, "cell long, n long, drift2 long")


def semantic_dedup_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    k: int = 4,
    iters: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup over the EXACT k-means cells — the rows-only
    ``similarity.semantic_dedup``'s full-oracle twin.

    Same architecture (Abbas et al. 2023: the pairwise cosine space is
    bounded by k-means cells, Σ|cell|² not n²) and the same
    keep-first rule (drop a doc iff SOME lower-id doc in its cell scores
    6-dp cosine ≥ threshold against it), but the cells come from
    ``exact_kmeans``' closed-form recurrence instead of the
    Murmur3-seeded float path — so cells, scores, and the keep set are
    all bit-reproducible and the catalog entry carries a full value-hash
    oracle (the r13 rows-only→full-oracle discipline, applied to the
    SemDeDup family). Output: (id, cell, keep) — one row per input doc.
    """
    from .similarity import _pair_score, _with_norm

    cells, _ = exact_kmeans(df, id_col, vec_col, k=k, iters=iters)
    base = df.join(cells.select(id_col, "cluster"), id_col)
    a = _with_norm(
        base.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("qvec"),
            "cluster",
        ),
        "qvec", "_qnorm", dim,
    )
    b = _with_norm(
        base.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("cvec"),
            "cluster",
        ),
        "cvec", "_cnorm", dim,
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score", _pair_score(dim))
        .filter(F.col("score") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        cells.join(dropped.withColumn("_drop", F.lit(True)), id_col, "left")
        .select(
            F.col(id_col),
            F.col("cluster").cast("long").alias("cell"),
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"),
        )
    )


def ivf_det_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    clusters: int = 4,
    iters: int = 2,
    nprobe: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """Deterministic IVF probe over the exact-k-means cells — the IVF
    family's first FULL-ORACLE member.

    Build: exact_kmeans assigns every corpus vector to one of
    ``clusters`` cells. Probe: each query ranks the cells by integer
    distance to its own quantized vector, keeps the ``nprobe`` nearest,
    and exact-cosine-scores ONLY vectors in those cells (the IVF
    contract: scan ~nprobe/k of the corpus). Scores round to 6 dp before
    ranking (the knn_bruteforce convention) so the top-k order is
    cross-engine stable. Approximate-by-design like every IVF, but —
    unlike the Murmur3-seeded float path — bit-reproducible, so the
    whole probe (cells included) unrolls into the DuckDB oracle.

    Scale shape: the probe never touches the corpus outside the chosen
    cells (at 100 TB the cells are the partition key — see
    knn_ivf_persisted); queries broadcast; the corpus side never
    shuffles.
    """
    from .similarity import _pair_score, _rank_topk, _with_norm

    cells, cents = exact_kmeans(df, id_col, vec_col, k=clusters, iters=iters)

    # query -> its nprobe nearest cells, by the same integer argmin order
    qq = quantize(queries, id_col, vec_col)
    probe = (
        qq.select(
            F.col(id_col).alias("query_id"),
            F.slice(
                F.array_sort(
                    F.array(
                        *[
                            F.struct(
                                F.expr(
                                    "aggregate(zip_with(q, array("
                                    + ", ".join(f"{int(c)}L" for c in cent)
                                    + "), (a, b) -> (a - b) * (a - b)), "
                                    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
                                ).alias("d"),
                                F.lit(j).alias("j"),
                            )
                            for j, cent in enumerate(cents)
                        ]
                    )
                ),
                1,
                nprobe,
            ).alias("_cells"),
        )
        .select("query_id", F.explode("_cells").alias("_c"))
        .select("query_id", F.col("_c")["j"].alias("cluster"))
    )

    corpus = _with_norm(
        df.join(cells.select(id_col, "cluster"), id_col).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cvec"),
            "cluster",
        ),
        "cvec", "_cnorm", dim,
    )
    qn = _with_norm(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        ),
        "qvec", "_qnorm", dim,
    )

    scored = (
        corpus.join(F.broadcast(probe), "cluster")
        .join(F.broadcast(qn), "query_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", _pair_score(dim))
    )
    return _rank_topk(scored, k)
