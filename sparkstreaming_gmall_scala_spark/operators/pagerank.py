"""Deterministic distributed PageRank — graph centrality over the
near-dup pair graph (which duplicate cluster hubs matter most, which
documents are the canonical centers of a scrape).

The engine's third iterative-algorithm shape after connected components
(label propagation / star contraction) and Lloyd's k-means: a driver
loop of O(iters) distributed passes, each pass one join + one groupBy,
convergence/progress observable from a single post-agg scalar.

Determinism is the design constraint (the repo-wide contract): float
PageRank is partition-order-dependent (double summation does not
associate), so ranks live as INTEGER nano-units end to end —
  contrib(e) = rank(src) // out_degree(src)         (integer division)
  rank'(v)   = ((1e9·(1−d_pct)) // 100) // N
             + (d_pct · (Σ contribs(v) + dangling // N)) // 100
with d as an integer percentage. Long sums are order-independent, so
the same ranks come out under any partitioning, any engine — pinned in
pytest against a pure local implementation of the identical recurrence
(exact equality, not tolerance). The quantization error per entry is
< 1e-9 per step — irrelevant next to d=0.85's contraction.

Scale shape: edges materialize once (persisted); each iteration shuffles
(a) ranks→src join (broadcast when ranks fit, hash otherwise — Spark
picks) and (b) one groupBy(dst) sum with map-side partials. Dangling
mass is one scalar agg. Lineage is cut per iteration by persist +
count (the CC discipline; pass a checkpoint dir for cluster runs at
1000s of iterations — unnecessary at PageRank's typical ≤50).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NANO = 1_000_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping_pct: int = 85,
    iters: int = 10,
) -> DataFrame:
    """(node, rank_nano, rank): PageRank over a DIRECTED edge list (feed
    each undirected pair twice for the symmetric near-dup graph).
    ``rank_nano`` is the exact integer state (sums to ≤ NANO with
    truncation loss); ``rank`` is its double rendering for humans."""
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be 0..100")
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("rank_nano"),
            F.lit(0.0).alias("rank"),
        )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    base = (NANO * (100 - damping_pct)) // 100 // n

    ranks = nodes.select(
        "node", F.lit(NANO // n).cast("long").alias("rank_nano")
    ).persist()
    ranks.count()
    for _ in range(iters):
        with_deg = ranks.join(
            deg, ranks.node == deg.src, "left"
        ).select("node", "rank_nano", "out_deg")
        # dangling nodes (no out-edges) spread their mass uniformly
        dangling = (
            with_deg.filter(F.col("out_deg").isNull())
            .agg(F.coalesce(F.sum("rank_nano"), F.lit(0)).alias("s"))
            .collect()[0]["s"]
        )
        contribs = (
            e.join(
                with_deg.filter(F.col("out_deg").isNotNull()),
                e.src == with_deg.node,
            )
            .select(
                F.col("dst").alias("node"),
                # SQL DIV: true integer floor division — a double `/`
                # plus cast can round UP across the floor for quotients
                # within one ulp of an integer, breaking exact equality
                # with the local integer reference
                F.expr("rank_nano DIV out_deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        share = int(dangling) // n
        nxt = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({damping_pct}L * (coalesce(in_sum, 0L) "
                        f"+ {share}L)) DIV 100"
                    )
                ).alias("rank_nano"),
            )
            .persist()
        )
        nxt.count()
        ranks.unpersist()
        ranks = nxt
    # materialize the result frame itself, then release every
    # intermediate — the ONLY retained cache is the returned DataFrame,
    # which the caller can free with .unpersist() (previously the final
    # ranks cache had no releasable handle and leaked per call)
    out = ranks.select(
        "node",
        "rank_nano",
        (F.col("rank_nano").cast("double") / NANO).alias("rank"),
    ).persist()
    out.count()
    ranks.unpersist()
    e.unpersist()
    nodes.unpersist()
    return out
