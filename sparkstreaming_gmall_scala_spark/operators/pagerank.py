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

Scale shape (r15 optimization round — guide §2.4/§1.2, measured 13.6 s
→ ~2 s for 6 rounds at sf0.1): the out-degree is joined onto the EDGE
list once (static across rounds), and each iteration is exactly ONE
join (ranks→src; broadcast when ranks fit, hash otherwise — Spark
picks) plus ONE groupBy(node) sum with map-side partials. The old
``nodes LEFT JOIN contribs`` re-attachment is gone: nodes enter the
aggregate as zero-contribution rows unioned under the same groupBy, so
``coalesce(in_sum, 0)`` is just ``sum`` over a set that always contains
the node — identical long arithmetic, one shuffle less per round.
Dangling handling is split by a one-time probe: a graph with no
dangling nodes (every undirected pair fed both ways — the near-dup
graph always) has dangling mass 0 in EVERY round, so the whole loop
chains lazily (linear plan growth — each round's frame is consumed
exactly once) and materializes in one action; with dangling nodes the
per-round mass is a scalar that must return to the driver, so each
round persists its rank state and the mass aggregate doubles as the
round's materialization. Rounds nest the logical plan linearly
(~5 operators each) — no per-round checkpoint needed at PageRank's
typical ≤50 iterations; the old per-round persist+count pattern left
ranks consumed TWICE per round, which nested the plan exponentially
and re-analyzed/re-codegenned a doubling tree every round.
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
    base = (NANO * (100 - damping_pct)) // 100 // n

    # Statics hoisted out of the loop: the out-degree rides on the EDGE
    # list (one static join instead of a ranks⋈deg join per round); the
    # zero-contribution node rows enter each round's aggregate so absent
    # nodes still produce a row (replaces the per-round LEFT join).
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ewd = e.join(deg, "src").persist()
    zero = nodes.select("node", F.lit(0).cast("long").alias("c"))
    dangling_nodes = nodes.join(
        deg.select(F.col("src").alias("node")), "node", "left_anti"
    ).persist()
    has_dangling = dangling_nodes.count() > 0

    ranks = nodes.select(
        "node", F.lit(NANO // n).cast("long").alias("rank_nano")
    )
    kept: list[DataFrame] = []
    for _ in range(iters):
        if has_dangling:
            # the dangling mass is a driver scalar feeding the next
            # round, so this round must materialize: persist the rank
            # state (lazily — the mass aggregate is the round's one
            # action and fills the cache for the contribs consumer)
            ranks = ranks.persist()
            kept.append(ranks)
            dangling = (
                ranks.join(F.broadcast(dangling_nodes), "node")
                .agg(F.coalesce(F.sum("rank_nano"), F.lit(0)).alias("s"))
                .collect()[0]["s"]
            )
            share = int(dangling) // n
            # sliding cache window (r15 ADVICE): the collect above
            # materialized this round's frame, so only the last two rank
            # caches can still be read — release older ones instead of
            # holding O(iters) frames until the end
            while len(kept) > 2:
                kept.pop(0).unpersist()
        else:
            # no dangling nodes ⇒ the mass is 0 in EVERY round: nothing
            # returns to the driver, the loop chains lazily (each
            # round's frame is consumed exactly once — linear plan) and
            # the caller's single action executes all rounds
            share = 0
        contribs = ewd.join(
            ranks.select("node", "rank_nano"), ewd.src == F.col("node")
        ).select(
            F.col("dst").alias("node"),
            # SQL DIV: true integer floor division — a double `/`
            # plus cast can round UP across the floor for quotients
            # within one ulp of an integer, breaking exact equality
            # with the local integer reference
            F.expr("rank_nano DIV out_deg").alias("c"),
        )
        # nodes ride in as zero rows: sum(c) over {contribs ∪ 0-row}
        # ≡ coalesce(in_sum, 0) — same long arithmetic, no LEFT join
        ranks = (
            contribs.unionByName(zero)
            .groupBy("node")
            .agg(
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({damping_pct}L * (sum(c) + {share}L)) DIV 100"
                    )
                ).alias("rank_nano")
            )
        )
    # materialize the result frame itself, then release every
    # intermediate — the ONLY retained cache is the returned DataFrame,
    # which the caller can free with .unpersist() (previously the final
    # ranks cache had no releasable handle and leaked per call)
    out = ranks.select(
        "node",
        "rank_nano",
        (F.col("rank_nano").cast("double") / NANO).alias("rank"),
    ).persist()
    out.count()  # executes every pending lazy round in one query
    for r in kept:
        r.unpersist()
    ewd.unpersist()
    dangling_nodes.unpersist()
    e.unpersist()
    nodes.unpersist()
    return out
