"""Graph primitives over the near-dup pair graph: triangle counting.

Sits next to connected components (operators/dedup.py) and PageRank
(operators/pagerank.py) as the third graph signal on dup pairs:
per-node triangle support separates tight dup CLIQUES (every copy
near-matches every other — true duplicates) from similarity CHAINS
(A~B~C but A!~C — template drift), which changes what a keep-policy
should canonicalize.

Scale shape — the standard degree-oriented triangle count (the
Suri/Vassilvitskii MapReduce formulation): orient every edge toward the
endpoint with the larger (degree, id), making the graph a DAG where
each triangle is found EXACTLY once from its minimum vertex's two
out-edges plus one closing-edge hash lookup. Wedge work is bounded by
sum(out_deg^2) = O(E^{3/2}) instead of the hub-quadratic sum(deg^2) an
id-only orientation risks (a low-id hub fans out to its whole
neighborhood). Three equi hash joins, no cartesian anywhere; per-node
counts are orientation-independent, so the DuckDB oracle uses the
simple id order."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def triangle_counts(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """(node, n_triangles) for every node in at least one triangle.

    ``pairs`` are undirected edges; endpoints in any order. Input is
    canonicalized (least/greatest) and deduped, so duplicate rows,
    both-orders delivery, and self-loops are all absorbed instead of
    multiplying counts (pinned in tests)."""
    # the edge list is consumed by four downstream frames (degrees, both
    # wedge sides, the closing lookup) — persist it once or an expensive
    # upstream pair computation (the LSH/Jaccard self-join) re-runs per
    # consumer; the pair graph is tiny next to the corpus
    e = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("u"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    e.count()  # materialize NOW: the four consumers below otherwise race
    # the empty cache in parallel stages and each recomputes the (
    # possibly expensive) upstream pair computation
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))

    # orient each edge toward the larger (deg, id): a total order, so
    # the oriented graph is a DAG
    with_deg = (
        sym.join(deg.withColumnRenamed("u", "_du"), F.col("u") == F.col("_du"))
        .drop("_du")
        .withColumnRenamed("deg", "du")
        .join(
            deg.select(F.col("u").alias("_dv"), F.col("deg").alias("dv")),
            F.col("v") == F.col("_dv"),
        )
        .drop("_dv")
    )
    oriented = with_deg.filter(
        (F.col("du") < F.col("dv"))
        | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    ).select("u", "v")

    # wedges from each vertex's out-edges, closed by an oriented edge
    o1 = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    o2 = oriented.select(F.col("u").alias("y2"), F.col("v").alias("z"))
    wedges = o1.join(o2, F.col("y") == F.col("y2")).select("x", "y", "z")
    closing = oriented.select(
        F.col("u").alias("x2"), F.col("v").alias("z2")
    )
    tri = wedges.join(
        closing, (F.col("x") == F.col("x2")) & (F.col("z") == F.col("z2"))
    ).select("x", "y", "z")

    out = (
        tri.select(
            F.explode(F.array("x", "y", "z")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .persist()
    )
    # materialize the (small) result, then release the edge cache — the
    # pagerank discipline: persist the final frame, unpersist the
    # intermediates, so repeated invocations don't accumulate edge-list
    # caches for the session lifetime
    out.count()
    e.unpersist()
    return out
