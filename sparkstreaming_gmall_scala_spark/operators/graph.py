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

from pyspark.sql import DataFrame, Window, functions as F


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

    # orient each edge toward the larger (deg, id): a total order, so
    # the oriented graph is a DAG. Degrees attach as WINDOW counts over
    # the symmetric edge list (r15): node x appears in the u-slot of sym
    # exactly deg(x) times (e is distinct, sym holds both directions),
    # so count-over-partition IS the degree — two exchanges of sym
    # replace the old deg groupBy + two join re-shuffles (strictly fewer
    # passes at any scale, and no broadcast-build jobs locally).
    oriented = (
        sym.withColumn(
            "du", F.count(F.lit(1)).over(Window.partitionBy("u"))
        )
        .withColumn("dv", F.count(F.lit(1)).over(Window.partitionBy("v")))
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
    )

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


def core_decomposition(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Coreness per node over an undirected pair graph — the fourth graph
    signal on dup pairs (triangles find cliques, CC finds reach,
    PageRank finds hubs; CORENESS finds density shells: a node of
    coreness k sits in a subgraph where EVERYONE keeps >= k neighbors,
    the standard dense-duplication-community detector).

    Algorithm: iterative k-peeling. For k = 1, 2, ...: repeatedly remove
    nodes with degree < k until stable; nodes removed while peeling at
    level k have coreness k−1. Each peel pass is one degree aggregate +
    one semi-join on the edge endpoints — no all-pairs anything, and the
    edge frame shrinks monotonically. Peeling runs until the graph
    empties; total passes are bounded by removal passes (each removes
    >= 1 node, so <= |V|) plus one stable-check pass per k level
    (<= degeneracy + 1 <= |V|). ``max_rounds`` defaults to that sound
    2·|V| + 2 bound derived from the INITIAL node count — a 64-member
    duplicate clique or a long chain peels fine without tuning — and
    raises rather than returning a wrong partial only if the monotone-
    shrink invariant is somehow violated. Pass an int to cap tighter.
    Lineage is CUT each pass with ``localCheckpoint`` (or a
    reliable checkpoint under ``checkpoint_dir``) — the connected_
    components discipline: persist alone leaves the LOGICAL plan
    nesting pass-over-pass and Catalyst re-analysis time compounds to
    minutes by round ~10 even on a toy graph (measured).

    Returns (node, coreness) for every node that appears in ``pairs``
    (isolated nodes never appear — a pair graph has no degree-0 rows),
    as a checkpointed frame (no live lineage into the peel rounds).
    """
    spark = pairs.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
        cut = lambda df: df.checkpoint()  # noqa: E731
    else:
        cut = lambda df: df.localCheckpoint()  # noqa: E731
    edges = cut(
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = edges.select("a", "b").unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    # the live node set is tracked EXPLICITLY: a node whose last
    # neighbor is doomed leaves the edge set without ever being doomed
    # itself (degree drops to 0 silently) — it must still be peeled at
    # the current level, not lost
    nodes = cut(sym.select("a").distinct())
    if max_rounds is None:
        # removal passes <= |V| (each removes >= 1 node) plus one
        # stable-check pass per k level (<= degeneracy + 1 <= |V|)
        max_rounds = 2 * nodes.count() + 2
    # node-proportional accumulator, checkpointed each round — coreness
    # rows are NEVER collected to the driver
    cores = spark.createDataFrame([], "node long, coreness int")
    k = 1
    rounds = 0
    while True:
        # peel at level k until stable
        while True:
            rounds += 1
            if rounds > max_rounds:
                raise RuntimeError(
                    f"core_decomposition exceeded {max_rounds} peel passes"
                )
            deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
            survivors = deg.filter(F.col("deg") >= k).select("a")
            doomed = cut(nodes.join(survivors, "a", "left_anti"))
            n_doomed = doomed.count()  # one convergence scalar per pass
            if n_doomed == 0:
                break
            # removed while peeling level k ⇒ coreness k−1
            cores = cut(
                cores.unionByName(
                    doomed.select(
                        F.col("a").alias("node"),
                        F.lit(k - 1).cast("int").alias("coreness"),
                    )
                )
            )
            edges = cut(
                edges.join(
                    doomed.withColumnRenamed("a", "x"),
                    edges["a"] == F.col("x"),
                    "left_anti",
                )
                .join(
                    doomed.withColumnRenamed("a", "y"),
                    edges["b"] == F.col("y"),
                    "left_anti",
                )
            )
            sym = edges.select("a", "b").unionByName(
                edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
            )
            nodes = cut(nodes.join(doomed, "a", "left_anti"))
        if nodes.count() == 0:
            break
        k += 1
    return cores


def label_propagation(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    rounds: int = 3,
) -> DataFrame:
    """(node, community, community_size) by synchronous label propagation
    over an undirected pair graph — the fifth graph signal next to
    connected components (membership), triangles (local cohesion),
    PageRank (centrality) and coreness (density shells): LPA splits a
    component along its internal density structure, so two dup clusters
    bridged by one accidental near-match get DIFFERENT communities where
    CC fuses them.

    Semantics (fixed, so a SQL oracle can unroll them): every node
    starts labeled with its own id; each round, a node adopts the label
    with the highest count among its NEIGHBORS' current labels, ties
    broken by the smallest label; ``rounds`` is a fixed parameter (the
    synchronous variant — deterministic under any partitioning, unlike
    the asynchronous coin-flip LPA in the original paper).

    Scale shape: NO driver loop state — exactly ``rounds`` repetitions
    of (edge⋈label hash join, groupBy(node, label) count, one
    row_number window PARTITIONED BY node over ≤deg(node) rows). Label
    frames are |V| rows. r15 optimization (guide §1.2): nothing in a
    round returns to the driver, so the rounds CHAIN LAZILY — each
    round's frame is consumed exactly once by the next (linear plan
    growth, ~6 operators per round), and the final materialization
    executes the whole loop as ONE query instead of paying a
    persist+count job per round (the old pattern also left every
    round's cache pinned until the next round's action)."""
    e = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("u"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )

    from pyspark.sql import Window

    for _ in range(rounds):
        counted = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy(sym["u"].alias("n2"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("n2").orderBy(
            F.col("c").desc(), F.col("lbl")
        )
        labels = (
            counted.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("n2").alias("node"), "lbl")
        )

    # the final round's labels feed TWO consumers (sizes + the join) —
    # cut and cache here so the loop executes once, not twice
    labels = labels.localCheckpoint(eager=True)
    sizes = labels.groupBy("lbl").agg(
        F.count(F.lit(1)).alias("community_size")
    )
    out = labels.join(sizes, "lbl").select(
        "node",
        F.col("lbl").alias("community"),
        F.col("community_size").cast("long"),
    ).persist()
    out.count()
    sym.unpersist()
    e.unpersist()
    return out
