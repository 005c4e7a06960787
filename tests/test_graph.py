"""Triangle counting (operators/graph.py): hand graphs where the answer
is checkable by eye, orientation-independence, and degenerate inputs."""

from __future__ import annotations

from sparkstreaming_gmall_scala_spark.operators.graph import triangle_counts


def _counts(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }


def test_clique_vs_chain(spark):
    # K4 on {1,2,3,4}: every node in C(3,2)=3 triangles; chain 10-11-12-13
    # (no triangle); one extra triangle {20,21,22}
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    chain = [(10, 11), (11, 12), (12, 13)]
    tri = [(20, 21), (21, 22), (20, 22)]
    got = _counts(spark, k4 + chain + tri)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 20: 1, 21: 1, 22: 1}


def test_orientation_of_input_rows_is_irrelevant(spark):
    # same triangle given with endpoints in every order, plus a
    # duplicate-free check that reversed rows don't double-count
    got = _counts(spark, [(2, 1), (3, 2), (1, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_hub_without_closure_has_no_triangles(spark):
    # star: hub 1 connected to 5 leaves, no leaf-leaf edges
    got = _counts(spark, [(1, k) for k in range(2, 7)])
    assert got == {}


def test_self_loops_ignored(spark):
    got = _counts(spark, [(1, 1), (1, 2), (2, 3), (1, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_duplicate_and_both_order_edges_absorbed(spark):
    """Regression: the same undirected edge delivered duplicated and in
    both orders must count each triangle once, not multiplicatively."""
    noisy = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 2), (1, 3)]
    got = _counts(spark, noisy)
    assert got == {1: 1, 2: 1, 3: 1}


def _local_coreness(edges):
    """Trivially-correct reference: repeated peeling on dicts."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    core = {}
    k = 1
    while adj:
        while True:
            doomed = [n for n, nb in adj.items() if len(nb) < k]
            if not doomed:
                break
            for n in doomed:
                core[n] = k - 1
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
            adj = {n: nb for n, nb in adj.items() if True}
        if not adj:
            break
        k += 1
    return core


def test_core_decomposition_matches_local_reference(spark):
    """Mixed shapes: a 4-clique (coreness 3), a triangle glued to a tail
    (triangle nodes 2, tail 1), a chain (all 1), plus duplicate and
    reversed edge rows that must not inflate degrees."""
    from sparkstreaming_gmall_scala_spark.operators.graph import (
        core_decomposition,
    )

    edges = [
        # 4-clique
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        # triangle + tail
        (10, 11), (11, 12), (10, 12), (12, 13),
        # chain
        (20, 21), (21, 22),
        # noise: dup + reversed + self-loop
        (2, 1), (1, 2), (20, 20),
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = core_decomposition(df)
    got = {r["node"]: r["coreness"] for r in out.collect()}
    want = _local_coreness(edges)
    assert got == want
    assert got[1] == 3 and got[13] == 1 and got[10] == 2 and got[22] == 1


def test_core_decomposition_randomized_vs_local(spark):
    import random

    from sparkstreaming_gmall_scala_spark.operators.graph import (
        core_decomposition,
    )

    rng = random.Random(5)
    edges = list(
        {
            (rng.randrange(30), rng.randrange(30))
            for _ in range(120)
        }
    )
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = core_decomposition(df)
    got = {r["node"]: r["coreness"] for r in out.collect()}
    assert got == _local_coreness(edges)


def test_core_decomposition_large_clique_needs_no_cap_tuning(spark):
    """r11 ADVICE: a 70-member duplicate clique (70 copies of one doc is
    entirely plausible in a near-dup corpus) used to blow the fixed
    max_rounds=64 cap — peeling visits every k level 1..69 with a
    mandatory stable-check pass each. The default cap now derives from
    the initial node count, so this peels clean without tuning."""
    from sparkstreaming_gmall_scala_spark.operators.graph import (
        core_decomposition,
    )

    n = 70
    edges = [(a, b) for a in range(n) for b in range(a + 1, n)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["coreness"] for r in core_decomposition(df).collect()}
    assert got == {v: n - 1 for v in range(n)}


# ---------------------------------------------------------------------------
# label propagation (r13): the density split CC can't make
# ---------------------------------------------------------------------------
def _local_lpa(edges, rounds=3):
    """Pure-Python reference of the synchronous min-tie-break LPA."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    lbl = {v: v for v in adj}
    for _ in range(rounds):
        nxt = {}
        for v in adj:
            cnt = Counter(lbl[u] for u in adj[v])
            best = max(cnt.values())
            nxt[v] = min(l for l, c in cnt.items() if c == best)
        lbl = nxt
    return lbl


def test_lpa_splits_bridged_cliques_where_cc_fuses_them(spark):
    from sparkstreaming_gmall_scala_spark.operators.dedup import (
        connected_components,
    )
    from sparkstreaming_gmall_scala_spark.operators.graph import (
        label_propagation,
    )

    tri = lambda base: [  # noqa: E731
        (base, base + 1), (base, base + 2), (base + 1, base + 2)
    ]
    edges = tri(0) + tri(10) + [(2, 10)]  # one accidental bridge
    df = spark.createDataFrame(edges, "id_a long, id_b long")

    cc = connected_components(df.selectExpr("id_a", "id_b"))
    assert cc.select("label").distinct().count() == 1  # CC fuses

    out = label_propagation(df).collect()
    got = {r["node"]: r["community"] for r in out}
    assert got == _local_lpa(edges)
    assert len(set(got.values())) >= 2  # LPA splits
    # the two cliques land in different communities
    assert got[0] == got[1] and got[10] == got[11]
    assert got[0] != got[11]
    # community_size is consistent with membership
    sizes = {r["node"]: r["community_size"] for r in out}
    from collections import Counter

    true_sizes = Counter(got.values())
    assert all(sizes[v] == true_sizes[got[v]] for v in got)


def test_lpa_matches_local_reference_on_random_graph(spark):
    import random

    rng = random.Random(13)
    nodes = list(range(40))
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
            )
            if a != b
        }
    )
    from sparkstreaming_gmall_scala_spark.operators.graph import (
        label_propagation,
    )

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["community"] for r in label_propagation(df).collect()
    }
    assert got == _local_lpa(edges)


def test_lpa_lsh_twin_agrees_with_exact_on_clustered_fixture(spark):
    """dup_communities_lsh's scale contract (r13 verdict #4): on the
    mixture-of-Gaussians fixture the banded-LSH edge derivation is a
    SUBSET of the exact edges with recall above a floor, and the
    communities it produces agree with the exact graph's — both on
    co-membership over the exact same-community edges and on purity
    against the TRUE generative cluster labels. Measured on this seeded
    fixture: edge recall 0.757, co-membership agreement 0.857, purity
    exact 1.0 / lsh 0.9975 — floors set with margin below."""
    from collections import Counter

    from sparkstreaming_gmall_scala_spark.operators.graph import (
        label_propagation,
    )
    from sparkstreaming_gmall_scala_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )
    from sparkstreaming_gmall_scala_spark.plans.llm import _PLANES
    from sparkstreaming_gmall_scala_spark.sources.synth import (
        clustered_embeddings_arrays,
    )

    vecs, labels = clustered_embeddings_arrays(n=400)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact_pairs = cosine_near_dup_pairs(
        e, "vec_id", "embedding", threshold=0.4, dim=64
    ).select("id_a", "id_b")
    lsh_pairs = cosine_near_dup_pairs(
        e, "vec_id", "embedding", threshold=0.4, planes=_PLANES, dim=64
    ).select("id_a", "id_b")
    ep = {tuple(r) for r in exact_pairs.collect()}
    lp = {tuple(r) for r in lsh_pairs.collect()}
    assert lp <= ep  # pruned, never invented
    assert len(lp) / len(ep) >= 0.6  # edge recall floor

    ec = {
        r["node"]: r["community"]
        for r in label_propagation(exact_pairs, rounds=3).collect()
    }
    lc = {
        r["node"]: r["community"]
        for r in label_propagation(lsh_pairs, rounds=3).collect()
    }
    same_exact = [(a, b) for a, b in ep if ec.get(a) == ec.get(b)]
    agree = sum(
        1
        for a, b in same_exact
        if a in lc and b in lc and lc[a] == lc[b]
    )
    assert agree / len(same_exact) >= 0.75  # co-membership floor

    def purity(comm):
        byc = {}
        for node, c in comm.items():
            byc.setdefault(c, []).append(labels[node])
        good = sum(Counter(v).most_common(1)[0][1] for v in byc.values())
        return good / sum(len(v) for v in byc.values())

    assert purity(lc) >= 0.95  # vs the TRUE generative labels


def test_pagerank_lsh_twin_preserves_hub_structure(spark):
    """dup_pagerank_lsh's scale contract: on the clustered fixture the
    LSH-edge PageRank keeps (almost) every ranked node and preserves
    the hub ORDERING — Spearman rank correlation with the exact-graph
    ranks above a floor (measured 0.87 on this seeded fixture; total
    rank mass conserved to ~1e-5 relative, a PageRank invariant)."""
    import numpy as np

    from sparkstreaming_gmall_scala_spark.operators.pagerank import (
        pagerank,
    )
    from sparkstreaming_gmall_scala_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )
    from sparkstreaming_gmall_scala_spark.plans.llm import _PLANES
    from sparkstreaming_gmall_scala_spark.sources.synth import (
        clustered_embeddings_arrays,
    )

    vecs, _ = clustered_embeddings_arrays(n=400)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def ranks(planes):
        pairs = cosine_near_dup_pairs(
            e, "vec_id", "embedding", threshold=0.4, planes=planes, dim=64
        ).select("id_a", "id_b")
        edges = pairs.selectExpr("id_a AS src", "id_b AS dst").unionByName(
            pairs.selectExpr("id_b AS src", "id_a AS dst")
        )
        return {
            r["node"]: r["rank_nano"]
            for r in pagerank(edges, iters=6).collect()
        }

    ex, ap = ranks(None), ranks(_PLANES)
    common = sorted(set(ex) & set(ap))
    assert len(common) / len(ex) >= 0.95  # node coverage
    a = np.array([ex[n] for n in common], dtype=float)
    b = np.array([ap[n] for n in common], dtype=float)
    ra, rb = a.argsort().argsort(), b.argsort().argsort()
    assert np.corrcoef(ra, rb)[0, 1] >= 0.75  # hub-order agreement
