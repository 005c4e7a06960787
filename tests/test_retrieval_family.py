"""Semantic pins for the round-12 retrieval family — beyond the oracle
equality (which the parity suite covers), these check the operators DO
what their names claim: RRF actually fuses both retrievers, MMR actually
diversifies, and the live hybrid equals the batch hybrid."""

from __future__ import annotations


def test_rrf_fuses_both_retrievers(spark, sf_dir):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    rows = (
        load_all()["hybrid_search_rrf"].builder(spark, sf_dir).collect()
    )
    assert len(rows) == 10
    # a doc ranked by BOTH retrievers must outscore one ranked by a
    # single retriever at an equal-or-worse rank — check the points math
    for r in rows:
        want = 0
        if r["lex_rank"] is not None:
            want += 1000000000 // (60 + r["lex_rank"])
        if r["dense_rank"] is not None:
            want += 1000000000 // (60 + r["dense_rank"])
        assert r["rrf_points"] == want
    # the fusion is not degenerate: at least one doc carries a lexical
    # rank and at least one carries a dense rank
    assert any(r["lex_rank"] is not None for r in rows)
    assert any(r["dense_rank"] is not None for r in rows)
    # fused_rank is the dense ordering of rrf_points (ties by doc_id)
    ordered = sorted(rows, key=lambda r: (-r["rrf_points"], r["doc_id"]))
    assert [r["doc_id"] for r in ordered] == [
        r["doc_id"] for r in sorted(rows, key=lambda r: r["fused_rank"])
    ]


def test_mmr_diversifies_relative_to_plain_topk(spark, sf_dir):
    """The MMR top-10's intra-set similarity must not exceed the plain
    relevance top-10's — that's the entire point of the operator. Also:
    the first pick IS the relevance argmax, and every recorded penalty
    equals the max similarity to earlier picks."""
    from sparkstreaming_gmall_scala_spark.operators.similarity import (
        brute_force_topk,
    )
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
    from sparkstreaming_gmall_scala_spark.sources import load_table
    import math

    mmr = sorted(
        load_all()["mmr_rerank"].builder(spark, sf_dir).collect(),
        key=lambda r: r["mmr_rank"],
    )
    assert mmr[0]["pen6"] is None and mmr[0]["mmr_rank"] == 1
    e = load_table(spark, sf_dir, "embeddings")
    plain = [
        r["neighbor_id"]
        for r in brute_force_topk(
            e, e.filter("vec_id = 0"), "vec_id", "embedding", k=10, dim=64
        ).collect()
    ]
    assert mmr[0]["doc_id"] == plain[0]  # first pick = relevance argmax

    def max_pairwise_sim(ids):
        sub = e.filter(e["vec_id"].isin(list(ids)))
        rows = brute_force_topk(
            sub, sub, "vec_id", "embedding", k=len(ids) - 1, dim=64
        ).collect()
        return max(
            int(math.floor(r["score"] * 1e6 + 0.5)) for r in rows
        )

    mmr_ids = [r["doc_id"] for r in mmr]
    assert max_pairwise_sim(mmr_ids) <= max_pairwise_sim(plain)


def test_live_hybrid_equals_batch_hybrid(spark, sf_dir):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    reg = load_all()
    batch = sorted(
        map(tuple, reg["hybrid_search_rrf"].builder(spark, sf_dir).collect())
    )
    live = sorted(
        map(
            tuple,
            reg["hybrid_search_rrf_live"].builder(spark, sf_dir).collect(),
        )
    )
    assert live == batch
