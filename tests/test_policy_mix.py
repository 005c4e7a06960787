"""Cluster keep-policy (dedup_keep_best) and token-budget mixture
(token_mix): semantic invariants beyond the oracle hash check."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.dedup import (
    connected_components,
    jaccard_pairs,
    keep_best_per_cluster,
    shingle_rows,
)
from sparkstreaming_gmall_scala_spark.operators.sampling import (
    mixture_thresholds,
    token_budget_mix,
)
from sparkstreaming_gmall_scala_spark.operators.textstats import quality_score
from sparkstreaming_gmall_scala_spark.sources import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _keep_best(spark, sf_dir):
    d = _docs(spark, sf_dir)
    pairs = jaccard_pairs(
        shingle_rows(d, "doc_id", "text", n=3), "doc_id", max_df=20,
        threshold=0.5,
    ).select("id_a", "id_b")
    cc = connected_components(pairs)
    scored = quality_score(d, "doc_id", "text").select("doc_id", "quality")
    return keep_best_per_cluster(scored, cc, "doc_id", "quality").collect()


def test_exactly_one_keep_per_cluster_and_it_is_the_best(spark, sf_dir):
    rows = _keep_best(spark, sf_dir)
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert any(len(rs) > 1 for rs in by_cluster.values()), (
        "test corpus must contain at least one non-trivial cluster"
    )
    for cid, rs in by_cluster.items():
        keeps = [r for r in rs if r["keep"]]
        assert len(keeps) == 1, (cid, rs)
        best = min(rs, key=lambda r: (-r["quality"], r["doc_id"]))
        assert keeps[0]["doc_id"] == best["doc_id"]


def test_every_doc_appears_and_singletons_keep(spark, sf_dir):
    rows = _keep_best(spark, sf_dir)
    n_docs = _docs(spark, sf_dir).count()
    assert len(rows) == n_docs
    singles = [r for r in rows if r["cluster_id"] == r["doc_id"]]
    # singleton clusters (or cluster roots) exist and every true
    # singleton keeps: a cluster of size 1 has exactly its own row
    sizes: dict[int, int] = {}
    for r in rows:
        sizes[r["cluster_id"]] = sizes.get(r["cluster_id"], 0) + 1
    for r in rows:
        if sizes[r["cluster_id"]] == 1:
            assert r["keep"], r
    assert singles


def test_token_mix_matches_driver_side_threshold_recipe(spark, sf_dir):
    """The kept set must be exactly {doc : hash(doc_id) <= thr[source]}
    with thresholds from mixture_thresholds over the per-source TOKEN
    sums — recomputed independently here."""
    d = _docs(spark, sf_dir)
    toks = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit("")
        )
    )
    dd = d.select("doc_id", "source", toks.alias("nt"))
    weights = {"src0": 0.5, "src1": 0.25, "src2": 0.125}
    kept = {
        r["doc_id"]
        for r in token_budget_mix(
            dd, "doc_id", "source", "nt", weights, 0.5,
            default_weight=0.0078125,
        ).collect()
    }
    rows = dd.collect()
    counts: dict[str, int] = {}
    for r in rows:
        counts[r["source"]] = counts.get(r["source"], 0) + r["nt"]
    thr = mixture_thresholds(counts, weights, 0.5, 0.0078125)
    import hashlib

    expect = {
        r["doc_id"]
        for r in rows
        if thr.get(r["source"], -1) >= 0
        and hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4]
        <= format(thr[r["source"]], "04x")
    }
    assert kept == expect


def test_token_mix_hits_expected_token_shares(spark, sf_dir):
    """The point of the operator: kept TOKEN counts per source track the
    target token budget (hash-uniform expectation, ±25% at 500-doc
    scale), where the doc-count mixture would measurably miss for
    sources whose doc-length distribution differs."""
    d = _docs(spark, sf_dir)
    toks = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit("")
        )
    )
    dd = d.select("doc_id", "source", toks.alias("nt"))
    weights = {"src0": 0.5, "src1": 0.25, "src2": 0.125}
    rows = dd.collect()
    counts: dict[str, int] = {}
    for r in rows:
        counts[r["source"]] = counts.get(r["source"], 0) + r["nt"]
    total = sum(counts.values())
    budget = math.floor(total * 0.5)
    kept = token_budget_mix(
        dd, "doc_id", "source", "nt", weights, 0.5, default_weight=0.0078125
    )
    got = {
        r["source"]: r["kt"]
        for r in kept.groupBy("source").agg(F.sum("nt").alias("kt")).collect()
    }
    for src, w in weights.items():
        target = min(counts[src], math.floor(budget * w))
        assert abs(got.get(src, 0) - target) <= 0.25 * target + 50, (
            src, got.get(src, 0), target,
        )
