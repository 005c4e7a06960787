"""DSIR importance selection + CCNet perplexity buckets.

Cross-engine value parity for both operators lives in
tests/test_oracle_parity.py (auto-discovered full-oracle entries); these
tests pin the SEMANTIC properties parity can't see: that the weights
actually rank target-like docs first, that scores are partition-count
invariant (the nano-quantization contract), and that the scoring join
broadcasts the bucket model instead of shuffling the corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.dsir import (
    DSIR_TAU,
    dsir_logweights,
    dsir_select,
    hashed_ngram_buckets,
)
from sparkstreaming_gmall_scala_spark.operators.textstats import (
    perplexity_buckets,
)
from sparkstreaming_gmall_scala_spark.sources import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_feature_count_is_unigrams_plus_bigrams(spark, sf_dir):
    """n_feats must equal n_tokens + max(n_tokens − 1, 0) — every unigram
    and every adjacent bigram occurrence, nothing dropped by hashing."""
    d = _docs(spark, sf_dir)
    per = (
        hashed_ngram_buckets(d, "doc_id", "text", b=64)
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_feats"))
    )
    toks = d.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("n"),
    )
    bad = (
        per.join(toks, "doc_id")
        .filter(
            F.col("n_feats")
            != F.col("n") + F.greatest(F.col("n") - 1, F.lit(0))
        )
        .count()
    )
    assert bad == 0


def test_weights_rank_target_language_first(spark, sf_dir):
    """The whole point of DSIR: with the English subset as target, the
    mean weight of English docs must clearly exceed every other
    language's, and the keep set must be target-enriched relative to the
    corpus."""
    d = _docs(spark, sf_dir)
    sel = dsir_select(d, d.filter(F.col("lang") == "en"), "doc_id", "text")
    by_lang = (
        sel.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.avg("avg_logw").alias("m"),
            F.avg(F.col("keep").cast("double")).alias("keep_rate"),
        )
        .collect()
    )
    means = {r["lang"]: r["m"] for r in by_lang}
    keeps = {r["lang"]: r["keep_rate"] for r in by_lang}
    assert all(means["en"] > m for lang, m in means.items() if lang != "en")
    # non-vacuous in BOTH directions, and en-enriched
    assert 0.0 < keeps["en"] < 1.0 or keeps["en"] == 1.0
    assert sum(keeps.values()) > 0
    assert all(
        keeps["en"] > kr for lang, kr in keeps.items() if lang != "en"
    )


def test_scores_partition_invariant(spark, sf_dir):
    """Nano-quantized integer sums ⇒ identical avg_logw no matter how the
    corpus is partitioned."""
    d = _docs(spark, sf_dir)
    tgt = d.filter(F.col("lang") == "en")
    a = dsir_logweights(d, tgt, "doc_id", "text").collect()
    b = dsir_logweights(d.repartition(7), tgt, "doc_id", "text").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_scoring_join_broadcasts_bucket_model(spark, sf_dir):
    """The ≤b-row log-ratio table must broadcast into the per-doc join —
    the property that keeps 100 TB scoring shuffle-free after the first
    groupBy. Guard: the physical plan carries a BroadcastHashJoin and no
    SortMergeJoin on the scoring path."""
    d = _docs(spark, sf_dir)
    sel = dsir_select(d, d.filter(F.col("lang") == "en"), "doc_id", "text")
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_tau_threshold_is_exact_boundary(spark, sf_dir):
    """keep ⇔ avg_logw ≥ tau, row for row (no float drift between the
    flag and the reported score)."""
    d = _docs(spark, sf_dir)
    sel = dsir_select(
        d, d.filter(F.col("lang") == "en"), "doc_id", "text"
    ).collect()
    for r in sel:
        assert r["keep"] == (r["avg_logw"] >= DSIR_TAU)


def test_ccnet_tiles_are_balanced_per_stratum(spark, sf_dir):
    """NTILE(3) contract: within each source the three tiles differ in
    size by at most one, labels map 1/2/3 → head/middle/tail, and head
    scores ≥ tail scores."""
    d = _docs(spark, sf_dir)
    pb = perplexity_buckets(d, "doc_id", "text", "source", k=3)
    rows = pb.collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        sizes = {
            t: sum(1 for r in rs if r["tile"] == t) for t in (1, 2, 3)
        }
        assert max(sizes.values()) - min(sizes.values()) <= 1, (src, sizes)
        for r in rs:
            expect = {1: "head", 2: "middle", 3: "tail"}[r["tile"]]
            assert r["ppl_bucket"] == expect
        head_min = min(r["avg_logprob"] for r in rs if r["tile"] == 1)
        tail_max = max(r["avg_logprob"] for r in rs if r["tile"] == 3)
        assert head_min >= tail_max


def test_ccnet_matches_lm_perplexity_scores(spark, sf_dir):
    """The bucket table's avg_logprob column IS lm_doc_logprob's — the
    stage composes, it doesn't re-derive."""
    from sparkstreaming_gmall_scala_spark.operators.textstats import (
        lm_doc_logprob,
    )

    d = _docs(spark, sf_dir)
    pb = perplexity_buckets(d, "doc_id", "text", "source", k=3)
    lm = lm_doc_logprob(d, "doc_id", "text")
    bad = (
        pb.select("doc_id", "avg_logprob")
        .join(lm.select("doc_id", F.col("avg_logprob").alias("lm")), "doc_id")
        .filter(F.col("avg_logprob") != F.col("lm"))
        .count()
    )
    assert bad == 0
