"""Single-scan curation (round-5 verdict "What's wrong #1"): the feature
table must read the documents parquet exactly once, and filtering it must
reproduce the composed corpus_curate recipe row-for-row."""

from __future__ import annotations

import pytest

from sparkstreaming_gmall_scala_spark.plans.catalog import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


def _walk(node):
    """Yield every node of a physical plan, entering adaptive/query-stage
    wrappers (their subtree hangs off accessor methods, not children())."""
    name = node.nodeName()
    yield node
    if name == "AdaptiveSparkPlan":
        yield from _walk(node.executedPlan())
        return
    if name.endswith("QueryStage"):
        yield from _walk(node.plan())
        return
    if name.startswith("ReusedExchange"):
        yield from _walk(node.child())
        return
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def _is_file_scan(node) -> bool:
    n = node.nodeName()
    return "Scan parquet" in n or "FileScan" in n


def test_corpus_features_assembly_never_rescans_parquet(spark, sf_dir):
    """The feature-assembly plan (keeper join, gopher, overlap counts,
    boilerplate join-back, mix filter) must read the persisted base/shingle
    caches only — every leaf is an InMemoryTableScan, zero parquet scans.
    This is the 100 TB property: N curation features cost ONE corpus read,
    not N."""
    from pyspark.sql import functions as F

    from sparkstreaming_gmall_scala_spark.operators.curation import (
        corpus_features,
    )
    from sparkstreaming_gmall_scala_spark.sources import load_table

    # an earlier test may have left the MATERIALIZED feature table in the
    # cache manager, in which case this identical plan would substitute
    # wholesale into one InMemoryTableScan of the result — clear first so
    # the guard inspects the real assembly plan
    spark.catalog.clearCache()
    d = load_table(spark, sf_dir, "documents")
    feats = corpus_features(
        d,
        weights={"src0": 0.5, "src1": 0.25, "src2": 0.125},
        budget_frac=0.5,
        default_weight=0.0078125,
        materialize=False,
    )
    try:
        plan = feats._jdf.queryExecution().sparkPlan()
        nodes = list(_walk(plan))
        file_scans = [n.nodeName() for n in nodes if _is_file_scan(n)]
        assert file_scans == [], file_scans
        imrs = [n for n in nodes if n.nodeName() == "InMemoryTableScan"]
        # r16 fused assembly: base×2 consumers (flags/keeper projection,
        # lm) + shingle×3 (eval set, hit-flagged frame, dfreq)
        assert len(imrs) >= 5, len(imrs)

        # Transitively, the caches themselves bottom out in exactly ONE
        # parquet scan (the pruned base); the shingle cache reads the base
        # cache, not the table.
        # dedupe by the shared CachedRDDBuilder: each InMemoryTableScan
        # occurrence wraps a fresh InMemoryRelation copy (new expr ids),
        # but one cache entry has exactly one builder
        seen: set[int] = set()
        stack = [n.relation() for n in imrs]
        scan_strs: list[str] = []
        while stack:
            rel = stack.pop()
            rid = rel.cacheBuilder().hashCode()
            if rid in seen:
                continue
            seen.add(rid)
            for m in _walk(rel.cachedPlan()):
                if m.nodeName() == "InMemoryTableScan":
                    stack.append(m.relation())
                elif _is_file_scan(m):
                    scan_strs.append(m.toString().split("\n")[0])
        assert len(scan_strs) == 1, scan_strs
        only = scan_strs[0]
        assert "documents" in only, only
        # column-pruned: the one scan reads just (doc_id, text, source)
        assert "o_" not in only and "embedding" not in only
    finally:
        spark.catalog.clearCache()


def test_corpus_curate_fast_equals_composed_recipe(spark, sf_dir, registry):
    """corpus_curate_fast (one scan, feature-table filter) must reproduce
    corpus_curate (five independent stages joined) exactly — one contract,
    two physical strategies."""
    fast = registry["corpus_curate_fast"].builder(spark, sf_dir)
    composed = registry["corpus_curate"].builder(spark, sf_dir)
    a = sorted(tuple(r) for r in fast.collect())
    b = sorted(tuple(r) for r in composed.collect())
    assert a == b
    assert len(a) > 0  # non-vacuous at every test SF


def test_curate_filter_consistent_with_feature_flags(spark, sf_dir, registry):
    """Every kept doc's feature row satisfies the policy conjunction, and
    every dropped doc violates at least one flag — the filter is exactly
    the documented policy over the feature table."""
    from sparkstreaming_gmall_scala_spark.operators.curation import (
        curate_filter,
    )

    from sparkstreaming_gmall_scala_spark.operators.curation import (
        LM_THRESHOLD,
    )

    feats = registry["corpus_features"].builder(spark, sf_dir)
    kept = {r["doc_id"] for r in curate_filter(feats).collect()}
    rows = feats.collect()
    for r in rows:
        ok = (
            r["is_keeper"]
            and r["gopher_keep"]
            and r["n_shared_ngrams"] == 0
            and r["boiler_frac"] < 0.5
            and r["avg_logprob"] >= LM_THRESHOLD
            and r["mix_keep"]
        )
        assert (r["doc_id"] in kept) == ok, r
    # the LM stage is non-vacuous on the test corpus: some doc fails it
    assert any(r["avg_logprob"] < LM_THRESHOLD for r in rows)
