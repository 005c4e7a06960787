"""Catalog contract: every registered query builds and returns rows with a
stable schema at sf0.001; entry() smoke-runs; oracle SQL strings exist for
every SQL-expressible query."""

from __future__ import annotations

import pytest

from sparkstreaming_gmall_scala_spark.plans.catalog import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_registry_nonempty_and_documented(registry):
    assert len(registry) >= 20
    for name, q in registry.items():
        assert q.doc, f"{name} has no docstring"


def test_oracle_coverage(registry):
    """Queries without an oracle must be the documented non-SQL ones only."""
    no_oracle = {n for n, q in registry.items() if q.oracle is None}
    assert no_oracle == {
        # k-means seeds order by Spark's Murmur3 hash — not reproducible
        # in DuckDB SQL, so the IVF family stays rows-only + recall tests
        "knn_ivf",
        "knn_ivf_persisted",
        # float64-matmul summation order differs from the fold in the
        # last ulp — pair-set equality is tested instead
        "embed_near_dup_vec",
        # HLL estimates are engine-specific; pytest bounds the error
        "dau_approx",
        # GK-sketch percentiles are engine-specific; pytest bounds the
        # rank error against the exact (gated, hash-checked) twin
        "price_quantiles_approx",
    }, no_oracle


def test_gate_budget(registry):
    """The driver's correctness gate budgets 50 rows: exactly that many
    entries are gated, ungated entries are the documented twins whose
    behavior a gated sibling + pytest equality covers, and gated rows-only
    entries (no oracle) are the two genuinely non-SQL ones."""
    gated = {n for n, q in registry.items() if q.gated}
    ungated = set(registry) - gated
    assert len(gated) == 50, len(gated)
    assert ungated == {
        "sessionize",  # behavior == session_stats (gated, hash-green)
        "knn_lsh",  # in-memory twin of knn_lsh_persisted
        "knn_ivf",  # in-memory twin of knn_ivf_persisted
        "embed_near_dup_vec",  # pair-set == embed_near_dup (gated)
        # round-5 rotation: near-twins of gated siblings, swapped out so
        # the four distinct corpus-quality behaviors (doc_repetition,
        # decontaminate, domain_mix, boilerplate_ngrams) got driver
        # CORRECTNESS rows. Still registered, benched, pytest-covered.
        "customers_with_orders",  # J5 twin of customers_no_orders
        "dau_first_visit",  # A2 twin of dau
        "multimodal_resize",  # same Arrow pipeline as multimodal_features
        "multimodal_frames",  # same Arrow pipeline as multimodal_features
        # corpus-assembly extensions past the budget — full oracles,
        # checked by tools/verify_local + invariant pytests
        "chunk_tokens",
        "pack_sequences",
        # full oracle; branch behavior (the corpus has no PII) pinned by
        # tests/test_cleaning.py on crafted rows
        "pii_mask",
        # bounded-memory sketch twin of the gated price_quantiles
        "price_quantiles_approx",
        # classifier-filter scoring plumbing (deterministic fake model —
        # the multimodal stub discipline)
        "model_score",
        # round-6 rotation OUT (slots freed for the round-5 families —
        # gopher_quality, token_entropy, line_dedup, corpus_curate,
        # containment_pairs, hourly_event_rollup are now gated):
        "corpus_clean",  # subset of gated corpus_clean_near/corpus_curate
        "embed_near_dup_lsh",  # OR-construction twin of embed_near_dup
        "join_dedup",  # J2 dedup subsumed by gated windowed_order_join
        "skew_salted_agg",  # salting gated via skew_salted_join
        "dau_approx",  # rows-only row; 5% error bound lives in pytest
        "knn_ivf_persisted",  # rows-only row; recall+path-equality pytest
        # round-6 single-scan curation (verdict #2): full oracles; the
        # one-documents-scan property is plan-guarded and fast ≡ composed
        # is pinned in tests/test_curation.py
        "corpus_features",
        "corpus_curate_fast",
    }, ungated
    gated_no_oracle = {
        n for n in gated if registry[n].oracle is None
    }
    # round-6 rotation demoted both rows-only entries: every gated row is
    # now a full hash-checked oracle row.
    assert gated_no_oracle == set()


@pytest.mark.parametrize(
    "name", sorted(load_all().keys())
)
def test_query_builds_and_runs(spark, sf_dir, registry, name):
    df = registry[name].builder(spark, sf_dir)
    # schema is stable (non-empty, named columns) and the plan executes
    assert df.columns
    assert df.count() >= 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())


def test_ungated_sessionize_twin_agrees_with_session_stats(spark, sf_dir, registry):
    """The gate-budget rationale for ungating sessionize is that its
    behavior IS session_stats': aggregating sessionize's per-event session
    ids (min ts, max ts + gap, count) must reproduce session_stats row for
    row on the same data."""
    from pyspark.sql import functions as F

    from sparkstreaming_gmall_scala_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    sess = registry["sessionize"].builder(spark, sf_dir)
    derived = (
        sess.join(ev, ["user_id", "event_id"])
        .groupBy("user_id", "session_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            (F.unix_micros(F.max("ts")) + 1800 * 1_000_000).alias(
                "session_end_us"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("session_id")
    )
    stats = registry["session_stats"].builder(spark, sf_dir)
    cols = ["user_id", "session_start_us", "session_end_us", "n_events"]
    a = sorted(tuple(r) for r in derived.select(cols).collect())
    b = sorted(tuple(r) for r in stats.select(cols).collect())
    assert a == b
