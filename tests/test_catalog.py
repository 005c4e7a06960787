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
        # multi-probe operating point on the same k-means cells (r15) —
        # rows-only for the same seed-order reason; recall curve in
        # RECALL.md pins the quality gain over single-probe
        "knn_ivf_probe6",
        # float64-matmul summation order differs from the fold in the
        # last ulp — pair-set equality is tested instead
        "embed_near_dup_vec",
        # HLL estimates are engine-specific; pytest bounds the error
        "dau_approx",
        # Datasketches HLL sketch bytes have no DuckDB twin; pytest pins
        # the error bound AND the lossless sub-sketch merge
        "rolling_mau_hll",
        # GK-sketch percentiles are engine-specific; pytest bounds the
        # rank error against the exact (gated, hash-checked) twin
        "price_quantiles_approx",
        # numpy-trained PQ codebooks/codes — the IVF constraint, squared
        "knn_pq",
        "knn_pq_persisted",
        "knn_ivf_pq",
        "knn_ivf_pq_persisted",
        # trained coarse k-means cells (the IVF constraint) over SQ8
        # codes; recall floors + pruning plan guard in tests/test_sq.py
        "knn_ivf_sq8",
        # k-means cells again (SemDeDup); soundness/within-cell
        # completeness pinned against the exact pair set in pytest
        "semantic_dedup",
        # iterative k-core peeling with a DATA-DEPENDENT round count —
        # the one genuinely un-unrollable recursive-CTE constraint
        # (dup_pagerank's fixed 6 iterations unrolled at r13; peeling
        # can't); exact local-peeling-reference pin in tests/test_graph.py
        "dup_cores",
    }, no_oracle


# Never gated regardless of rotation parity: documented twins/subsets
# whose behavior a gated sibling + pytest equality covers, and the
# rows-only entries whose real checks are pytest bounds.
STATIC_UNGATED = {
    "sessionize",  # behavior == session_stats (gated, hash-green)
    "knn_lsh",  # in-memory twin of knn_lsh_persisted
    "knn_ivf",  # in-memory twin of knn_ivf_persisted
    "embed_near_dup_vec",  # pair-set == embed_near_dup (gated)
    "customers_with_orders",  # J5 twin of customers_no_orders
    # honest-name alias of customers_no_orders (r7 verdict #8); the old
    # name stays gated because CORRECTNESS history is keyed on it
    "customers_no_fulfilled_orders",
    "dau_first_visit",  # A2 twin of dau
    "multimodal_resize",  # same Arrow pipeline as multimodal_features
    "multimodal_frames",  # same Arrow pipeline as multimodal_features
    # bounded-memory sketch twin of the gated price_quantiles
    "price_quantiles_approx",
    # round-6 rotation OUT (slots feed the two rotating sets):
    "corpus_clean",  # subset of gated corpus_clean_near/corpus_curate
    "embed_near_dup_lsh",  # OR-construction twin of embed_near_dup
    "join_dedup",  # J2 dedup subsumed by gated windowed_order_join
    "skew_salted_agg",  # salting gated via skew_salted_join
    "dau_approx",  # rows-only row; 5% error bound lives in pytest
    "rolling_mau_hll",  # rows-only: sketch-index reach, pytest-bounded
    "knn_ivf_persisted",  # rows-only row; recall+path-equality pytest
    "knn_pq",  # rows-only; recall floor + determinism in pytest
    "knn_pq_persisted",  # rows-only; persisted≡in-memory pytest
    "knn_ivf_pq",  # rows-only; recall + partition-prune plan guard
    # rows-only; persisted≡in-memory + entry-level pruning pytest
    "knn_ivf_pq_persisted",
    # rows-only; SemDeDup soundness/completeness pytest vs exact pairs
    "semantic_dedup",
    # rows-only IVF-SQ8 (trained coarse cells); recall floors + pruning
    # plan guard in tests/test_sq.py
    "knn_ivf_sq8",
    # rows-only multi-probe IVF operating point (r15); recall-curve
    # ordering + probe-monotonicity pytests in tests/test_similarity.py
    # and tests/test_recall_clustered.py; curve in RECALL.md
    "knn_ivf_probe6",
    # rows-only iterative k-core peeling; exact local-reference pin
    "dup_cores",
}


def test_gate_budget(registry):
    """The driver's correctness gate budgets 50 rows: exactly that many
    entries are gated; the ungated remainder is the pinned static set of
    twins/subsets plus whichever POOL names are outside this round's
    window. The pool itself is pinned in plans/rotation.py (drift-guarded
    here); only the window selection is dynamic."""
    import glob as _glob
    import os as _os

    from sparkstreaming_gmall_scala_spark.plans.rotation import (
        CORE,
        POOL,
        SET_A,
        SET_B,
        active_rotation,
    )

    # the always-gated spine (round-9 gate restructure): pinned contents;
    # each name is statically gated at registration and NOT in POOL
    assert CORE == (
        "trademark_stat",
        "pricing_summary",
        "order_enrich",
        "first_order_flag",
        "payment_allocation",
        "cdc_route",
        "windowed_order_join",
        "dau",
        "session_stats",
        "dedup_exact",
        "minhash_lsh_pairs",
        "knn_bruteforce",
        "doc_quality",
        "asof_last_click",
    )
    assert not set(CORE) & set(POOL)
    assert {n for n, q in registry.items() if q.gated and n not in set(POOL)} == set(
        CORE
    )

    # the pool: pinned contents + cycle ORDER (the window arithmetic is
    # anchored on it — round 6 gated POOL[0:6], round 7 POOL[6:12]),
    # no duplicates, all oracle-bearing
    assert POOL == (
        "gopher_quality",
        "token_entropy",
        "line_dedup",
        "corpus_curate",
        "containment_pairs",
        "hourly_event_rollup",
        "model_score",
        "chunk_tokens",
        "pack_sequences",
        "pii_mask",
        "corpus_features",
        "corpus_curate_fast",
        "dup_spans",
        "lm_perplexity",
        "cut_spans",
        "dsir_select",
        "ccnet_buckets",
        "bloom_decontaminate",
        "dedup_keep_best",
        "token_mix",
        "corpus_to_shards",
        "shuffle_shards",
        "media_dedup",
        "hard_negatives",
        "knn_sq8",
        "bpe_pairs",
        "script_mix",
        "winnow_fingerprints",
        "vocab_top_tokens",
        "event_funnel",
        "user_retention",
        "shipping_priority",
        "returned_item_report",
        "event_ohlc",
        "local_supplier_volume",
        "heavy_hitters_cms",
        "customer_status_history",
        "zorder_keys",
        "value_histogram",
        "large_volume_orders",
        "order_priority_pivot",
        "dup_triangles",
        "orders_with_status_asof",
        "table_profile",
        "user_value_ma",
        "late_order_priority",
        "volume_shipping",
        "market_share",
        "customer_distribution",
        "promo_revenue",
        "top_supplier",
        "small_qty_revenue",
        "disjunctive_revenue",
        "waiting_suppliers",
        "sales_opportunity",
        "expectations_check",
        "fk_orphans",
        "user_spend_range_7d",
        "order_value_percentiles",
        "hourly_gap_fill",
        "revenue_pareto",
        "events_sample_k",
        "value_outliers",
        # round-9 restructure: former statically-gated names, appended
        # alphabetically BEHIND the never-driver-checked backlog
        "boilerplate_ngrams",
        "corpus_clean_near",
        "customer_buckets",
        "customers_no_orders",
        "date_derive",
        "decontaminate",
        "doc_fingerprint",
        "doc_repetition",
        "doc_token_stats",
        "domain_mix",
        "dup_clusters",
        "embed_centroids",
        "embed_near_dup",
        "json_extract",
        "knn_lsh_persisted",
        "lang_id",
        "multimodal_features",
        "ngram_jaccard_pairs",
        "order_gaps",
        "order_status_cube",
        "orders_next_30d",
        "price_quantiles",
        "revenue_rollup",
        "running_user_spend",
        "set_ops",
        "simhash",
        "skew_salted_join",
        "stratified_sample",
        "tfidf_top_terms",
        "topk_parts_per_brand",
        # round-9 TPC-H completion
        "min_cost_supplier",
        "promo_share_simple",
        "product_profit",
        "important_stock",
        "shipmode_priority",
        "supplier_part_count",
        "excess_inventory",
        "value_quantiles_stream",
        "type_value_quantiles",
        "weighted_doc_sample",
        "corpus_split",
        # round-9 interval analytics
        "session_concurrency",
        "sessions_in_outage",
        # round-9 retrieval + entity resolution
        "bm25_search",
        "part_name_matches",
        # round-9 time-weighted average
        "twap_daily",
        # round-9 attribution / n-gram LM / robust outliers / hopping
        "revenue_attribution",
        "bigram_lm",
        "mad_outliers",
        "hopping_event_stats",
        # round-9 cross-series stats
        "type_hour_chi2",
        "daily_value_corr",
        # round-9 Markov transitions
        "event_transitions",
        # round-9 skew diagnostic + postings index
        "key_skew_profile",
        "term_postings",
        # round-9 conversion-latency bands
        "conversion_lag",
        # round-10 real-codec multimodal round trip
        "media_roundtrip",
        # round-10 co-occurrence/PMI prep + positional phrase retrieval
        "skipgram_cooc",
        "phrase_search",
        # round-10 exact rolling window-distinct + path mining
        "rolling_dau_7d",
        "top_event_paths",
        # round-10 experiment stats + regression-over-aggregates
        "welch_t_nation",
        "revenue_trend",
        # round-10 SCD2 snapshot reconciliation diff
        "dim_snapshot_diff",
        # round-10 bidirectional nearest-in-time join
        "nearest_click",
        # round-10 exact decile profile, Spearman rank corr, CUSUM change point
        "order_value_deciles",
        "spend_orders_spearman",
        "revenue_changepoint",
        # round-10 entity-resolution clusters
        "name_entity_clusters",
        # round-10 refresh through the CDC apply
        "cdc_refresh_totals",
        # round-10 winsorized robust mean
        "winsorized_value_mean",
        # round-10 audience intersection + KWIC concordance
        "audience_overlap",
        "keyword_contexts",
        # round-10 revenue concentration
        "revenue_gini",
        # round-10 market-basket brand affinity
        "brand_affinity",
        # round-10 Kaplan-Meier survival curve
        "user_survival",
        # round-10 label-quality confusion audit
        "lang_confusion",
        # round-10 exact fixed-point EWMA forecast
        "revenue_ewma",
        # round-11 streaming market-basket twin (carry counter indexes)
        "brand_affinity_stream",
            # round-11 CRM scoring + cohort economics
        "rfm_segments",
        "cohort_ltv",
        # round-11 robust regression (median pairwise slope)
        "theil_sen_trend",
        # round-11 data-quality audits (first-digit law, conjectured FDs)
        "benford_check",
        "fd_check",
        # round-11 directional association rules over the baskets
        "assoc_rules",
        # round-11 behavioral profiles (Simpson diversity, Goh-Barabasi
        # burstiness) and the seasonal-baseline anomaly screen
        "user_diversity",
        "user_burstiness",
        "seasonal_outliers",
        # round-11 revenue concentration (HHI next to Gini)
        "hhi_concentration",
        # round-11 corpus geometry + novelty (data-mixing diagnostics)
        "domain_unigram_cosine",
        "ngram_novelty",
        # round-11 statistical-test family: exact two-sample KS, Kendall
        # tau-b, Wald-Wolfowitz runs, day-of-week ANOVA
        "ks_spend_by_status",
        "kendall_tau_daily",
        "revenue_runs_test",
        "dow_anova",
        # round-11 corpus/embedding quality screens
        "embedding_norm_audit",
        "length_tail_docs",
        "lang_id_margin",
        # round-11 growth reporting + the Lorenz curve behind Gini
        "revenue_mom",
        "spend_lorenz",
        # round-12 live directional rules off the basket counter indexes
        "assoc_rules_live",
        # round-12 statistical tests: exact Mann-Whitney U (rank test off
        # the value histogram), Mann-Kendall trend significance, Cramér's
        # V effect size, lag-k autocorrelation
        "mwu_spend_by_status",
        "mann_kendall_trend",
        "cramers_v_type_hour",
        "revenue_acf",
        # round-12 operational/data-quality audits: SPC control-chart
        # rules, header-vs-lines invoice reconciliation
        "spc_violations",
        "order_price_reconcile",
        # round-12 LLM data-mixing + tokenizer diagnostics
        "domain_mixture_weights",
        "token_fertility",
        # round-12 batch 2: dedup savings report, fulfillment-SLA and
        # weekly-profile exact quartiles, brand share drift
        "dedup_savings",
        "ship_lag_quantiles",
        "dow_revenue_quartiles",
        "share_drift",
        # round-12 live SPC monitor off the additive daily index
        "spc_violations_live",
        # round-12 batch 3: lead-lag cross-correlation, repeat-purchase
        # cadence, vocabulary coverage curve
        "lag_lead_xcorr",
        "interorder_gap_quantiles",
        "vocab_coverage_curve",
        # round-12 batch 4: detrended weekly factors, dup provenance
        # matrix, basket-width certificate
        "dow_seasonal_factors",
        "dup_cross_source",
        "basket_size_dist",
        "dow_seasonal_factors_live",
        # round-12 batch 5: deterministic KMV sketch, Brown-Forsythe,
        # Holt level+trend smoothing
        "kmv_distinct_daily",
        "levene_bf_status",
        "holt_forecast",
        "kmv_distinct_stream",
        "jl_projection_audit",
        # round-12 batch 6: live smoothing monitors (nation-daily mart)
        "revenue_ewma_live",
        "holt_forecast_live",
        # round-12 batch 7: KMV sketch set algebra
        "kmv_set_ops",
        # round-12 batch 8: live BM25 search (postings index)
        "bm25_search_live",
        # round-12 batch 9: hybrid lexical+dense retrieval (RRF)
        "hybrid_search_rrf",
        "mmr_rerank",
        "hybrid_search_rrf_live",
        # round-12 batch 10: bucketed co-located join
        "bucketed_customer_orders",
        # round-13: co-bucketed order header x detail (the reference J1 shape)
        "bucketed_order_lineitem",
        # round-13: isotonic calibration applied (quality -> P(keep))
        "calibrated_quality_scores",
        # round-13: rows-only → full-oracle upgrades (exact scaled-integer
        # minimax key for isotonic; unrolled fixed-iteration PageRank)
        "isotonic_revenue",
        "isotonic_revenue_live",
        "dup_pagerank",
        # round-13: dt-partitioned layout — static + dynamic pruning
        "events_day_prune",
        "events_dpp_join",
        # round-13: partition-grained idempotent ingest (replay inside
        # the builder — the hash-match is the exactly-once proof)
        "events_ingest_rollup",
        # round-13: persisted SQ8 probe (now sharing knn_sq8's oracle)
        "knn_sq8_persisted",
        # round-13: label-propagation communities (3 unrolled rounds)
        "dup_communities",
        # round-13: live calibration curve off the streaming per-doc
        # mart (min-per-fingerprint label monoid)
        "calibrated_quality_scores_live",
        # round-14: the calibration->curation loop closed (threshold on
        # the calibrated P(keep) inside the single-scan curation)
        "corpus_curate_calibrated",
        # round-14: the compaction lifecycle end-to-end
        "events_compacted_rollup",
        # round-14: the dup-graph family's banded-LSH scale twin
        "dup_communities_lsh",
        # round-14: prefix-filtered exact set-similarity join
        "jaccard_prefix_pairs",
        # round-14: Pareto-frontier document selection
        "doc_skyline",
        # round-14: exact-integer power-iteration spectral audit
        "embed_spectral_audit",
        # round-14: the live twin off the streaming Gram mart
        "embed_spectral_audit_live",
        # round-14: bucket pruning + schema evolution
        "bucketed_point_lookup",
        "events_schema_evolution",
        # round-14: dup_pagerank's banded-LSH scale twin
        "dup_pagerank_lsh",
        # round-14: the CENTERED spectral audit (true PCA direction)
        "embed_pca_audit",
        # round-15: exact-integer Lloyd k-means + its full-oracle IVF
        "embed_kmeans",
        "knn_ivf_det",
        # round-15: greedy k-center coreset selection
        "kcenter_select",
        # round-15: SemDeDup's full-oracle twin over the exact cells
        "semantic_dedup_det",
        # round-15: centroid-drift monitor + its streaming-mart twin
        "cluster_drift",
        "cluster_drift_live",
        # round-15: the BPE training loop, oracle-checked
        "bpe_train_merges",
    )
    assert len(set(POOL)) == len(POOL)
    assert SET_A == POOL[0:6] and SET_B == POOL[6:12]
    for n in POOL:
        assert registry[n].oracle is not None, n

    # independent recomputation of the window: round N ⇔ N−1 CORRECTNESS
    # files in the repo root. Rounds ≤8 (historical): 6-name window from
    # ((N−6)*6); rounds 9–14: 36-name window from (18 + (N−9)*36),
    # anchored where round 8's window ended; rounds ≥15: re-anchored at
    # (15 + (N−15)*36) where round 14's wrap window ended, so in-round
    # POOL appends can never shift an already-started window (the V2 raw
    # start first exceeded len(POOL) at round 15 — see rotation.py).
    def window(n_round):
        if n_round <= 8:
            s, w = ((n_round - 6) * 6) % len(POOL), 6
        elif n_round < 15:
            s, w = (18 + (n_round - 9) * 36) % len(POOL), 36
        else:
            s, w = (15 + (n_round - 15) * 36) % len(POOL), 36
        return {POOL[(s + i) % len(POOL)] for i in range(w)}

    repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    n_files = len(_glob.glob(_os.path.join(repo_root, "CORRECTNESS_r*.json")))
    expect_active = window(n_files + 1)
    assert set(active_rotation()) == expect_active

    # the round-9 window is exactly POOL[18:54] — 36 first-ever driver
    # rows (the round-8 verdict's ≥30-new-rows criterion), and the
    # pre-r9 never-driver-checked backlog (POOL[18:63]) clears by r10
    assert window(9) == set(POOL[18:54])
    assert set(POOL[18:63]) <= window(9) | window(10)

    # every pool name gets a driver row at least once per cycle (the
    # rotation's whole point) — measured from the V3 anchor: windows
    # step by 36 mod len(POOL), so ceil(len/36)+1 consecutive rounds
    # cover every index. (POOL[13:15] sit just behind the anchor; they
    # are not a backlog — both carry fresh r14 driver rows from round
    # 14's wrap window and re-gate when the V3 cycle wraps to them.)
    windows = set()
    for r in range(15, 15 + (len(POOL) + 35) // 36 + 1):
        windows |= window(r)
    assert windows == set(POOL)

    gated = {n for n, q in registry.items() if q.gated}
    ungated = set(registry) - gated
    assert len(gated) == 50, len(gated)
    inactive = set(POOL) - expect_active
    assert ungated == STATIC_UNGATED | inactive, ungated
    # every gated row is a full hash-checked oracle row (the rows-only
    # entries are statically ungated since round 6)
    assert {n for n in gated if registry[n].oracle is None} == set()


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


def _gen_catalog():
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    import gen_catalog

    return gen_catalog


def test_catalog_md_is_current():
    """CATALOG.md must equal a fresh render of the registry — the
    committed table can't drift from the code."""
    import os

    gen_catalog = _gen_catalog()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CATALOG.md",
    )
    with open(path) as f:
        committed = f.read()
    assert committed == gen_catalog.render()


def test_catalog_render_is_round_invariant(tmp_path, monkeypatch):
    """Round-7 verdict regression: the committed CATALOG.md (and hence the
    pin test above) must not depend on how many CORRECTNESS_r*.json files
    exist — the driver writing the current round's file mid-session used
    to flip the rendered Gate labels and turn the suite red. Render with
    the rotation pointed at repo roots holding N and N+1 stub files and
    require byte-identical output."""
    from sparkstreaming_gmall_scala_spark.plans import rotation

    gen_catalog = _gen_catalog()
    renders = []
    windows = []
    for n_files in (7, 8):
        d = tmp_path / f"files{n_files}"
        d.mkdir()
        for i in range(1, n_files + 1):
            (d / f"CORRECTNESS_r{i:02d}.json").write_text("{}")
        monkeypatch.setattr(rotation, "_REPO_ROOT", str(d))
        # sanity: the stub count really does shift the rotation window …
        windows.append(rotation.active_rotation())
        renders.append(gen_catalog.render())
    assert windows[0] != windows[1]
    # … but the rendered catalog is byte-identical either way
    assert renders[0] == renders[1]
