"""Round-robin gate rotation: the driver's correctness gate budgets 50
rows, but the catalog holds more oracle-bearing distinct behaviors than
that. A small pinned CORE (the §2 parity spine) is gated every round;
the remaining gate slots cycle mechanically through a pinned POOL of
oracle-bearing names so every distinct behavior gets an independent
driver CORRECTNESS row at least once per cycle, with no hand-editing of
gate flags between rounds.

History of the arithmetic (append-only discipline — each change anchors
a new regime at a fixed round without disturbing how earlier rounds'
windows are reproduced):

* rounds 5-6 hand-rotated A/B half-sets; round 7 generalized to a
  6-slot cyclic window: round N gates ``POOL[((N-6)*6) % len(POOL):][:6]``
  (round 6 → POOL[0:6], round 7 → POOL[6:12], round 8 → POOL[12:18]).
* round 9 (round-8 verdict #2): 44 names were statically gated every
  round, re-proving queries green since round 3, while 45 POOL names
  had never had a driver row. The static set shrank to the 14-name
  ``CORE``; the other 30 former-static names were APPENDED to POOL
  (they already have 6+ rounds of driver history, so they sit behind
  the never-checked backlog in cycle order), and the window widened to
  ``_SLOTS_V2 = 50 - len(CORE) = 36`` starting exactly where round 8's
  window ended (POOL index 18). Round 9 therefore gates POOL[18:54] —
  36 first-ever driver rows — and the pre-r9 backlog clears at r10.

The round number is inferred from the repo itself: the driver writes
``CORRECTNESS_r{N}.json`` into the repo root after each round's verify,
so at round N's verify exactly N−1 of them exist. Counting files needs
no driver cooperation. Caveat (round-6 advice): the count is only
stable BEFORE the driver writes the current round's file — a verify
re-run after that write would select the next round's window. That is
acceptable by design: every POOL name is all-green against its oracle
(in-suite parity at sf0.001 via tests/test_oracle_parity.py covers
whichever names are ungated this round), so a shifted window can only
change WHICH green rows the driver records, never introduce a failure.

Everything not in CORE or POOL keeps its static ``gated=False`` from
registration: documented twins/subsets stay ungated (their signal lives
in pytest equality with a gated sibling); rows-only entries stay ungated
(a hash-green slot carries more driver signal than a rows-only one).
"""

from __future__ import annotations

import glob
import os

# Always-gated spine (round-8 verdict #2's suggested core): one name per
# §2 parity family — flagship agg chain, allocation, broadcast enrich,
# first-per-group window, CDC routing, stream join, streaming distinct,
# sessionization, exact + MinHash dedup, exact ANN, text quality, as-of
# join, and the TPC-H Q1 shape. These keep an unbroken driver-row
# history; everything else earns its rows through the rotation.
CORE: tuple[str, ...] = (
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

# The rotation pool, in cycle order. APPEND new full-oracle entries at
# the end — prepending or reordering would shift which historical rounds
# gated which names. POOL[0:6] and POOL[6:12] are the round-6 "SET_A" /
# "SET_B" half-sets (kept as named slices for the pinning tests).
POOL: tuple[str, ...] = (
    # round-5 corpus-quality/curation families (first driver rows: r6)
    "gopher_quality",
    "token_entropy",
    "line_dedup",
    "corpus_curate",
    "containment_pairs",
    "hourly_event_rollup",
    # classifier scoring, corpus-assembly manifests, PII masking, and the
    # round-6 single-scan curation pair (first driver rows: r7)
    "model_score",
    "chunk_tokens",
    "pack_sequences",
    "pii_mask",
    "corpus_features",
    "corpus_curate_fast",
    # round-6/7 full-oracle additions (first driver rows: r8)
    "dup_spans",
    "lm_perplexity",
    "cut_spans",
    "dsir_select",
    # round-7 additions (first driver rows: r8/r9)
    "ccnet_buckets",
    "bloom_decontaminate",
    "dedup_keep_best",
    "token_mix",
    "corpus_to_shards",
    "shuffle_shards",
    "media_dedup",
    "hard_negatives",
    # round-8 additions (first driver rows: r9/r10)
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
    # round-8 TPC-H completion (plans/tpch.py; first driver rows: r9/r10)
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
    # round-8 data-quality audit family (plans/scale.py)
    "expectations_check",
    "fk_orphans",
    # round-8 window-surface completion (plans/temporal.py)
    "user_spend_range_7d",
    "order_value_percentiles",
    "hourly_gap_fill",
    "revenue_pareto",
    # round-8 sampling/stats additions (plans/scale.py)
    "events_sample_k",
    "value_outliers",
    # round-9 gate restructure: the 30 pre-r9 statically-gated names that
    # are not in CORE, appended alphabetically. Every one already has 6+
    # rounds of driver CORRECTNESS history, so placing them AFTER the
    # never-driver-checked round-8 block means the backlog drains first.
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
    # round-9 TPC-H completion (Q2/Q6/Q9/Q11/Q12/Q16/Q20 shapes;
    # first driver rows: r11 per the 36-slot window arithmetic)
    "min_cost_supplier",
    "promo_share_simple",
    "product_profit",
    "important_stock",
    "shipmode_priority",
    "supplier_part_count",
    "excess_inventory",
    # round-9 streaming-quantile sketch report (full oracle — fixed
    # double arithmetic over exact integer bin counts)
    "value_quantiles_stream",
    # round-9 keyed twin: per-event-type quantiles off the keyed
    # histogram (same frozen bounds across keys -> still mergeable)
    "type_value_quantiles",
    # round-9 A-ES weighted sampling (full oracle — identical
    # hash->uniform->ln priority tree both engines)
    "weighted_doc_sample",
    # round-9 deterministic train/val/test hash split audit
    "corpus_split",
    # round-9 interval analytics: concurrency sweep + overlap join
    "session_concurrency",
    "sessions_in_outage",
    # round-9 lexical retrieval (BM25) + dictionary-first fuzzy matching
    "bm25_search",
    "part_name_matches",
    # round-9 time-weighted average (LOCF segments clipped per day)
    "twap_daily",
    # round-9: exact-split attribution, n-gram LM counts, robust
    # median/MAD outliers, hopping windows
    "revenue_attribution",
    "bigram_lm",
    "mad_outliers",
    "hopping_event_stats",
    # round-9 cross-series stats: chi-squared contingency cells and
    # per-day Pearson correlation of two hourly series
    "type_hour_chi2",
    "daily_value_corr",
    # round-9 Markov transition matrix over per-user event sequences
    "event_transitions",
    # round-9 skew diagnostic + inverted-index build
    "key_skew_profile",
    "term_postings",
    # round-9 conversion-latency bands off the as-of join
    "conversion_lag",
    # round-10 real-codec multimodal round trip (stdlib PNG encode/decode)
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
    # round-10 entity-resolution clusters (fuzzy matches -> CC rollup)
    "name_entity_clusters",
    # round-10 TPC-H-style refresh through the physical CDC apply
    "cdc_refresh_totals",
    # round-10 winsorized robust mean (clip, don't drop)
    "winsorized_value_mean",
    # round-10 audience intersection + KWIC concordance
    "audience_overlap",
    "keyword_contexts",
    # round-10 revenue concentration (Gini off the value histogram)
    "revenue_gini",
    # round-10 market-basket brand affinity (co-purchase lift)
    "brand_affinity",
    # round-10 Kaplan-Meier user-survival curve (censored lifetimes)
    "user_survival",
    # round-10 metadata label-quality confusion audit
    "lang_confusion",
    # round-10 exact fixed-point EWMA forecast
    "revenue_ewma",
    # round-11 streaming market-basket twin (carry-based counter indexes)
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
    # the value histogram), Mann-Kendall trend significance, Cramér's V
    # effect size, lag-k autocorrelation
    "mwu_spend_by_status",
    "mann_kendall_trend",
    "cramers_v_type_hour",
    "revenue_acf",
    # round-12 operational/data-quality audits: SPC control-chart rules,
    # header-vs-lines invoice reconciliation
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
    # round-12 batch 4: detrended weekly factors, dup provenance matrix,
    # basket-width certificate
    "dow_seasonal_factors",
    "dup_cross_source",
    "basket_size_dist",
    "dow_seasonal_factors_live",
    # round-12 batch 5: full-oracle deterministic KMV distinct sketch,
    # Brown-Forsythe variance-homogeneity test, Holt level+trend smoothing
    "kmv_distinct_daily",
    "levene_bf_status",
    "holt_forecast",
    "kmv_distinct_stream",
    "jl_projection_audit",
    # round-12 batch 6: live smoothing monitors off the nation-daily mart
    "revenue_ewma_live",
    "holt_forecast_live",
    # round-12 batch 7: KMV sketch set algebra (union + intersection)
    "kmv_set_ops",
    # round-12 batch 8: live BM25 search served from a postings index
    "bm25_search_live",
    # round-12 batch 9: hybrid lexical+dense retrieval (RRF fusion)
    "hybrid_search_rrf",
    "mmr_rerank",
    "hybrid_search_rrf_live",
    # round-12 batch 10: storage-level co-located (bucketed) join
    "bucketed_customer_orders",
    "bucketed_order_lineitem",
    "calibrated_quality_scores",
    # round-13: rows-only → full-oracle upgrades (exact scaled-integer
    # minimax key for isotonic; unrolled fixed-iteration PageRank)
    "isotonic_revenue",
    "isotonic_revenue_live",
    "dup_pagerank",
    # round-13: dt-partitioned layout — static + dynamic partition pruning
    "events_day_prune",
    "events_dpp_join",
    # round-13: partition-grained idempotent ingest (replay inside the
    # builder, so the hash-match IS the exactly-once proof)
    "events_ingest_rollup",
    # round-13: persisted SQ8 probe now shares knn_sq8's oracle — the
    # driver row hash-checks the persisted-artifact path cross-process
    "knn_sq8_persisted",
    # round-13: label-propagation communities (3 unrolled rounds)
    "dup_communities",
    # round-13: live calibration curve off the streaming per-doc mart
    # (min-per-fingerprint label monoid)
    "calibrated_quality_scores_live",
    # round-14: the calibration->curation loop closed (threshold on the
    # calibrated P(keep) inside the single-scan curation)
    "corpus_curate_calibrated",
    # round-14: the compaction lifecycle end-to-end (fragmented ingest +
    # replay + staged compaction, rollup vs the raw-events oracle)
    "events_compacted_rollup",
    # round-14: the dup-graph family's banded-LSH scale twin (LPA over
    # the LSH candidate edges; deterministic planes -> full oracle)
    "dup_communities_lsh",
    # round-14: the exact set-similarity join's scale path (prefix
    # filtering — lossless, same oracle as ngram_jaccard_pairs)
    "jaccard_prefix_pairs",
    # round-14: Pareto-frontier document selection (suffix-max skyline)
    "doc_skyline",
    # round-14: exact-integer power-iteration spectral audit
    "embed_spectral_audit",
    # round-14: the live twin off the streaming Gram mart (additive
    # integer monoid -> shares the batch oracle verbatim)
    "embed_spectral_audit_live",
    # round-14: bucket pruning (the third pruning form) and partition
    # schema evolution under mergeSchema
    "bucketed_point_lookup",
    "events_schema_evolution",
    # round-14: dup_pagerank's banded-LSH scale twin
    "dup_pagerank_lsh",
    # round-14: the CENTERED spectral audit (true PCA top direction)
    "embed_pca_audit",
    # round-15: exact-integer Lloyd k-means — the clustering family's
    # first full-oracle member (closed-form seeds/rounding, 2 unrolled
    # iterations) — and the full-oracle IVF probe over its cells
    "embed_kmeans",
    "knn_ivf_det",
    # round-15: greedy k-center coreset selection (farthest-point
    # diversity primitive, m unrolled argmax steps, full cover oracle)
    "kcenter_select",
    # round-15: SemDeDup over the exact k-means cells — the rows-only
    # semantic_dedup's full-oracle twin (keep-first rule hash-checked)
    "semantic_dedup_det",
    # round-15: per-cell occupancy + centroid drift (the
    # re-train-the-quantizer monitor) and its streaming-mart live twin
    "cluster_drift",
    "cluster_drift_live",
    # round-15: the BPE TRAINING LOOP oracle-checked (3 unrolled merge
    # rounds; round t's count runs on round t-1's rewritten stream, so
    # the hash pins the greedy merge application itself)
    "bpe_train_merges",
)

SET_A: tuple[str, ...] = POOL[0:6]
SET_B: tuple[str, ...] = POOL[6:12]

_SLOTS_V1 = 6  # rounds 6-8
_SLOTS_V2 = 36  # rounds 9+: the 50-row gate minus len(CORE)
# Round 8's 6-slot window ended at POOL index 18; the 36-slot regime
# starts there so no name's pending first-row slot is skipped.
_V2_ANCHOR_ROUND = 9
_V2_ANCHOR_START = 18
# Round-15 re-anchor (same width, new fixed start). The V2 raw start for
# round 15 is 18 + 6*36 = 234, which exceeds len(POOL) — the first round
# where the start itself depends on ``mod len(POOL)``. Under the
# append-only discipline names are appended DURING a round, so a
# mod-dependent start would let this round's own additions shift which
# names the driver gates (append k ⇒ window slides back k slots,
# re-gating k just-checked names and dropping k pending ones). The V3
# anchor freezes round 15's start at index 15 — exactly where round 14's
# wrap window (POOL[198:219] + POOL[0:15]) ended — so in-round appends
# can never move an already-started window; the hazard recurs only when
# a future round's raw start wraps again, at which point that round
# anchors V4 the same way.
_V3_ANCHOR_ROUND = 15
_V3_ANCHOR_START = 15

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def current_round(repo_root: str | None = None) -> int:
    """Round N ⇔ N−1 CORRECTNESS_r*.json files exist at verify time
    (i.e. before the driver writes round N's own file — see module doc
    for the post-write caveat)."""
    root = repo_root or _REPO_ROOT
    return len(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))) + 1


def active_rotation(repo_root: str | None = None) -> tuple[str, ...]:
    """The POOL names that are GATED this round.

    Rounds ≤ 8 (historical, reproduced for the record): a 6-name cyclic
    window starting at ``((round − 6) * 6) mod len(POOL)``. Rounds 9–14:
    a 36-name cyclic window starting at
    ``(18 + (round − 9) * 36) mod len(POOL)`` (anchored where round 8's
    window ended, so round 9 → POOL[18:54]). Rounds ≥ 15: same width,
    re-anchored at index 15 where round 14's wrap window ended
    (``(15 + (round − 15) * 36) mod len(POOL)``), so round 15 →
    POOL[15:51] and round 16 → POOL[51:87] regardless of how many names
    those rounds append (see the V3 anchor note above)."""
    n = current_round(repo_root)
    if n <= 8:
        start = ((n - 6) * _SLOTS_V1) % len(POOL)
        width = _SLOTS_V1
    elif n < _V3_ANCHOR_ROUND:
        start = (
            _V2_ANCHOR_START + (n - _V2_ANCHOR_ROUND) * _SLOTS_V2
        ) % len(POOL)
        width = _SLOTS_V2
    else:
        start = (
            _V3_ANCHOR_START + (n - _V3_ANCHOR_ROUND) * _SLOTS_V2
        ) % len(POOL)
        width = _SLOTS_V2
    return tuple(POOL[(start + i) % len(POOL)] for i in range(width))
