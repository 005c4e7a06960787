"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line (kept under ~2 KB — round-8 verdict #1: the driver's
tail capture is ~2-3 KB, and a 100+-entry per-query dict outgrew it, so
BENCH_r08 recorded ``parsed: null``):
    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {<top-10 slowest only>}, "sf": 0.1, "full": <path>, ...}

The FULL per-query map (same schema the pre-r9 "queries" dict had) is
written to ``BENCH_FULL_r{N}.json`` in the repo root so cross-round
per-query history stays analyzable; the printed line's totals equal the
full file's.

Each query is built and then fully materialized via a count-style action
(no driver collect of the payload — the action drains the plan the way a
sink write would). Times include plan + execution, not session startup.
Every headline query runs twice back-to-back in the main loop AND once
more in an end-of-run second timing window; the recorded number is the
min of the three (r13 verdict #3: this host shows multi-minute noise
bursts and 10-20-codegen-stage queries ramp over ~4 runs of JIT warm-up
— a single back-to-back min-of-2 sampled knn_pq at 6.01 s when its warm
steady state reads 2.37 s). All runs are kept in the full record's
"runs" map so the cold-call cost stays visible.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
from sparkstreaming_gmall_scala_spark.session import get_spark

# The headline set: the flagship chain plus one representative per operator
# family (agg, multi-join, window, allocation, interval join, dedup families,
# text analysis, similarity). Kept stable across rounds so BENCH_r{N}.json
# files are comparable.
HEADLINE = (
    "trademark_stat",
    "pricing_summary",
    "order_enrich",
    "first_order_flag",
    "payment_allocation",
    "windowed_order_join",
    "topk_parts_per_brand",
    "dau",
    "dedup_exact",
    "minhash_lsh_pairs",
    "doc_quality",
    "knn_bruteforce",
    # added r1 (kept stable from here on): scale + similarity families
    "revenue_rollup",
    "skew_salted_agg",
    "skew_salted_join",
    "embed_near_dup_vec",
    "knn_lsh",
    # added r2: persisted-bucket ANN, temporal joins, sampling, text/graph
    "knn_lsh_persisted",
    # r15 (r14 verdict #6): the IVF multi-probe operating point — same
    # persisted index as knn_ivf_persisted, nprobe 6 of 8; its recall@5
    # lands in the record's recall map next to the speed row
    "knn_ivf_probe6",
    "asof_last_click",
    "orders_next_30d",
    "stratified_sample",
    "tfidf_top_terms",
    "dup_clusters",
    "knn_ivf_persisted",
    # added r3: the gated sessionization surface (sessionize is now an
    # ungated library twin) and the remaining gated temporal query
    "session_stats",
    "order_gaps",
    # added r5: the corpus-quality family (gated this round) and the
    # corpus-assembly manifests
    "doc_repetition",
    "decontaminate",
    "domain_mix",
    "boilerplate_ngrams",
    "chunk_tokens",
    "pack_sequences",
    # added r5: corpus cleaning + the composed curation recipe
    "gopher_quality",
    "token_entropy",
    "pii_mask",
    "line_dedup",
    "corpus_curate",
    "hourly_event_rollup",
    "model_score",
    "containment_pairs",
    # added r6: single-scan curation — corpus_curate_fast is directly
    # comparable to corpus_curate above (same result, 1 scan vs 5);
    # corpus_features is the materialization it amortizes
    "corpus_features",
    "corpus_curate_fast",
    # added r6: product-quantization ANN — knn_pq carries the full
    # train + encode + ADC + rerank cost per run (the comparison twin);
    # knn_pq_persisted is the production path, its number is the
    # probe-only steady state (codes cached at warm time)
    "knn_pq",
    "knn_pq_persisted",
    # added r6: the composed IVF-PQ architecture (cells bound candidates,
    # codes bound bytes; trains both quantizers per run by design)
    "knn_ivf_pq",
    # added r7: the persisted cell-partitioned IVF-PQ index — the probe's
    # cell filter is partition pruning on the parquet read, so this
    # number is the flagship ANN shape's steady-state query cost next to
    # knn_ivf_pq's build-included number
    "knn_ivf_pq_persisted",
    # added r6: CCNet-style bigram-LM quality signal (full oracle)
    "lm_perplexity",
    # added r6: substring-level dedup spans (window-hash suffix-array
    # analog, full oracle)
    "dup_spans",
    # added r7: the cut step applying dup_spans (keep-first substring
    # dedup producing cleaned text, full oracle)
    "cut_spans",
    # added r7: SemDeDup — semantic near-dup removal with the pair space
    # bounded by k-means cells (rows-only; pytest-pinned vs exact pairs)
    "semantic_dedup",
    # added r7: DSIR importance selection (broadcast bucket-model scoring,
    # full oracle) and the CCNet head/middle/tail perplexity split
    "dsir_select",
    "ccnet_buckets",
    # added r7: bloom-filter decontamination (fixed 128 KiB filter state,
    # zero-shuffle probe; FPs deterministic => full oracle)
    "bloom_decontaminate",
    # added r7: cluster keep-policy (best-quality canonical doc) and the
    # token-budgeted mixture (both full oracle)
    "dedup_keep_best",
    "token_mix",
    # added r7: the end-to-end corpus->training-shards pipeline (single-scan
    # curation feeding the packing manifest; one hash-checked oracle row)
    "corpus_to_shards",
    # added r7: deterministic epoch shuffle + media checksum dedup
    "shuffle_shards",
    "media_dedup",
    # added r7: hardest-negative mining (label-filtered exact rerank)
    "hard_negatives",
    # added r8: SQ8 scalar-quantized ANN — the only compressed-ANN path
    # with zero Python workers and a full DuckDB oracle
    "knn_sq8",
    # added r8: BPE merge-candidate table (tokenizer training's first
    # iteration; the merge loop is bpe_learn, pytest-pinned)
    "bpe_pairs",
    # added r8: character-class mix (script detection next to lang_id)
    "script_mix",
    # added r8: persisted SQ8 codes — steady-state probe next to
    # knn_sq8's derive-per-run number
    "knn_sq8_persisted",
    # added r9: IVF-SQ8 — cell-partition-pruned probe over residual SQ8
    # codes (the round-8 verdict's answer to the flat knn_sq8 scan)
    "knn_ivf_sq8",
    # added r8: winnowing fingerprints (MOSS) — the sparse guaranteed
    # substring-dup index next to dup_spans' keep-everything one
    "winnow_fingerprints",
    # added r8: tokenizer vocab table, ordered conversion funnel, and
    # cohort retention (the product-analytics surface the reference's
    # DAU/order apps imply)
    "vocab_top_tokens",
    "event_funnel",
    "user_retention",
    # added r8: TPC-H Q3/Q10 shapes — multi-join top-k revenue reports
    # (broadcast dims, pushed filters, limit-capped global sorts)
    "shipping_priority",
    "returned_item_report",
    # added r8: hourly OHLC bars (min_by/max_by first/last aggregation)
    "event_ohlc",
    # added r8: TPC-H Q5 shape (six-way join with a cross-table nation
    # predicate riding the join condition) and the count-min-sketch
    # heavy-hitters report (bounded sketch, broadcast probe)
    "local_supplier_volume",
    "heavy_hitters_cms",
    # added r8: SCD2 dimension history (gaps-and-islands in one key
    # partitioning) — the dim-with-history the reference's latest-row
    # Phoenix upserts can't answer
    "customer_status_history",
    # added r8: Morton layout key (codegen'd bit interleave, zero
    # shuffle) — the multi-dimensional file-pruning story
    "zorder_keys",
    # added r8: mergeable fixed-bin distribution sketch (bounds
    # broadcast into the scan; 32-row output at any input size)
    "value_histogram",
    # added r8: TPC-H Q18 shape (aggregate-then-join HAVING pattern)
    # and the explicit-value pivot reshape
    "large_volume_orders",
    "order_priority_pivot",
    # added r8: rolling 30-day reach answered from the per-day HLL
    # sketch index — one events scan for every window
    "rolling_mau_hll",
    # added r8: degree-oriented triangle support on the near-dup graph
    # (clique-vs-chain cohesion signal for keep policies)
    "dup_triangles",
    # added r8: fact-to-versioned-dim as-of join over the SCD2 history
    "orders_with_status_asof",
    # added r8: ANALYZE-style one-scan column profile and the sliding
    # ROWS-frame moving aggregates
    "table_profile",
    "user_value_ma",
    # added r8: the remaining TPC-H plan shapes (plans/tpch.py) — semi/
    # anti joins with non-equi residuals, conditional-sum ratios,
    # outer-join histogram, scalar-subquery rewrites, disjunctive
    # predicates, the Q21 double-correlation-as-one-agg
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
    # added r8: the pre-ingest data-quality gate — one-scan declarative
    # expectations and the star schema's referential-integrity audit
    "expectations_check",
    "fk_orphans",
    # added r8: time-RANGE window frame and relative-rank windows — the
    # last two window surfaces the catalog lacked
    "user_spend_range_7d",
    "order_value_percentiles",
    # added r8: dense-series regularization (sequence-exploded hourly
    # grid + LOCF carry-forward — the resample step feature stores run)
    "hourly_gap_fill",
    # added r8: ratio-to-report windows (ABC classification over the
    # dimension-sized aggregated frame)
    "revenue_pareto",
    # added r8: exactly-k-per-stratum sampling (WindowGroupLimit top-k)
    # and exact-decimal-moment 3-sigma outliers
    "events_sample_k",
    "value_outliers",
    # added r9: the last seven TPC-H shapes (plans/tpch.py) — correlated
    # scalar-min via window, pure filter-agg pushdown, multi-fact profit
    # join, HAVING-vs-scalar, delay-class conditional pivot, NOT IN +
    # count distinct, nested semi-joins over the derived ps relation
    "min_cost_supplier",
    "promo_share_simple",
    "product_profit",
    "important_stock",
    "shipmode_priority",
    "supplier_part_count",
    "excess_inventory",
    # added r9: p50/p95/p99 from the mergeable histogram sketch (one
    # cumulative walk for all quantiles; full oracle)
    "value_quantiles_stream",
    "type_value_quantiles",
    "weighted_doc_sample",
    "corpus_split",
    # added r9: interval analytics — the distributed-prefix-sum sweep
    # and the bucketed interval-overlap join
    "session_concurrency",
    "sessions_in_outage",
    # added r9: BM25 lexical retrieval + dictionary-first fuzzy matching
    "bm25_search",
    "part_name_matches",
    # added r9: time-weighted average (LOCF segments, decimal sums)
    "twap_daily",
    # added r9: exact-split attribution, bigram LM counts, MAD outliers,
    # hopping windows
    "revenue_attribution",
    "bigram_lm",
    "mad_outliers",
    "hopping_event_stats",
    # added r9: chi-squared contingency + daily two-series correlation
    "type_hour_chi2",
    "daily_value_corr",
    # added r9: Markov transition matrix
    "event_transitions",
    # added r9: join-key skew diagnostic + inverted-index build
    "key_skew_profile",
    "term_postings",
    # added r9: conversion-latency bands (as-of join reuse)
    "conversion_lag",
    # added r10: real-codec multimodal round trip
    "media_roundtrip",
    # added r10: cooccurrence, phrase retrieval, rolling distinct, paths,
    # experiment stats, regression, SCD2 snapshot diff
    "skipgram_cooc",
    "phrase_search",
    "rolling_dau_7d",
    "top_event_paths",
    "welch_t_nation",
    "revenue_trend",
    "dim_snapshot_diff",
    "nearest_click",
    "order_value_deciles",
    "spend_orders_spearman",
    "revenue_changepoint",
    "name_entity_clusters",
    "cdc_refresh_totals",
    "winsorized_value_mean",
    "audience_overlap",
    "keyword_contexts",
    "revenue_gini",
    "brand_affinity",
    "user_survival",
    "lang_confusion",
    "revenue_ewma",
    # added r11: streaming market-basket twin (3-batch ingest through the
    # carry-based counter indexes + live fold — build-inclusive by design)
    "brand_affinity_stream",
    # added r11: CRM/cohort analytics, robust trend, quality audits,
    # behavioral profiles, concentration, corpus-geometry diagnostics
    "rfm_segments",
    "cohort_ltv",
    "theil_sen_trend",
    "benford_check",
    "fd_check",
    "assoc_rules",
    "user_diversity",
    "user_burstiness",
    "seasonal_outliers",
    "hhi_concentration",
    "domain_unigram_cosine",
    "ngram_novelty",
    # added r11: exact two-sample KS, Kendall tau-b, runs test, DOW ANOVA
    "ks_spend_by_status",
    "kendall_tau_daily",
    "revenue_runs_test",
    "dow_anova",
    # added r11: corpus/embedding quality screens
    "embedding_norm_audit",
    "length_tail_docs",
    "lang_id_margin",
    # added r11: growth reporting + Lorenz curve
    "revenue_mom",
    "spend_lorenz",
    # added r12: live directional rules read off the persisted basket
    # counter indexes (shares brand_affinity_stream's one-time ingest)
    "assoc_rules_live",
    # added r12: statistical tests (exact MWU, Mann-Kendall, Cramér's V,
    # lag-k ACF), operational audits (SPC rules, invoice reconciliation),
    # LLM mixing weights + tokenizer fertility
    "mwu_spend_by_status",
    "mann_kendall_trend",
    "cramers_v_type_hour",
    "revenue_acf",
    "spc_violations",
    "order_price_reconcile",
    "domain_mixture_weights",
    "token_fertility",
    # added r12 batch 2: dedup savings report, exact quartile profiles,
    # brand share drift, live SPC monitor (read-side fold; ingest under
    # build_sec like the basket counters)
    "dedup_savings",
    "ship_lag_quantiles",
    "dow_revenue_quartiles",
    "share_drift",
    "spc_violations_live",
    # added r12 batch 3
    "lag_lead_xcorr",
    "interorder_gap_quantiles",
    "vocab_coverage_curve",
    # added r12 batch 4
    "dow_seasonal_factors",
    "dup_cross_source",
    "basket_size_dist",
    "dow_seasonal_factors_live",
    # added r12 batch 5: deterministic KMV sketch, Brown-Forsythe,
    # Holt level+trend smoothing
    "kmv_distinct_daily",
    "levene_bf_status",
    "holt_forecast",
    # live KMV read (ingest under build_sec, the live-mart convention)
    "kmv_distinct_stream",
    # JL random-sign projection audit (hash-derived sign matrix, no UDF)
    "jl_projection_audit",
    # live smoothing monitors off the shared nation-daily mart (ingest
    # under build_sec via revenue_ewma_live; holt shares the index)
    "revenue_ewma_live",
    "holt_forecast_live",
    # KMV sketch set algebra (union + intersection from bounded sketches)
    "kmv_set_ops",
    # live BM25 search read off the postings index (ingest under build_sec)
    "bm25_search_live",
    # hybrid lexical+dense retrieval (RRF fusion of BM25 + cosine top-k)
    "hybrid_search_rrf",
    # MMR diversified re-ranking of the dense top-20
    "mmr_rerank",
    # live hybrid: RRF over the live BM25 index + the dense scan
    "hybrid_search_rrf_live",
    # storage-level co-located join (one-time bucket write under build_sec)
    "bucketed_customer_orders",
    # co-bucketed order header x detail — the reference's J1 join shape
    "bucketed_order_lineitem",
    # isotonic calibration applied: quality score -> calibrated P(keep)
    "calibrated_quality_scores",
    # r14: the calibration->curation loop closed — single-scan curation
    # with a floor on the CALIBRATED keep probability
    "corpus_curate_calibrated",
    # r14: prefix-filtered EXACT set-similarity join — lossless scale
    # path next to ngram_jaccard_pairs' co-occurrence candidates and
    # minhash_lsh_pairs' approximate ones
    "jaccard_prefix_pairs",
    # r14: Pareto-frontier selection (domain-bounded suffix-max skyline)
    "doc_skyline",
    # r14: exact-integer spectral audit (3 power steps over one cached
    # quantized frame; 64 decimal sums per step, single-row aggregates)
    "embed_spectral_audit",
    # r14: the live twin off the streaming Gram mart (3-batch ingest
    # under build_sec; headline = fold 4096 cells + the driver walk)
    "embed_spectral_audit_live",
    # r14: bucket pruning point lookup (1 of 8 bucket files read) and
    # the mergeSchema rollup over the schema-evolved table (the
    # one-time table writes land under build_sec)
    "bucketed_point_lookup",
    "events_schema_evolution",
    # r14: the centered spectral audit (one moments pass + driver walk)
    "embed_pca_audit",
    # r13: the live calibration curve off the streaming per-doc mart
    # (3-batch ingest under build_sec; headline = the read-side fold)
    "calibrated_quality_scores_live",
    # isotonic PAVA smoother (full oracle since r13; calendar-bounded fold)
    "isotonic_revenue",
    # live isotonic off the shared SPC daily mart (ingest already warmed)
    "isotonic_revenue_live",
    # r13: dt-partitioned layout — static prune (one-day hourly profile)
    # and dynamic partition pruning (runtime top-5-days dim join); the
    # one-time partitioned write lands under build_sec
    "events_day_prune",
    "events_dpp_join",
    # r13: partition-grained idempotent ingest (3 batches + a replayed
    # batch under build_sec); headline = the read-side rollup
    "events_ingest_rollup",
    # r14: the compaction lifecycle (fragmented ingest + replay +
    # staged compaction under build_sec); headline = the read-side
    # one-day rollup off the compacted table
    "events_compacted_rollup",
    # dup_communities (r13, LPA over the near-dup graph) is
    # catalog+oracle only, same boundary as dup_pagerank: its cost is
    # ~90% the exact cosine PAIR GENERATION shared with the other
    # unbenched graph entries (measured 83.5s of a 90s run at sf0.1 —
    # the 3 LPA rounds themselves are ~7s), so a headline row would
    # re-measure that shared upstream, not the operator
    # r15 (r14 verdict #4): the banded-LSH scale twins DO headline —
    # their shared pair derivation persists per-corpus under build_sec
    # (lsh_pairs_persisted), so these rows time the LPA rounds / the
    # 6-step power iteration over the materialized pair table, the form
    # the family runs at corpus scale; fidelity vs the exact graph is
    # in the record's "agreement" map
    "dup_communities_lsh",
    "dup_pagerank_lsh",
    # r15: exact-integer Lloyd k-means (2 unrolled argmin passes over
    # the cached quantized frame, k×64 centroid collects between) and
    # the full-oracle IVF probe over its cells (build reruns the same
    # recurrence, probe scans 2 of 4 cells)
    "embed_kmeans",
    "knn_ivf_det",
    # r15: greedy k-center selection (m=5 sequential argmax passes over
    # the cached quantized frame + the cover pass)
    "kcenter_select",
    # r15: SemDeDup's full-oracle twin (exact cells + cell-bounded
    # 6-dp cosine pair join; directly comparable to semantic_dedup's
    # float-cell number above)
    "semantic_dedup_det",
    # r15: centroid-drift monitor (batch = train + one means pass) and
    # the live twin off the per-cell mart (3-batch ingest under
    # build_sec; headline = the k x dim fold + report)
    "cluster_drift",
    "cluster_drift_live",
    # r15: the BPE training loop (3 merge rounds: per round one pair
    # aggregate + one greedy rewrite pass, re-persisted stream)
    "bpe_train_merges",
    # dup_cores (r11, iterative k-core peeling) is catalog+pytest only —
    # the dup_pagerank precedent: iterative graph entries pay tens of
    # seconds of per-round driver latency at sf0.1 and their real plan
    # is guarded per-iteration in tests, so benching the loop would
    # measure round-trip overhead, not the engine
)


def bench_streaming_dedup(spark, sf_dir: str) -> int:
    """Incremental streaming-dedup probe: feed the documents table through
    the persisted-band-index pipeline in two micro-batches (foreachBatch
    body driven directly) and return the candidate-pair count. Times the
    O(batch) shingle→minhash→band + index-probe path, including the
    append-only index writes."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from sparkstreaming_gmall_scala_spark.sinks.batch import (
        IdempotentBatchWriter,
    )
    from sparkstreaming_gmall_scala_spark.sources import load_table
    from sparkstreaming_gmall_scala_spark.streaming.dedup import (
        dedup_candidates_batch,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="bench_sdedup_")
    try:
        # schema= is the r16 production sink shape (streaming/dedup.py's
        # _banded_pipeline passes the same contract schema): the pair
        # rows' shape is fixed, so reads skip footer inference. This
        # changes the measured WORK (an optimization inside the timed
        # path), not the timing methodology.
        sink = IdempotentBatchWriter(
            os.path.join(work, "out"), schema="id_a long, id_b long"
        )
        run = dedup_candidates_batch(spark, os.path.join(work, "idx"), sink)
        half = docs.filter(F.col("doc_id") % 2 == 0)
        rest = docs.filter(F.col("doc_id") % 2 == 1)
        run(half, 0)
        run(rest, 1)
        return sink.read(spark).count()
    finally:
        shutil.rmtree(work, ignore_errors=True)


# The round-6 host's calibration probe (BENCH_r06.json) — the pinned
# reference point for cross-round normalization: normalized_total
# = total × (REF_CALIBRATION_MIN / this run's min), so a round on a
# 2×-slower VM reports the same normalized number for identical code and
# cross-round comparison is mechanical instead of eyeballed. Min-to-min
# (round-7 advice): r7 normalized median-to-MIN, which biased the metric
# by the host's median/min ratio (~8% even on the quiet r6 host); both
# reference constants are kept so either normalization can be recomputed
# from any round's JSON (each records its full calibration runs).
REF_CALIBRATION_MEDIAN = 0.278
REF_CALIBRATION_MIN = 0.256

# r13 (r12 verdict #3): the synthetic probe's min itself swung 1.38×
# between the r11 and r12 hosts (0.589 → 0.427 s) while the five most
# stable REAL queries moved ±1.2% in aggregate — a CPU-only md5 kernel
# doesn't track the scan/shuffle/join mix the actual workload pays, so
# probe normalization manufactured a phantom 84.9 → 125.4 s "regression"
# on a round whose raw per-query time IMPROVED. New convention:
# normalize by a pinned pool of five headline queries whose code has
# been frozen since ≤r9 and whose min-of-2 times were the flattest
# across r10-r12 (pool sums 10.68 / 10.93 / 10.74 s — ±1.2% across
# three different hosts, vs the probe's ±38%). The pool spans the real
# cost centers: an aggregate-then-join TPC-H shape (important_stock), a
# window-hash substring scan (dup_spans), a multi-join top-k report
# (returned_item_report), the single-scan curation pipeline
# (corpus_curate_fast), and a banded-LSH dedup join (containment_pairs).
# REF_POOL_SEC pins the r12 record's pool sum, so normalized_total_pool
# is directly comparable to r12's RAW total (same host-speed unit).
# These five implementations are calibration-frozen: changing one
# invalidates cross-round comparability, so optimize a twin instead.
# The probe-based normalized_total is still recorded (one round of
# both-convention continuity, and any round can be recomputed either
# way from its full record).
PINNED_POOL = (
    "important_stock",
    "dup_spans",
    "returned_item_report",
    "corpus_curate_fast",
    "containment_pairs",
)
REF_POOL_SEC = 10.74  # sum of the five in BENCH_FULL_r12.json


def calibrate(spark, k: int = 5) -> dict:
    """Host-speed calibration probe (round-5 verdict #5): BENCH totals
    moved ~1.5× between rounds on identical code because each round runs
    on a different-speed VM. This times a fixed, data-independent,
    CPU-bound query (md5+crc32 over a 20M range, 32 partitions — the
    same codegen'd hash kernels the real queries lean on) k times after
    one warm run; cross-round comparison divides per-query times by
    ``median_sec`` to normalize mechanically instead of eyeballing a
    stable cheap query."""
    probe = lambda: spark.range(0, 20_000_000, 1, 32).selectExpr(  # noqa: E731
        "sum(crc32(md5(CAST(id AS STRING)))) AS s"
    ).collect()
    probe()  # warm codegen/classloading
    runs = []
    for _ in range(k):
        t0 = time.perf_counter()
        probe()
        runs.append(round(time.perf_counter() - t0, 4))
    med = sorted(runs)[len(runs) // 2]
    return {
        "probe": "range20m_md5_crc32_local32",
        "runs": runs,
        "median_sec": med,
        # min is the noise-robust host-speed floor (a GC pause or a
        # contention spike right after 50 heavy queries can inflate
        # individual probe runs 5-10× — observed in round 7); median
        # stays the normalization key for r6-compatibility
        "min_sec": min(runs),
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("bench")
    # r9 verdict #3: the streaming-dedup probe's fresh-directory glob logs
    # a benign FileStreamSink WARN with a full stack trace (twice), which
    # ate the front half of the driver's ~2-3 KB tail capture. ERROR level
    # keeps stderr to this script's own `#` lines.
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    # Warm the JVM/codegen paths once so per-query numbers measure the
    # steady state, not first-call classloading. The persisted-index ANN
    # entries also build their /tmp index here: their benchmark number is
    # the PROBE cost — ingest is a one-time cost by design, and the
    # in-memory variants (knn_lsh, knn_ivf) carry the rebuild-per-run
    # number for comparison.
    registry["trademark_stat"].builder(spark, sf_dir).count()
    # Explicit build-vs-probe split (round-7 verdict #4): the first call
    # of each persisted-index entry pays index construction + first probe
    # (cold codegen included) — recorded under build_sec in the JSON, NOT
    # in the headline total (r≤7 totals never included it, so totals stay
    # comparable). The HEADLINE rows below then measure the steady-state
    # probe only, so a probe regression is answerable from the JSON alone.
    # The persisted-index builders cache under /tmp keyed by params +
    # data fingerprint and SURVIVE across bench invocations — without
    # clearing them, every run after the first would record a cache-hit
    # probe under the "build" label and cross-round build comparisons
    # would silently compare cold builds against warm hits. Builds are
    # outside the headline total, so paying the true cold cost here
    # keeps the published numbers honest at ~20 s once per run.
    import glob as _glob
    import shutil as _shutil
    import tempfile as _tempfile

    for prefix in (
        "lshbuckets", "ivfcells", "sq8", "pqcodes", "ivfpq", "ivfsq8",
        "basketidx", "spcidx",
        # r13: the layout families join the same honesty rule — without
        # clearing, every run after the first would record a cache-hit
        # re-register under the "build" label
        "bktidx", "bktolidx", "dtpart", "dtingest", "dtcompact", "calibidx",
        "gramidx",
        # r15: the persisted banded-LSH near-dup pair index shared by the
        # dup-graph scale twins — same honesty rule
        "lshpairs",
        # r15 (ADVICE): events_schema_evolution caches under dtevol — it is
        # in the warm-build list, so a leftover dir would record a cache-hit
        # marker check as its "build" cost on any host after the first run
        "dtevol",
    ):
        for d in _glob.glob(
            os.path.join(
                _tempfile.gettempdir(),
                f"spark_graft_{prefix}_{os.path.basename(sf_dir.rstrip('/'))}_*",
            )
        ):
            _shutil.rmtree(d, ignore_errors=True)

    build_sec: dict[str, float] = {}
    for warm in (
        "knn_lsh_persisted",
        "knn_ivf_persisted",
        "knn_pq_persisted",
        "knn_ivf_pq_persisted",
        "knn_sq8_persisted",
        "knn_ivf_sq8",
        # r12 (r11 verdict #3): the streaming basket counter ingest moved
        # to the same build-vs-probe convention — first call pays the
        # 3-batch carry ingest here, the HEADLINE row is the live fold
        "brand_affinity_stream",
        # r12: the live SPC daily index, same convention
        "spc_violations_live",
        # r12 batch 5: the live KMV k-min index, same convention
        "kmv_distinct_stream",
        # r12 batch 6: the nation-daily mart (holt_forecast_live shares it)
        "revenue_ewma_live",
        # r12 batch 8: the BM25 postings index, same convention
        "bm25_search_live",
        # r12 batch 10: the one-time bucketed-table write
        "bucketed_customer_orders",
        # r13: the one-time order-key co-bucketed write (orders+lineitem)
        "bucketed_order_lineitem",
        # r13: the one-time dt-partitioned events write (pruning family)
        "events_day_prune",
        # r13: the 3-batch + replay idempotent partition ingest
        "events_ingest_rollup",
        # r13: the 3-batch calibration-mart ingest
        "calibrated_quality_scores_live",
        # r14: the fragmented ingest + compaction lifecycle
        "events_compacted_rollup",
        # r14: the 3-batch Gram-mart ingest
        "embed_spectral_audit_live",
        # r14: the schema-evolved two-batch ingest; the point lookup's
        # bucketed tables are warmed by bucketed_customer_orders above
        "events_schema_evolution",
        "bucketed_point_lookup",
        # r15 (r14 verdict #4): the banded-LSH pair derivation — the
        # shared upstream of the dup-graph scale twins — persists once
        # per corpus; dup_pagerank_lsh reads the same index, so one
        # build here warms both headline rows
        "dup_communities_lsh",
    ):
        t0 = time.perf_counter()
        registry[warm].builder(spark, sf_dir).count()
        build_sec[warm.replace("_persisted", "") + "_build"] = round(
            time.perf_counter() - t0, 3
        )
    print(f"# build (cold index + first probe): {build_sec}", file=sys.stderr)

    # Calibrate BEFORE the query loop: measured after 50+ heavy queries
    # the probe picks up GC/memory-pressure noise (observed: median 5.2 s
    # vs min 0.57 s on the same host — 10× inflation), which would make
    # the normalized total meaningless on exactly the runs that need it.
    calibration = calibrate(spark)
    print(f"# calibration: {calibration}", file=sys.stderr)

    # r11 (r10 verdict #3): every headline query runs TWICE in the main
    # loop. The driver's single-pass session hit a handful of queries
    # cold each round (first-run codegen / GC spikes of 2-4×) and every
    # round's triage re-litigated the same noise — the steady-state
    # number is the one that predicts 100 TB behavior, and the cold
    # first call is visible in the full record's "runs" lists. The
    # recorded headline number also folds in the END-of-run second
    # timing window below (r13 verdict #3).
    times: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        q = registry[name]
        runs = []
        n = 0
        for _ in range(2):
            t0 = time.perf_counter()
            df = q.builder(spark, sf_dir)
            n = df.count()
            runs.append(round(time.perf_counter() - t0, 3))
            # r9 advice: a few queries persist() frames their RETURNED
            # lazy plan still needs (e.g. important_stock's two-consumer
            # aggregate) and so cannot unpersist before returning;
            # clearing between runs keeps those caches from accumulating
            # across the session and keeps run 2 a true re-execution, not
            # a cache read.
            spark.catalog.clearCache()
        all_runs[name] = runs
        times[name] = min(runs)
        print(
            f"# {name}: {n} rows in {times[name]:.2f}s (runs: {runs})",
            file=sys.stderr,
        )

    # added r5: the incremental streaming-dedup probe (not a catalog
    # query — it drives the foreachBatch body over two micro-batches).
    # Warm with the FULL input once: the cold run pays ~10s of codegen
    # for these plan shapes, and a limited warm compiles different
    # (LocalLimit) plans that don't prime the full-size ones. The timed
    # run below is the steady-state per-ingest cost.
    bench_streaming_dedup(spark, sf_dir)
    # r12 (r11 verdict #7): min-of-2 like every headline query — the
    # single-pass figure swung 1911 -> 1593 -> 1681 across rounds on
    # host noise alone; both runs are in the full record's "runs" pair.
    stream_runs = []
    n = 0
    for _ in range(2):
        t0 = time.perf_counter()
        n = bench_streaming_dedup(spark, sf_dir)
        stream_runs.append(round(time.perf_counter() - t0, 3))
    all_runs["streaming_dedup_2batches"] = stream_runs
    times["streaming_dedup_2batches"] = min(stream_runs)
    print(
        f"# streaming_dedup_2batches: {n} rows in "
        f"{times['streaming_dedup_2batches']:.2f}s (runs: {stream_runs})",
        file=sys.stderr,
    )

    # r14 (r13 verdict #3): the END-of-run second timing window now
    # covers EVERY headline row, not just the pinned pool. Measured on
    # the r13 host: multi-minute noise bursts can swallow a min-of-2
    # pair entirely (knn_pq recorded 6.01 s against a 2.37 s isolated
    # warm re-time), and 10-20-codegen-stage families only reach JIT
    # steady state around run 3-4. Two windows tens of minutes apart are
    # never both inside one burst, and the end-window sample is run #3
    # — past the warm-up ramp for the heavy-codegen families. Headline
    # number = min across both windows (three samples, all recorded).
    main_window = dict(times)
    end_window: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        registry[name].builder(spark, sf_dir).count()
        end_window[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        all_runs[name] = all_runs[name] + [end_window[name]]
        times[name] = min(times[name], end_window[name])
    # the streaming probe joins the same convention (r13 verdict #7):
    # one more ingest pass in the end window, envelope = min of three
    t0 = time.perf_counter()
    bench_streaming_dedup(spark, sf_dir)
    end_window["streaming_dedup_2batches"] = round(
        time.perf_counter() - t0, 3
    )
    all_runs["streaming_dedup_2batches"].append(
        end_window["streaming_dedup_2batches"]
    )
    times["streaming_dedup_2batches"] = min(
        all_runs["streaming_dedup_2batches"]
    )
    print(f"# end window: {end_window}", file=sys.stderr)

    # BASELINE.md's streaming metric: rows/sec SUSTAINED through the
    # foreachBatch ingest path (input docs over the fastest two-batch
    # wall time across both windows — the unit the reference's 5 s
    # micro-batch envelope is judged in).
    from sparkstreaming_gmall_scala_spark.sources import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    streaming_rows_per_sec = round(
        n_docs / times["streaming_dedup_2batches"], 1
    )

    total = round(sum(times.values()), 3)
    # Normalize min-to-min (round-7 advice: median/min mixing biased the
    # metric by the host's median/min ratio). Min is the noise-robust
    # host-speed floor — a GC pause right after 50 heavy queries inflates
    # individual probe runs 5-10× (observed r7), median with them.
    normalized_total = round(
        total * REF_CALIBRATION_MIN / calibration["min_sec"], 3
    )
    # r13+ headline normalization (r12 verdict #3): pinned-pool — see the
    # PINNED_POOL comment. The unit is "seconds on the r12 host", so this
    # number compares directly against r12's RAW total (209.108 s) and
    # against every later round's normalized_total_pool. The pool's
    # per-query times are the same cross-window mins as every headline
    # row (the pool rode the r13-only second pass; r14 extends that
    # window to everything, so the denominator convention is unchanged).
    pool_end = {q: end_window[q] for q in PINNED_POOL}
    pool_min = {q: times[q] for q in PINNED_POOL}
    pool_sec = round(sum(pool_min.values()), 3)
    normalized_total_pool = round(total * REF_POOL_SEC / pool_sec, 3)

    # r15 (r14 verdict #2): host-shape-robust cross-round comparator.
    # The pinned pool (shuffle/shingle-heavy) and the CPU probe (pure
    # codegen) diverged 25% in OPPOSITE directions across the r13/r14
    # hosts while the median common query moved -11% — either single
    # calibration alone misreads such a round. normalized_median_ratio
    # needs no calibration at all: the median over the common query set
    # of (this round's per-query min / prior round's per-query min).
    # Host-speed differences shift every ratio by the same factor, but
    # the MEDIAN is robust to the handful of queries whose plans
    # genuinely changed, so a 25% pool-vs-probe disagreement leaves it
    # untouched. <1.0 = this round's median query is faster than last
    # round's on this host pair.
    # Round number first (also used for the full-record filename below):
    # the driver writes BENCH_r{N}.json and CORRECTNESS_r{N}.json in some
    # order relative to running this script, so take the max of both
    # counters — correct whether this run happens before or after the
    # current round's correctness file lands. r16 (r15 verdict #8): MAX
    # NUMERIC INDEX, not file count — the r15 driver's extra 8-core
    # record (BENCH_r15_c8.json) matched the count glob and would have
    # shifted this run's round to 17 and its comparator onto the 8-core
    # record.
    import re as _re

    repo_root = os.path.dirname(os.path.abspath(__file__))

    def _max_idx(pattern: str) -> int:
        best = 0
        for p in _glob.glob(os.path.join(repo_root, pattern)):
            m = _re.fullmatch(
                r".*_r(\d+)\.json", os.path.basename(p)
            )
            if m:
                best = max(best, int(m.group(1)))
        return best

    n_round = max(_max_idx("BENCH_r*.json") + 1, _max_idx("CORRECTNESS_r*.json"))

    def _median_ratio(path: str, label: str) -> dict | None:
        """Median per-query min ratio of THIS run vs the record at
        ``path`` (calibration-free comparator, r15). <1.0 = this run's
        median common query is faster."""
        if not os.path.exists(path):
            return None
        try:
            with open(path) as fh:
                prev_q = json.load(fh).get("queries", {})
            ratios = sorted(
                times[q] / prev_q[q]
                for q in set(times) & set(prev_q)
                if prev_q[q] > 0
            )
            if not ratios:
                return None
            mid = len(ratios) // 2
            med = (
                ratios[mid]
                if len(ratios) % 2
                else (ratios[mid - 1] + ratios[mid]) / 2
            )
            return {
                "ratio": round(med, 4),
                "vs_record": label,
                "n_common": len(ratios),
            }
        except (OSError, ValueError, KeyError) as exc:
            print(
                f"# median-ratio comparator ({label}) skipped: {exc}",
                file=sys.stderr,
            )
            return None

    # compare against EXACTLY the previous round's record — never
    # prev_full[-1], which after a same-round test run would be this
    # round's own earlier output (a self-comparison reading ~1.0)
    prev_name = f"BENCH_FULL_r{n_round - 1:02d}.json"
    normalized_median_ratio = _median_ratio(
        os.path.join(repo_root, prev_name), prev_name
    )
    # r16 (r15 verdict #10): a SECOND ratio vs the committed round-open
    # baseline record (same host pair as this run when the driver runs
    # on the build VM), so the judge gets one number that survives host
    # weather in BOTH directions — vs the prior round AND vs the tree
    # this round's optimization actually started from.
    _open_rel = os.path.join("plans", "r16", "BENCH_FULL_r16_baseline.json")
    normalized_median_ratio_open = _median_ratio(
        os.path.join(repo_root, _open_rel), _open_rel
    )
    print(
        f"# pool windows: main={ {q: main_window[q] for q in PINNED_POOL} } "
        f"end={pool_end}",
        file=sys.stderr,
    )

    # r13 (r12 verdict #7): carry recall next to speed. recall@5 of every
    # ANN headline row against the exact knn_bruteforce frame at the same
    # SF — each frame is ≤(10 queries × 5 rows), so this is bounded driver
    # work by construction. A reader of BENCH_r{N} sees the speed/accuracy
    # frontier (e.g. a future quantizer change that buys 2× speed by
    # dropping recall) without leaving the record.
    exact_nbrs: dict = {}
    for row in registry["knn_bruteforce"].builder(spark, sf_dir).collect():
        exact_nbrs.setdefault(row["query_id"], set()).add(row["neighbor_id"])
    recall_at_5: dict[str, float] = {}
    for name in sorted(t for t in times if t.startswith("knn_")):
        if name == "knn_bruteforce":
            continue
        got: dict = {}
        for row in registry[name].builder(spark, sf_dir).collect():
            got.setdefault(row["query_id"], set()).add(row["neighbor_id"])
        per_q = [
            len(got.get(q, set()) & nbrs) / len(nbrs)
            for q, nbrs in exact_nbrs.items()
        ]
        recall_at_5[name] = round(sum(per_q) / len(per_q), 3)
    print(f"# recall@5 vs bruteforce: {recall_at_5}", file=sys.stderr)

    # r15 (r14 verdict #4): the dup-graph scale twins carry measured
    # fidelity next to their speed rows, the way ANN rows carry
    # recall@5 — edge recall of the persisted LSH pair set vs the exact
    # O(n²) pair set, community co-membership agreement over the exact
    # graph's same-community pairs, and PageRank hub-order Spearman, all
    # at THIS bench SF (the pytest pins cover only the clustered
    # fixture). The exact-pair derivation is the one deliberately
    # unbenched 80s+ upstream; it runs once here, outside every timing
    # window and total.
    import numpy as _np

    from sparkstreaming_gmall_scala_spark.operators.graph import (
        label_propagation,
    )
    from sparkstreaming_gmall_scala_spark.operators.pagerank import pagerank
    from sparkstreaming_gmall_scala_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )
    from sparkstreaming_gmall_scala_spark.plans.llm import lsh_pairs_persisted

    emb = load_table(spark, sf_dir, "embeddings")
    exact_pairs = (
        cosine_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.4, dim=64)
        .select("id_a", "id_b")
        .persist()
    )
    lsh_pairs = lsh_pairs_persisted(spark, sf_dir).persist()
    ep = {(r["id_a"], r["id_b"]) for r in exact_pairs.collect()}
    lp = {(r["id_a"], r["id_b"]) for r in lsh_pairs.collect()}
    ec = {
        r["node"]: r["community"]
        for r in label_propagation(exact_pairs, rounds=3).collect()
    }
    lc = {
        r["node"]: r["community"]
        for r in label_propagation(lsh_pairs, rounds=3).collect()
    }
    same_exact = [(a, b) for a, b in ep if ec.get(a) == ec.get(b)]
    co_member = sum(
        1 for a, b in same_exact if a in lc and b in lc and lc[a] == lc[b]
    ) / max(len(same_exact), 1)

    def _pr_ranks(pairs_df):
        edges = pairs_df.selectExpr("id_a AS src", "id_b AS dst").unionByName(
            pairs_df.selectExpr("id_b AS src", "id_a AS dst")
        )
        return {
            r["node"]: r["rank_nano"]
            for r in pagerank(edges, iters=6).collect()
        }

    pr_exact, pr_lsh = _pr_ranks(exact_pairs), _pr_ranks(lsh_pairs)
    pr_common = sorted(set(pr_exact) & set(pr_lsh))
    ra = _np.array([pr_exact[n] for n in pr_common], dtype=float)
    rb = _np.array([pr_lsh[n] for n in pr_common], dtype=float)
    hub_spearman = float(
        _np.corrcoef(ra.argsort().argsort(), rb.argsort().argsort())[0, 1]
    )
    exact_pairs.unpersist()
    lsh_pairs.unpersist()
    agreement = {
        "dup_edge_recall": round(len(lp & ep) / max(len(ep), 1), 3),
        "dup_co_membership": round(co_member, 3),
        "dup_hub_spearman": round(hub_spearman, 3),
        "dup_node_coverage": round(len(pr_common) / max(len(pr_exact), 1), 3),
        "n_exact_pairs": len(ep),
        "n_lsh_pairs": len(lp),
    }
    print(f"# dup-graph LSH agreement: {agreement}", file=sys.stderr)

    # r16 (r15 verdict #8): a non-primary core-count run (the driver's
    # scaling pass) writes its full record to a _c{N}-suffixed file so it
    # can never overwrite the round's primary 32-core record — the r15
    # session's 8-core run landed in BENCH_FULL_r16.json only because the
    # count-based round inference drifted.
    _cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    full_name = (
        f"BENCH_FULL_r{n_round:02d}.json"
        if _cpus == "32"
        else f"BENCH_FULL_r{n_round:02d}_c{_cpus}.json"
    )
    full_record = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "calibration": calibration,
        "build_sec": build_sec,
        "normalized_total": normalized_total,
        "normalized_total_pool": normalized_total_pool,
        "normalized_median_ratio": normalized_median_ratio,
        "normalized_median_ratio_open": normalized_median_ratio_open,
        "pool_calibration": {
            "names": list(PINNED_POOL),
            "pool_sec": pool_sec,
            "ref_pool_sec": REF_POOL_SEC,
            "ref_round": 12,
            # both timing windows (min-of-2 in the main loop; the end
            # pass is single-shot on a warm session) — the denominator
            # is the per-query min across them
            "main_window": {q: main_window[q] for q in PINNED_POOL},
            "end_window": pool_end,
        },
        "recall_at_5": recall_at_5,
        # r15: measured fidelity of the dup-graph LSH scale twins vs
        # their exact siblings at this SF (edge recall / co-membership /
        # hub Spearman) — the graph family's recall@5 analog
        "agreement": agreement,
        "ref_calibration_min": REF_CALIBRATION_MIN,
        "ref_calibration_median": REF_CALIBRATION_MEDIAN,
        "streaming_rows_per_sec": streaming_rows_per_sec,
        # every timed run per query — [main run 1, main run 2, end-window
        # run]; headline number = min. The cold/warm gap AND the burst/
        # JIT-ramp exposure are answerable from the record itself
        # (r10 verdict #2/#3; r13 verdict #3)
        "runs": all_runs,
        "end_window": end_window,
        # cross-round triage notes (round-8 verdict #5): deltas with a
        # known, accepted, HOST-INDEPENDENT cause, so tooling doesn't
        # re-flag them. Session-noise notes are gone: min-of-2 timing
        # (r11) removes first-run codegen/GC spikes from the headline
        # numbers entirely.
        "notes": {
            "pool_freeze_r16": "the r15 verdict's task list explicitly "
            "ordered optimization of containment_pairs and the "
            "corpus_curate_fast regression — both PINNED_POOL members. "
            "Their implementations changed in r16, so "
            "normalized_total_pool is NOT comparable across the "
            "r15/r16 boundary; normalized_median_ratio (and _open) are "
            "the valid cross-round statistics for this round",
            "timing": "r14+ (r13 verdict #3): each headline query runs "
            "twice in the main loop AND once in an end-of-run second "
            "window; headline = min of the three. Protects every row "
            "from the multi-minute host noise bursts and the 10-20-"
            "codegen-stage JIT warm-up ramp that min-of-2 sampled "
            "(r13's knn_pq recorded 6.01s vs a 2.37s isolated warm "
            "re-time). r11-r13 records are back-to-back min-of-2; "
            "r<=10 are single-pass and can read 2-4x higher on "
            "whichever queries that session hit cold — compare against "
            "the min of the 'runs' list",
            "normalization": "r13+ (r12 verdict #3): cross-round "
            "comparisons use normalized_total_pool — total scaled by a "
            "pinned 5-query pool (code-frozen since <=r9; pool sums "
            "moved +-1.2% across the r10-r12 hosts while the synthetic "
            "probe's min swung 38%, whipsawing the old normalized_total "
            "84.9 -> 125.4 on a round whose raw per-query time "
            "improved). Unit = seconds-on-the-r12-host, so r13's pool "
            "number compares directly to r12's RAW 209.108 s. The "
            "denominator is the per-query min over TWO timing windows "
            "(main loop + an end-of-run re-pass ~15 min later) because "
            "this session measured multi-minute noise bursts that can "
            "swallow any single window; REF_POOL_SEC is r12's "
            "single-window sum, so the two-window min makes pool_sec "
            "(the DENOMINATOR) slightly smaller than the r12 "
            "convention would read it, biasing r13+ normalized totals "
            "slightly HIGH — i.e. slower-looking by a few %, the "
            "conservative direction for a regression check (r13's "
            "record stated the direction inverted; fixed r14 per "
            "ADVICE). The probe-based normalized_total stays recorded "
            "for continuity; recompute any round either way from its "
            "calibration runs. r15+ (r14 verdict #2): when the pool and "
            "the probe disagree by >10% on a round, the HEADLINE "
            "cross-round statistic is normalized_median_ratio — the "
            "median over the common query set of (this round's "
            "per-query min / prior round's per-query min), which needs "
            "no calibration and is robust to both host shape and the "
            "few queries whose plans genuinely changed. Worked example "
            "backfilled from the records: r14-vs-r13 = 0.889 over the "
            "214 common queries (the r14 verdict's in-session estimate "
            "was ~0.96 from a spot sample; 0.889 is the exact-formula "
            "value) — a genuine improvement the pool normalization "
            "alone (8.16 vs 10.93 s pool sum) would have misread",
            "streaming_rows_per_sec": "r14+ (r13 verdict #7): the "
            "ingest probe runs in BOTH timing windows (two main-loop "
            "passes + one end-window pass; envelope = docs over the "
            "fastest), so the number stops inheriting single-window "
            "host bursts — the single-pass figure swung 1911 -> 1593 "
            "-> 1681 across r9-r11 and min-of-2 still read -9% at r13 "
            "purely on burst exposure; all passes are in the runs list",
            "corpus_to_shards": "r12 step-up (3.36 -> 4.45) triaged at "
            "r13: NOT a regression — physical plans are identical "
            "between the r11 and r13 trees (diffed node-by-node) and an "
            "interleaved min-of-5 A/B on one host read r11-tree "
            "3.42/3.62 vs r13-tree 3.39/3.43. The 20-codegen-stage "
            "pipeline only reaches JIT steady state around run 4, so "
            "min-of-2 samples its warm-up ramp: r11's pair landed warm "
            "(3.92/3.36), r12's cold (4.46/4.45). Runs 1-5 in one "
            "session: ~8-9 -> 4.5 -> 4.3 -> 3.8 -> 3.4 s",
            "pool_vs_probe_r14": "r14 builder-run observation: the "
            "frozen 5-query pool read 8.16 s on this host vs r13's "
            "10.93 while the CPU probe min was IDENTICAL (0.375 vs "
            "0.375) and the median common headline query moved only "
            "-4% — the pool (shuffle/shingle-heavy) and the probe "
            "(pure codegen CPU) can disagree by ~25% across hosts, so "
            "when they diverge, triage against the probe-based "
            "normalized_total AND the raw common-set sum (r14: 198.5 s "
            "vs r13's 223.4 over the common 214 — an 11% raw "
            "improvement that pool normalization alone would misread "
            "as a regression). Both calibrations are in every record",
            "jaccard_prefix_pairs": "r14 (new): reads SLOWER than the "
            "co-occurrence candidate twin at sf0.1 by design-honest "
            "accounting — the prefix machinery (global df-rank window "
            "+ exact verify joins) is fixed overhead that only pays "
            "when sum(df^2) over the shingle table blows up (boiler-"
            "plate-heavy corpora, higher thresholds); the candidate-"
            "space reduction is pinned in tests/test_dedup_prefix.py "
            "and the pair set is provably identical (lossless)",
            "knn_pq": "r8 step-up vs r7 is the deliberate 4->8-bit "
            "codebook upgrade (recall@5 0.48->0.94 clustered; RECALL.md)",
            "knn_sq8_persisted": "r9: single-parse expression chains "
            "(943d546); cell-pruned knn_ivf_sq8 is the scale path",
            "knn_ivf_sq8": "r10: probe rebuilt as a single-parse literal "
            "cell->probes map + bounded driver-side refine (IN-pushdown "
            "point lookups replace the corpus scan under the broadcast "
            "rerank join)",
            "brand_affinity_stream": "r12+: headline = the steady-state "
            "read-side fold over the persisted counter indexes; the "
            "3-batch carry ingest is recorded separately under "
            "brand_affinity_stream_build (the knn persisted build-vs-"
            "probe convention, r11 verdict #3). The r11 headline number "
            "(11.63s raw) was ingest-inclusive — not comparable",
            "theil_sen_trend": "r11: the series is the trailing 365 "
            "observed days — Theil-Sen is O(days^2) by definition and "
            "the full 7-year calendar was ~72M pairs (160s+) for a "
            "trend nobody reads past a year; deterministic cut shared "
            "with the oracle",
            "key_skew_profile": "r10 step-up vs r9 is the exact-"
            "percentile rewrite (6fac709): two extra bounded collects "
            "buy the no-unpartitioned-window scale posture the r9 "
            "verdict required — deliberate trade, not a regression",
        },
    }
    with open(os.path.join(repo_root, full_name), "w") as f:
        json.dump(full_record, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"# full per-query record -> {full_name}", file=sys.stderr)

    # The printed line stays under ~2 KB: totals + calibration +
    # build_sec + the 10 slowest queries only.
    # top-8 (was 10 through r12): the r13 line adds the pool-calibration
    # and recall fields, so two slowest-list slots move to the full record
    # to keep the printed line inside the driver's tail capture.
    slowest = dict(
        sorted(times.items(), key=lambda kv: kv[1], reverse=True)[:8]
    )
    # r16 (r15 verdict #8): the compact dict is the UNION of this round's
    # top-8 and the PREVIOUS record's top-8 names, so a query that merely
    # fell out of the top-8 (because it got faster) can never read as
    # "dropped from bench" to the driver's comparator. ≤16 entries —
    # still inside the ~2-3 KB tail capture.
    try:
        with open(os.path.join(repo_root, prev_name)) as fh:
            _prev_top = json.load(fh).get("queries", {})
        _prev_top8 = sorted(
            _prev_top, key=lambda q: _prev_top[q], reverse=True
        )[:8]
        for q in _prev_top8:
            if q in times and q not in slowest:
                slowest[q] = times[q]
    except (OSError, ValueError):
        pass
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                # top-8 slowest only — full map in BENCH_FULL_r{N}.json
                "queries": slowest,
                "n_queries": len(times),
                "sf": sf,
                "calibration": calibration,
                # one-time index construction + first (cold) probe for the
                # persisted ANN entries; their HEADLINE rows are the
                # steady-state probe. Excluded from value/total (as in
                # every prior round) so totals stay cross-round comparable.
                "build_sec": build_sec,
                # host-speed-normalized to the round-6 reference probe,
                # min-to-min (r8+); r7 used median-to-min — recompute
                # either way from the recorded calibration runs
                "normalized_total": normalized_total,
                # r13+ headline normalization: pinned 5-query pool, unit
                # = seconds-on-the-r12-host (see notes.normalization in
                # the full record) — the cross-round comparable number
                "normalized_total_pool": normalized_total_pool,
                # r15+ calibration-free comparator: median per-query
                # min ratio vs the previous round's full record — the
                # headline cross-round statistic when pool and probe
                # calibrations disagree >10% (notes.normalization)
                "normalized_median_ratio": normalized_median_ratio,
                # r16: same comparator vs the committed round-open
                # baseline record (r15 verdict #10)
                "normalized_median_ratio_open": normalized_median_ratio_open,
                "pool_sec": pool_sec,
                "ref_pool_sec": REF_POOL_SEC,
                # recall@5 vs the exact knn_bruteforce frame at this SF —
                # the speed column's accuracy twin (r12 verdict #7)
                "recall_at_5": recall_at_5,
                # dup-graph LSH twins' fidelity vs exact siblings (r15)
                "agreement": agreement,
                "ref_calibration_min": REF_CALIBRATION_MIN,
                "ref_calibration_median": REF_CALIBRATION_MEDIAN,
                # BASELINE.md streaming envelope: docs/sec sustained
                # through the incremental-dedup foreachBatch path
                "streaming_rows_per_sec": streaming_rows_per_sec,
                "full": full_name,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
