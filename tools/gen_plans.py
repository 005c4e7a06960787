"""Generate PLANS.md: a physical-plan audit of every catalog query.

For each registered query, build the DataFrame at sf0.001 and count the
plan features the 100 TB design cares about: shuffles (Exchange
hashpartitioning), broadcast joins, Python-worker stages, parquet scans,
whether any scan carries pushed filters, and cartesian/nested-loop
joins (flagged — the only sanctioned ones are the exact-kNN scorings
against a broadcast query batch). Regenerate with
``python tools/gen_plans.py [sf_dir]``.

Deliberately NOT pinned by a test: exact plan shapes move with AQE and
Spark versions; the table is a per-round audit artifact, not a
contract (the load-bearing plan properties are individually guarded in
tests/test_plan_properties.py and the various *_plan_guard tests).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkstreaming_gmall_scala_spark.plans.catalog import load_all  # noqa: E402
from sparkstreaming_gmall_scala_spark.session import get_spark  # noqa: E402

# Iterative drivers (loop of joins with per-iteration persist+count): the
# final DataFrame's plan STRING unrolls every iteration's lineage, so the
# flat counts are meaningless (thousands of phantom exchanges). Their real
# per-iteration plan is guarded in tests; the table carries a note instead.
ITERATIVE = {
    "bpe_train_merges": "3-row driver result (the merge list); real "
    "shape per round: one pair-count aggregate (map-side combined) + "
    "one greedy rewrite pass over the re-persisted token stream - "
    "loop/tie/greedy semantics pinned in tests/test_bpe.py incl. the "
    "oracle-vs-fold islands equivalence on run fixtures",
    "cluster_drift": "k-row driver result off the bounded k x dim "
    "collect (the key_skew_profile convention); real shape: the "
    "exact_kmeans recurrence (iters argmin passes over the cached "
    "quantized frame) + one means pass - guarded in "
    "tests/test_kmeans_exact.py",
    "cluster_drift_live": "k-row driver result off the folded per-cell "
    "mart (k x dim longs); per-batch cost is one argmin pass over new "
    "vectors - batch==live pinned in tests/test_streaming_cells.py",
    "dup_pagerank": "iterative (10 rounds); per-iteration: 1 exchange on "
    "dst + 1 broadcast of dangling mass — guarded in tests/test_pagerank.py",
    "dup_pagerank_lsh": "iterative (6 rounds) like dup_pagerank, with "
    "the edge derivation on the banded-LSH candidate path (O(sum "
    "bucket^2) pair space); hub-order agreement with the exact graph "
    "pinned in tests/test_graph.py",
    "dup_communities": "flat counts are the 3 unrolled LPA rounds "
    "re-printing the exact all-pairs edge lineage per consumer; real "
    "shape per round: 1 edge-dst join + 1 (node,lbl) count exchange + a "
    "per-node <=deg-row argmax window. The exact O(n^2) pair derivation "
    "is the ORACLE BASELINE; the 100 TB form is dup_communities_lsh "
    "(same LPA over the banded-LSH candidate edges) — agreement floors "
    "pinned in tests/test_graph.py",
    "dup_communities_lsh": "flat counts are the 3 unrolled LPA rounds "
    "re-printing the banded-LSH candidate lineage per consumer; real "
    "shape: band-bucket exchange + bucket-collision join (O(sum "
    "bucket^2) candidates, never O(n^2)) + exact-cosine verify, then "
    "per round 1 edge-dst join + 1 count exchange + a per-node window — "
    "the dup-graph family's scale twin (edge recall/co-membership/"
    "purity floors in tests/test_graph.py)",
    "dup_triangles": "flat counts are cache-reprints: the persisted pair "
    "edge list (materialized ONCE — persist+count in operators/graph.py) "
    "has its lineage re-printed per consumer; real shape is 3 equi hash "
    "joins over the cached edges — guarded in tests/test_graph.py",
    "top_supplier": "flat counts are cache-reprints: the per-supplier "
    "aggregate (materialized ONCE — persist+count in plans/tpch.py) "
    "re-prints its lineitem lineage for the scalar-max and equality "
    "consumers; real shape is 1 fact scan + 1 suppkey exchange + 2 "
    "broadcast joins — guarded in tests/test_plan_properties.py",
    "key_skew_profile": "zero counts are an artifact: the profile "
    "computes at BUILD time (1 fact scan + 1 key exchange + a rank over "
    "the key-cardinality sizes table, then two bounded collects) and the "
    "returned frame is a literal one-row result — the executed plan of "
    "the returned frame is a LocalTableScan by design",
    "type_hour_chi2": "flat counts are cache-reprints: the (type, hr) "
    "cell aggregate (materialized ONCE — persist+count in plans/scale.py)"
    " re-prints its events lineage for the row-marginal, column-marginal "
    "and final-join consumers; real shape is 1 events scan + 1 (type,hr) "
    "exchange + 2 dimension-sized marginals broadcast back",
    "event_transitions": "flat counts are cache-reprints: the (from, to) "
    "transition aggregate (materialized ONCE — persist+count in plans/"
    "temporal.py) re-prints its lead-window lineage for the marginal and "
    "final-join consumers; real shape is 1 events scan + 1 user exchange "
    "+ 1 (from,to) exchange + the from-marginal broadcast",
    "bigram_lm": "flat counts are cache-reprints: the (w1, w2) count "
    "aggregate (materialized ONCE — persist+count in operators/"
    "textstats.py:bigram_stats) re-prints its token-explode lineage for "
    "the w1-marginal, w2-continuation and final-join consumers; real "
    "shape is 1 documents scan + 1 (w1,w2) exchange + 2 vocabulary-sized "
    "rollups broadcast back + TakeOrderedAndProject",
    "session_concurrency": "flat counts are cache-reprints: the boundary "
    "delta index (one row per distinct session start/end, materialized "
    "ONCE — persist+count in operators/temporal.py:concurrency_sweep) "
    "re-prints its sessionize lineage for the local-prefix, bucket-total "
    "and offset-join consumers; real shape is 1 events scan + 1 user "
    "exchange + 1 timestamp exchange + the one-row-per-bucket offset "
    "broadcast",
    "welch_t_nation": "the 1 cartesian is the sanctioned ONE-ROW global-"
    "moments crossJoin (total−group complement trick, the chi² grand-"
    "total pattern); real shape is 1 orders scan + 2 dim broadcasts + 1 "
    "nation exchange + the broadcast single-row join",
    "skipgram_cooc": "zero counts are the bounded top-100 materialization "
    "(collect + createDataFrame so the unigram cache unpersists before "
    "return — the bigram_lm discipline); real shape is 1 documents scan "
    "+ 1 pair exchange + 2 vocabulary-sized broadcast joins + "
    "TakeOrderedAndProject",
    "revenue_ewma": "zero counts are the dimension-bounded sequential "
    "fold (the integer fixed-point recurrence runs driver-side over the "
    "collected |nations|x|days| daily frame — the KM discipline); real "
    "shape is 1 orders scan + 2 dim broadcasts + 1 (nation, day) "
    "exchange",
    "holt_forecast": "zero counts are the dimension-bounded sequential "
    "fold (the coupled level+trend integer recurrence runs driver-side "
    "over the collected |nations|x|days| daily frame — the revenue_ewma "
    "discipline, with explicit truncating division because the trend "
    "term goes negative); real shape is 1 orders scan + 2 dim "
    "broadcasts + 1 (nation, day) exchange",
    "levene_bf_status": "zero counts are the one-row materialization "
    "(dow_anova discipline); real shape is 1 orders scan + the 3-status "
    "median agg broadcast back + ONE 9-column conditional-moment pivot "
    "row; the Brown-Forsythe W double tree folds driver-side in the "
    "same fixed association as the oracle",
    "brand_affinity": "zero counts are the |brands|²-row matrix "
    "materialization (collect + createDataFrame frees the distinct "
    "(order, brand) projection); real shape is 1 lineitem scan + 1 part "
    "broadcast + the order-keyed self-join (quadratic only in basket "
    "width) + two broadcast frequency joins",
    "user_survival": "zero counts are the day-span-bounded KM fold "
    "(the integer fixed-point recurrence runs driver-side over the "
    "collected duration table); real shape is 1 events scan + 1 user "
    "exchange (lifetimes) + 1 duration aggregate",
    "lang_confusion": "zero counts are the |langs|²-cell matrix "
    "materialization (collect + createDataFrame frees the cells "
    "cache); real shape is 1 documents scan + 1 (declared, predicted) "
    "exchange + the row-marginal broadcast",
    "audience_overlap": "zero counts are the |segments|²-row overlap "
    "matrix materialization (collect + createDataFrame frees the "
    "distinct (segment, user) projection cache); real shape is 1 events "
    "scan + the user-keyed self-join + two broadcast size joins",
    "name_entity_clusters": "zero counts are the cluster-bounded rollup "
    "materialization (collect + createDataFrame frees the dictionary "
    "cache); real shape is 1 part scan + the blocked fuzzy dictionary "
    "self-join + O(diameter) CC propagation rounds over the tiny match "
    "graph (the dup_clusters machinery)",
    "cdc_refresh_totals": "zero counts are the |statuses|-row post-"
    "refresh aggregate materialization (the /tmp mirror is removed "
    "after the bounded collect); real shape is 1 orders scan split "
    "into base + change batches, the apply's merge window + delete "
    "filter + two-rename swap, and one re-read aggregate",
    "winsorized_value_mean": "zero counts are the |types|-row profile "
    "materialization (collect + createDataFrame frees the histogram "
    "cache); real shape is 1 events scan folded into a per-type value "
    "histogram + per-type cumulative window + histogram-side clip "
    "folds — the fact rows are never rescanned",
    "order_value_deciles": "zero counts are the <=10-row profile "
    "materialization (collect + createDataFrame frees the histogram "
    "cache); real shape is 1 orders scan + 1 cents exchange (histogram) "
    "+ the two-level cumulative prefix + per-decile folds over the "
    "HISTOGRAM — the fact table is never rescanned",
    "dim_snapshot_diff": "zero counts are the dim-bounded diff "
    "materialization (collect + createDataFrame frees the persisted SCD2 "
    "timeline); real shape is 1 orders scan + 1 custkey exchange (window "
    "chain) + 1 key self-join of two validity filters over the cached "
    "timeline",
    "bm25_search": "zero counts are the <=top_n-row materialization "
    "(collect + createDataFrame so the per-doc tf cache unpersists "
    "before return); real shape is 1 documents scan + 1 doc exchange "
    "(per-doc length + per-term tfs in ONE groupBy) + a one-row corpus-"
    "stats fold + TakeOrderedAndProject over the cached per-doc frame",
    "conversion_lag": "zero counts are the |bands|-row materialization "
    "(collect + createDataFrame frees the as-of join cache); real shape "
    "is 1 events scan split into clicks/orders + the union-and-carry "
    "as-of join (1 user exchange) + the bounded band aggregate",
    "dup_cores": "iterative k-peeling with per-round localCheckpoint "
    "lineage cuts: the returned frame is a checkpoint scan by design; "
    "per pass: one degree aggregate over the symmetrized cached edges + "
    "one anti-join node peel + one anti-join edge prune — guarded in "
    "tests/test_graph.py against a local peeling reference",
    "spend_lorenz": "zero counts are the <=10-row curve materialization "
    "(decile_profile collects the bounded profile and frees its "
    "histogram cache internally); real shape is 1 orders scan + 1 "
    "custkey exchange + 1 cents exchange (histogram) + the two-level "
    "cumulative prefix — the fact table is never rescanned",
    "ks_spend_by_status": "zero counts are the one-row test-result "
    "materialization; real shape is 1 orders scan folded to the "
    "distinct-cents two-group histogram + two two-level log2-bucket "
    "prefix walks + a one-row integer cross-multiplied max",
    "kendall_tau_daily": "zero counts are the one-row materialization; "
    "real shape is 1 orders scan folded to the calendar-bounded daily "
    "frame + the |days|²-bounded pair crossJoin (documented: days are "
    "calendar-fixed, they do not scale with sf) + two tie rollups",
    "revenue_runs_test": "zero counts are the one-row materialization; "
    "real shape is 1 orders scan folded to the daily frame, the exact "
    "median off the value histogram, and a calendar-bounded collected "
    "sign series folded driver-side (the EWMA/KM discipline)",
    "dow_anova": "zero counts are the one-row materialization; real "
    "shape is 1 orders scan folded to the daily frame + ONE 21-column "
    "conditional-moment pivot row; the 7-term SSW double tree folds "
    "driver-side in the same fixed association as the oracle",
    "assoc_rules": "zero counts are the 2·|brands|²-row rule-matrix "
    "materialization (collect + createDataFrame frees the distinct "
    "(order, brand) projection — the brand_affinity discipline); real "
    "shape is 1 lineitem scan + the order-keyed self-join (quadratic "
    "only in basket width) + two broadcast frequency joins",
    "benford_check": "zero counts are the 9-row digit-audit "
    "materialization (collect frees the digit-count cache); real shape "
    "is 1 orders scan + one 9-row digit aggregate + the literal "
    "expected-ppm join",
    "cohort_ltv": "zero counts are the |months|²/2-row matrix "
    "materialization (collect + createDataFrame frees the per-"
    "(customer, month) cache); real shape is 1 orders scan + 1 "
    "(custkey, month) exchange + the gap-filled grid's cumulative "
    "window over the months²-bounded frame",
    "domain_unigram_cosine": "zero counts are the |sources|²-row "
    "materialization (collect frees the (source, word) count cache); "
    "real shape is 1 documents token scan + the vocabulary-keyed "
    "self-join of that aggregate + two broadcast norm joins",
    "theil_sen_trend": "zero counts are the |nations|-row "
    "materialization (collect frees the daily cache); real shape is 1 "
    "orders scan + 1 (nation, day) exchange + the days-per-nation-"
    "quadratic pair join + the nation-partitioned median rank window "
    "over the bounded pair frame",
    "rfm_segments": "the flat row is real but build-time work is "
    "hidden: the 3×4 quintile boundaries come from three value-"
    "histogram folds off the cached RFM aggregate (two-level prefix, "
    "bounded collects) before the returned scoring pass recomputes the "
    "per-customer aggregate once",
    "brand_affinity_stream": "zero counts are the |brands|²-row "
    "materialization after the /tmp 3-batch ingest (the cdc_refresh_"
    "totals discipline); real shape per batch is 1 anti-join against "
    "the exact-generation carry + the order-keyed new×(old ∪ new) pair "
    "join (quadratic only in basket width) + three additive counter "
    "appends, then the read side folds partials and applies the batch "
    "query's broadcast lift joins",
    "mwu_spend_by_status": "zero counts are the one-row materialization "
    "(exact-integer rank sums collected, z computed driver-side through "
    "the oracle's double tree); real shape: 1 orders scan -> distinct-"
    "cents histogram + the two-level prefix walk, no fact-sized sort",
    "mann_kendall_trend": "zero counts are the |nations|-row "
    "materialization (theil_sen discipline); real shape: 1 orders scan "
    "folds to the |nations|x365 daily frame, the day-pair self-join is "
    "calendar-bounded, three aggregates off the cached fold",
    "spc_violations": "zero counts are the calendar-bounded violation-"
    "day materialization; real shape: 1 orders scan -> daily fold, one "
    "exact DECIMAL moment row, gaps-and-islands run windows over "
    "<= |calendar| rows",
    "spc_violations_live": "zero counts are the calendar-bounded "
    "violation-day materialization after the SHARED /tmp daily-index "
    "ingest; real read shape: fold the additive (d, y) partials (one "
    "day exchange over |calendar| x generations rows), then the exact "
    "integer rule engine (operators/spc.py) — identical to the batch "
    "query above the fold",
    "dow_seasonal_factors_live": "reads the SHARED /tmp daily index "
    "(one ingest serves spc_violations_live and this); real read shape: "
    "fold the additive (d, y) partials, then dow_factors' bounded "
    "centered-MA window over the calendar-bounded fold — identical to "
    "the batch query above the fold",
    "isotonic_revenue_live": "reads the SHARED /tmp daily index (one ingest serves spc_violations_live, dow_seasonal_factors_live and this); real read shape: fold the additive (d, y) partials, then the SAME calendar-bounded PAVA evaluator as the batch query",
    "isotonic_revenue": "zero counts are the calendar-bounded materialization (the PAVA pool merge walks the collected |days| daily frame driver-side — the EWMA/KM discipline); real shape is 1 orders scan + 1 day exchange folding to the daily frame",
    "hybrid_search_rrf_live": "zero counts are the bounded fused-ranking "
    "materialization (the live BM25 stage materializes its top-20 off "
    "the SHARED /tmp postings index — bm25_search_live's ingest); real "
    "shape: postings fold + scoring, one broadcast cosine scan, then "
    "the <= 40-row full-outer fusion join",
    "mmr_rerank": "zero counts are the bounded diversified-ranking "
    "materialization (the greedy walks a constant-size collect: 20 "
    "candidates + <= 380 pairwise sims, both from brute_force_topk); "
    "real shape: one broadcast cosine scan + WindowGroupLimit for the "
    "candidates, then a 20-vector pairwise pass",
    "hybrid_search_rrf": "zero counts are the bounded fused-ranking "
    "materialization (bm25_rank materializes its top-20 — the "
    "bm25_search discipline); real shape: the two retrieval primitives "
    "(one token scan + TakeOrderedAndProject; one broadcast cosine scan "
    "+ WindowGroupLimit) then a <= 40-row full-outer fusion join",
    "bm25_search_live": "reads the /tmp postings index its own 3-batch "
    "ingest maintains (per-doc (dl, tf…) constants); real read shape: "
    "fold the index (dedup on doc_id), re-derive N/avgdl/df in one "
    "bounded row, then the batch query's own scoring stage + "
    "TakeOrderedAndProject",
    "revenue_ewma_live": "reads the SHARED /tmp nation-daily index (one "
    "ingest serves holt_forecast_live and this); real read shape: fold "
    "the additive (n_name, day, y) partials, then the SAME driver-side "
    "sequential evaluator as the batch query (operators/smoothing.py) "
    "over the dimension-bounded fold",
    "holt_forecast_live": "reads the SHARED /tmp nation-daily index (one "
    "ingest serves revenue_ewma_live and this); real read shape: fold "
    "the additive (n_name, day, y) partials, then the SAME level+trend "
    "evaluator as the batch query (operators/smoothing.py) over the "
    "dimension-bounded fold",
    "kmv_distinct_stream": "reads the /tmp k-min index its own 3-batch "
    "ingest maintains; real read shape: union the per-batch k-min "
    "partials, re-take the k smallest distinct hashes per day "
    "(WindowGroupLimit over |days| x k x generations rows), read the "
    "estimator — the KMV merge monoid, identical estimate to the batch "
    "query by construction",
    "cramers_v_type_hour": "zero counts are the one-row materialization "
    "(chi2 cell sum + dims collected, V computed driver-side); real "
    "shape: 1 events scan -> |types|x24 cells, broadcast marginals, one "
    "integer fold",
    "revenue_acf": "zero counts are the <=7-row materialization; real "
    "shape: 1 orders scan -> calendar-bounded daily fold, a 7-lag "
    "explode hash-joined back on the shifted day, DECIMAL(38,0) moment "
    "aggregate per lag",
    "lag_lead_xcorr": "zero counts are the <=15-row materialization; "
    "real shape: 1 events scan -> two calendar-bounded daily folds, a "
    "15-lag explode over the cached purchase side hash-joined on the "
    "shifted day, DECIMAL(38,0) moment aggregate per lag",
    "assoc_rules_live": "zero counts are the |brands|²-row "
    "materialization after the SHARED /tmp basket ingest (one ingest "
    "serves brand_affinity_stream and this fold); real read shape: fold "
    "the three counter indexes, expand the unordered pair counter to "
    "both rule directions via a swapped union, then the batch query's "
    "broadcast confidence/support/lift joins",
    "calibrated_quality_scores": "flat counts are cache-reprints: the "
    "per-doc (q6, bin, keep) frame (materialized ONCE — persist+count) "
    "re-prints its quality-score + fingerprint-window lineage for the "
    "<=21-row bin aggregate (collected for the driver-side weighted PAVA "
    "via bounded_series_eval) and the final broadcast application join; "
    "real shape is 1 documents scan + 1 fp exchange (keep window) + 1 "
    "doc_id join + the <=21-row calibration broadcast",
    "embed_spectral_audit": "zero counts are the 64-row driver result "
    "(createDataFrame — the key_skew_profile convention): the audit "
    "computes at BUILD time as 3 power-iteration steps over ONE cached "
    "quantized frame (per step: a per-row dot against 64 broadcast "
    "literals + 64 DECIMAL(38,0) sums folding to a single row), with "
    "the 64-component normalization in driver big-int arithmetic — "
    "exactness + convergence pinned in tests/test_spectral.py",
    "embed_spectral_audit_live": "zero counts are the 64-row driver "
    "result after the SHARED /tmp Gram-mart ingest; real read shape: "
    "fold the 4096 additive Gram cells (dedup on cell+src_batch, exact "
    "integer sums) and run the identical trunc-div power iteration on "
    "the 64x64 matrix driver-side — batch == live exactly "
    "(tests/test_streaming_spectral.py)",
    "embed_pca_audit": "zero counts are the 64-row driver result (the "
    "embed_spectral_audit convention): ONE distributed pass collects "
    "(n, mu, Gram) exactly, the driver builds the integer n*M - mu*mu' "
    "and walks the 64x64 power iteration in big-int arithmetic — "
    "exactness + the raw-vs-centered pathology split pinned in "
    "tests/test_spectral.py",
    "knn_ivf_sq8": "zero counts are the k*|queries|-row materialization "
    "(collect + createDataFrame after the bounded refine); real shape "
    "is 1 cell-PRUNED codes read (partition filter from the literal "
    "cell->probes map) + the ADC scoring scan + an IN-pushdown point "
    "refine of <= k*|queries| rows — the corpus is never fully scanned",
}

PY_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
)


def audit(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"Exchange hashpartitioning", plan)),
        "broadcasts": len(re.findall(r"BroadcastHashJoin", plan)),
        "python": sum(plan.count(m) for m in PY_MARKERS),
        "scans": len(re.findall(r"Scan parquet|FileScan parquet", plan)),
        "pushed": bool(re.search(r"PushedFilters: \[[A-Za-z]", plan)),
        "cartesian": len(
            re.findall(r"CartesianProduct|BroadcastNestedLoopJoin", plan)
        ),
    }


def render(sf_dir: str) -> str:
    spark = get_spark("plans", master="local[8]", shuffle_partitions=8)
    reg = load_all()
    rows = []
    try:
        for name in sorted(reg):
            if name in ITERATIVE:
                rows.append((name, {"note": ITERATIVE[name]}))
                continue
            try:
                df = reg[name].builder(spark, sf_dir)
                plan = df._jdf.queryExecution().executedPlan().toString()
                rows.append((name, audit(plan)))
            except Exception as ex:  # noqa: BLE001 — audit must complete
                rows.append((name, {"error": str(ex)[:80]}))
    finally:
        spark.stop()
    lines = [
        "# Physical-plan audit",
        "",
        f"Auto-generated by `tools/gen_plans.py` at `{os.path.basename(sf_dir.rstrip('/'))}` "
        "— per catalog query: shuffle exchanges, broadcast hash joins, "
        "Python-worker stages, parquet scans, pushed-filter presence, and "
        "cartesian/nested-loop joins. Python stages appear only in the "
        "sanctioned Arrow families (PQ ADC scans, model scoring, "
        "multimodal, stateful streaming); cartesian rows are the exact "
        "kNN scorings against a broadcast query batch and the broadcast "
        "SCALAR-bounds joins (1-row or |days|-row build sides: histogram "
        "bounds, HLL window expansion, DSIR totals — documented) — "
        "anything else in those columns is a regression. Plan-property "
        "CONTRACTS live in tests/test_plan_properties.py; this table is "
        "the round's full-surface audit.",
        "",
        "Caveat: queries built over persisted intermediates (`corpus_*`, "
        "the pairwise shingle families) re-print the cached lineage once "
        "per consumer in the plan string, so their scan/exchange counts "
        "are upper bounds on the physical work — at runtime each cache "
        "materializes once (the single-scan contract is pinned in "
        "tests/test_curation.py). Iterative drivers carry a note instead "
        "of counts.",
        "",
        "| Query | Exchanges | Broadcast joins | Python stages | Scans | Pushed filters | Cartesian |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        if "note" in a:
            lines.append(f"| `{name}` | — | — | — | — | — | {a['note']} |")
            continue
        if "error" in a:
            lines.append(f"| `{name}` | — | — | — | — | — | error: {a['error']} |")
            continue
        lines.append(
            f"| `{name}` | {a['exchanges']} | {a['broadcasts']} | "
            f"{a['python']} | {a['scans']} | "
            f"{'yes' if a['pushed'] else '—'} | "
            f"{a['cartesian'] or '—'} |"
        )
    lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS.md",
    )
    with open(out, "w") as f:
        f.write(render(sf_dir))
    print(f"wrote {out}")
