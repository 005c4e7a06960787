"""Round-robin gate rotation: the driver's correctness gate budgets 50
rows, but the catalog holds more oracle-bearing distinct behaviors than
that. Six gate slots cycle mechanically through a pinned POOL of
oracle-bearing names so every distinct behavior gets an independent
driver CORRECTNESS row at least once every ``ceil(len(POOL)/6)`` rounds,
with no hand-editing of gate flags between rounds (rounds 5 and 6
hand-rotated, per verdict; round 6 mechanized the A/B half-sets; round 7
generalized to this cyclic window so NEW full-oracle entries join the
cycle by appending to POOL instead of growing a hand-balanced pair of
sets).

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

Window arithmetic is anchored so rounds 6 and 7 reproduce the historical
half-sets exactly (round 6 gated POOL[0:6], round 7 gated POOL[6:12] —
the former SET_A/SET_B): the window for round N starts at
``((N − 6) * 6) mod len(POOL)`` and wraps cyclically.

Everything not in POOL keeps its static ``gated`` flag from
registration: sole-representative behaviors stay gated every round;
documented twins/subsets stay ungated (their signal lives in pytest
equality with a gated sibling); rows-only entries stay ungated (a
hash-green slot carries more driver signal than a rows-only one).
"""

from __future__ import annotations

import glob
import os

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
)

SET_A: tuple[str, ...] = POOL[0:6]
SET_B: tuple[str, ...] = POOL[6:12]

_SLOTS = 6

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
    """The six POOL names that are GATED this round: a cyclic window of
    ``_SLOTS`` names starting at ``((round − 6) * _SLOTS) mod len(POOL)``
    (anchored so round 6 → POOL[0:6], round 7 → POOL[6:12])."""
    start = ((current_round(repo_root) - 6) * _SLOTS) % len(POOL)
    return tuple(POOL[(start + i) % len(POOL)] for i in range(_SLOTS))
