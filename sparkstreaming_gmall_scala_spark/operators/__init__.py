"""The engine's operator surface: pure DataFrame → DataFrame functions.

Everything here is side-effect-free and works on batch frames (the form
the DuckDB oracle gate checks) and, where semantics allow, directly on
streaming frames; stateful streaming twins live in ``..streaming``.
"""

from .allocation import allocate
from .cdc import (
    parse_envelope,
    parse_envelope_with_dead_letter,
    route_by_rules,
    route_canal,
    route_maxwell,
)
from .bloom import bloom_build, bloom_contaminated
from .cleaning import line_dedup, pii_mask
from .cms import cms_estimate, cms_merge, cms_sketch
from .curation import corpus_features, curate_filter
from .dedup import (
    connected_components,
    containment_pairs,
    cut_spans,
    dup_spans,
    exact_dedup,
    jaccard_pairs,
    keep_best_per_cluster,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_rows,
    simhash64,
)
from .dsir import (
    dsir_bucket_model,
    dsir_logweights,
    dsir_score_with_model,
    dsir_select,
    hashed_ngram_buckets,
)
from .enrich import enrich_left
from .graph import triangle_counts
from .histogram import (
    fixed_histogram,
    histogram_merge,
    histogram_quantile,
)
from .hll import (
    daily_sketches,
    estimate_daily,
    merge_sketch_tables,
    rolling_distinct,
)
from .flags import first_event_flag, members_only
from .multimodal import (
    extract_features,
    frame_sample,
    resize_payload,
    to_binary_payload,
)
from .packing import chunk_tokens, pack_sequences, shuffle_shards
from .pq import ivf_pq_encode, ivf_pq_topk, pq_encode, pq_topk, pq_train
from .scd2 import asof_dim_lookup, scd2_merge, scd2_timeline
from .scoring import model_score
from .sampling import (
    domain_mix,
    hash_stratified_sample,
    mixture_thresholds,
    sample_bucket,
    token_budget_mix,
)
from .kmeans_exact import exact_kmeans, ivf_det_topk
from .similarity import (
    brute_force_topk,
    bucketed_topk,
    bucketize_corpus,
    cosine_near_dup_pairs,
    cosine_near_dup_vectorized,
    hard_negatives,
    ivf_build,
    ivf_probe,
    ivf_topk,
    kmeans_centroids,
    semantic_dedup,
    label_centroids,
    probe_topk,
)
from .skew import salted_agg, salted_join
from .temporal import asof_join, range_join_bucketed
from .zorder import (
    bucket_envelopes,
    with_zvalue,
    z_expr_sql,
    zorder_buckets,
    zorder_write,
)
from .textstats import (
    boilerplate_stats,
    gopher_quality,
    lang_id,
    lm_doc_logprob,
    ngram_overlap_flags,
    perplexity_buckets,
    quality_score,
    repetition_stats,
    tfidf_top_terms,
    token_entropy,
)

__all__ = [
    "allocate",
    "asof_join",
    "exact_kmeans",
    "ivf_det_topk",
    "bloom_build",
    "bloom_contaminated",
    "boilerplate_stats",
    "brute_force_topk",
    "bucketed_topk",
    "bucketize_corpus",
    "chunk_tokens",
    "connected_components",
    "containment_pairs",
    "corpus_features",
    "cosine_near_dup_pairs",
    "cosine_near_dup_vectorized",
    "curate_filter",
    "cut_spans",
    "domain_mix",
    "dsir_bucket_model",
    "dsir_logweights",
    "dsir_score_with_model",
    "dsir_select",
    "dup_spans",
    "enrich_left",
    "exact_dedup",
    "extract_features",
    "first_event_flag",
    "frame_sample",
    "gopher_quality",
    "hard_negatives",
    "hash_stratified_sample",
    "hashed_ngram_buckets",
    "ivf_build",
    "ivf_pq_encode",
    "ivf_pq_topk",
    "ivf_probe",
    "ivf_topk",
    "jaccard_pairs",
    "keep_best_per_cluster",
    "kmeans_centroids",
    "label_centroids",
    "lang_id",
    "line_dedup",
    "lm_doc_logprob",
    "lsh_candidate_pairs",
    "members_only",
    "minhash_signatures",
    "mixture_thresholds",
    "model_score",
    "ngram_overlap_flags",
    "pack_sequences",
    "parse_envelope",
    "parse_envelope_with_dead_letter",
    "perplexity_buckets",
    "pii_mask",
    "pq_encode",
    "pq_topk",
    "pq_train",
    "probe_topk",
    "quality_score",
    "range_join_bucketed",
    "repetition_stats",
    "resize_payload",
    "route_by_rules",
    "route_canal",
    "route_maxwell",
    "salted_agg",
    "salted_join",
    "sample_bucket",
    "semantic_dedup",
    "shingle_rows",
    "shuffle_shards",
    "simhash64",
    "tfidf_top_terms",
    "to_binary_payload",
    "token_budget_mix",
    "token_entropy",
]
