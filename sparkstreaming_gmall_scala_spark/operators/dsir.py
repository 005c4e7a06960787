"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) as a pure DataFrame plan.

The standard pretraining-data-selection technique when you have a small
high-quality TARGET corpus and a huge RAW crawl: featurize every doc as
hashed n-gram counts, fit two bag-of-buckets unigram models (target vs
raw), and weight each raw doc by its log importance ratio
``log p_target(doc) − log p_raw(doc)``; resampling raw docs by these
weights yields a corpus distributed like the target.

Engine shape (the part that matters at 100 TB):

- Featurization is one projection — unigrams + bigrams hashed to ``b``
  buckets via the repo's portable md5→int idiom — followed by exactly ONE
  partial-aggregated groupBy over the occurrence frame into per-doc
  bucket counts ``(id, bucket, c)`` (the lm_doc_logprob restructure
  argument: everything downstream runs at distinct-bucket granularity).
- Both class models are ≤ ``b`` rows each: they derive from the per-doc
  frame by a second, bucket-keyed groupBy whose input is already
  compressed, and the final per-bucket log-ratio table is at most ``b``
  rows — BROADCAST to the per-doc join, so scoring a 100 TB corpus never
  shuffles on content after the first groupBy.
- No model file, no Python in the hot path: the "classifier" is two
  Laplace-smoothed count vectors, entirely in SQL-expressible builtins
  (full DuckDB oracle).

Determinism: each bucket's log-ratio is quantized to integer nano-units
(floor(ln·1e9 + 0.5) as BIGINT) BEFORE the per-doc weighted sum, so doc
scores are exact integer arithmetic — partition/accumulation-order
independent on both engines (the lm_doc_logprob convention).

Selection: the paper perturbs weights with Gumbel noise and takes the
global top-k. A global top-k is a driver-side sort at corpus scale and
randomness breaks the cross-engine hash, so the operator exposes the
deterministic threshold form (``keep = avg_logw ≥ tau``, zero extra
shuffle); production picks ``tau`` from approx_percentile of
``avg_logw`` to hit a budget, and a Gumbel draw keyed on md5(doc_id)
would make the paper's sampled variant reproducible if wanted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    """Non-empty whitespace tokens of lower(text) — the repo-standard
    tokenizer (mirrors plans/llm.py::_TOKENS)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )


def hashed_ngram_buckets(
    docs: DataFrame, id_col: str, text_col: str, b: int = 4096
) -> DataFrame:
    """(id, bucket, c): per-doc hashed-feature counts. Features are the
    doc's unigrams plus adjacent-pair bigrams ("w1 w2"), the DSIR paper's
    featurization; bucket = md5-prefix int mod ``b`` (portable across
    engines). One explode + one partial-aggregated groupBy."""
    toked = docs.select(F.col(id_col), _tokens(text_col).alias("_toks"))
    feats = toked.select(
        F.col(id_col),
        F.explode(
            F.concat(
                F.col("_toks"),
                F.when(
                    F.size("_toks") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("_toks") - 1),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at("_toks", i),
                            F.element_at("_toks", i + 1),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        ).alias("feat"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("feat")), 1, 8), 16, 10)
        .cast("long")
        % F.lit(b)
    ).alias("bucket")
    return (
        feats.select(F.col(id_col), bucket)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_bucket_model(
    docs: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    b: int = 4096,
) -> DataFrame:
    """(bucket, _l9): the learned DSIR "model" — one row per occupied
    bucket with the nano-quantized log importance ratio
    floor((ln p̂_target(b) − ln p̂_raw(b))·1e9 + 0.5). At most ``b``
    rows, so it persists as a KB-scale parquet and broadcasts into any
    later scoring join (the streaming pipeline freezes this table at
    train time — the frozen-centroid contract of streaming/ann.py)."""
    per_doc = hashed_ngram_buckets(docs, id_col, text_col, b)
    target_ids = target.select(id_col).distinct()
    raw_counts = per_doc.groupBy("bucket").agg(F.sum("c").alias("cr"))
    tgt_counts = (
        per_doc.join(F.broadcast(target_ids), id_col)
        .groupBy("bucket")
        .agg(F.sum("c").alias("ct"))
    )
    n_raw = raw_counts.agg(F.sum("cr").alias("nr"))
    n_tgt = tgt_counts.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"))
    return (
        raw_counts.join(tgt_counts, "bucket", "left")
        .crossJoin(n_raw)
        .crossJoin(n_tgt)
        .select(
            "bucket",
            F.floor(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                        / (F.col("nt") + b)
                    )
                    - F.log(
                        (F.col("cr") + 1).cast("double") / (F.col("nr") + b)
                    )
                )
                * 1e9
                + 0.5
            )
            .cast("long")
            .alias("_l9"),
        )
    )


def dsir_score_with_model(
    docs: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    b: int = 4096,
) -> DataFrame:
    """(id, n_feats, avg_logw): score docs against a FIXED bucket model
    (dsir_bucket_model's output, in-memory or read back from parquet).
    The model broadcasts; the only shuffle is the per-doc bucket-count
    groupBy. Features hashing to a bucket absent from the model (possible
    when scoring docs unseen at train time) contribute 0 — the neutral
    prior — while still counting in n_feats."""
    per_doc = hashed_ngram_buckets(docs, id_col, text_col, b)
    per = (
        per_doc.join(F.broadcast(model), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(
                F.col("c") * F.coalesce(F.col("_l9"), F.lit(0))
            ).alias("_s9"),
        )
    )
    return (
        docs.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            (
                F.floor(
                    F.when(
                        F.col("n_feats") > 0,
                        F.col("_s9") / 1e9 / F.col("n_feats"),
                    ).otherwise(F.lit(0.0))
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("avg_logw"),
        )
    )


def dsir_logweights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    b: int = 4096,
) -> DataFrame:
    """(id, n_feats, avg_logw): per-doc DSIR log importance weight.

    ``target`` is a subset of ``docs`` (same id/text columns) defining
    the distribution to select toward. Both bag-of-buckets models are
    Laplace-smoothed — p(bucket | class) = (c + 1) / (N + b) — so every
    bucket scores finitely even when unseen in a class. avg_logw is the
    MEAN over doc feature occurrences of ln(p_t/p_r) (the paper's sum
    normalized by length, so the score ranks docs rather than lengths),
    reported to 6 dp; docs with no features score 0.0 with n_feats = 0.

    Composition: train + score in one plan — the self-scoring special
    case of dsir_bucket_model → dsir_score_with_model, where every doc
    bucket exists in the model by construction (raw counts come from the
    same corpus), so the scoring join's missing-bucket prior never
    fires. Catalyst reuses the shared per-doc bucket-count subtree.
    """
    model = dsir_bucket_model(docs, target, id_col, text_col, b)
    return dsir_score_with_model(docs, model, id_col, text_col, b)


# Per-feature log-ratio threshold for dsir_select's keep flag. The raw
# DSIR sum scales with doc length and — with a small target corpus —
# Laplace mass pushes every doc negative, so thresholding the per-feature
# MEAN is what separates target-like docs (the LM_THRESHOLD precedent:
# a fixed, documented cut; production re-derives it per corpus from
# approx_percentile to hit a token budget).
DSIR_TAU = -0.09


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    b: int = 4096,
    tau: float = DSIR_TAU,
) -> DataFrame:
    """(id, n_feats, avg_logw, keep): threshold selection over per-feature
    DSIR weights — keep docs whose mean feature log-ratio says
    "target-like" (avg_logw ≥ tau). Zero shuffle beyond
    dsir_logweights."""
    w = dsir_logweights(docs, target, id_col, text_col, b)
    return w.withColumn("keep", F.col("avg_logw") >= F.lit(float(tau)))
