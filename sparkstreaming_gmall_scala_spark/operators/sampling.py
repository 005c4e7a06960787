"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is sampled by HASH, never by rand(): the same row keeps
or drops identically on every run, every engine, every retry — which is
what makes downstream experiments reproducible and replayed micro-batches
idempotent. Zero shuffle: sampling is a scan-side filter that pushes into
whole-stage codegen.

The keep-rule compares the first 4 hex chars of md5(key) — a uniform
16-bit draw — against a per-stratum hex threshold string. Comparing
fixed-width lowercase hex LEXICOGRAPHICALLY equals comparing the numbers,
and both Spark and DuckDB md5 emit identical lowercase hex, so the oracle
is byte-for-byte the same rule.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_bucket(key: Column) -> Column:
    """The 16-bit uniform draw for a row: first 4 hex chars of md5(key)."""
    return F.substring(F.md5(key.cast("string")), 1, 4)


def hash_stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    thresholds: dict[str, str],
    default_threshold: str = "0000",
) -> DataFrame:
    """Keep a row iff sample_bucket(key) <= its stratum's threshold.

    ``thresholds`` maps stratum value -> 4-char lowercase hex string; the
    keep rate is (int(t, 16) + 1) / 65536 (e.g. '3fff' → exactly 25%,
    'ffff' → keep all, '0000' → 1/65536).
    """
    for t in list(thresholds.values()) + [default_threshold]:
        if len(t) != 4 or t != t.lower():
            raise ValueError(f"threshold must be 4 lowercase hex chars: {t!r}")
    thr: Column = F.lit(default_threshold)
    for stratum, t in thresholds.items():
        thr = F.when(F.col(strata_col) == stratum, F.lit(t)).otherwise(thr)
    return df.filter(sample_bucket(F.col(key_col)) <= thr)


def mixture_thresholds(
    counts: dict[str, int],
    weights: dict[str, float],
    budget_frac: float,
    default_weight: float = 0.0,
) -> dict[str, int]:
    """Per-stratum 16-bit keep thresholds realizing a target domain mixture.

    Given observed stratum sizes and target mixture weights, the keep count
    for stratum s is ``min(count_s, floor(floor(total·budget_frac)·w_s))``
    and its threshold is ``floor(65536·keep/count) − 1`` (−1 ⇒ drop the
    stratum entirely — the hash rule cannot express rate 0 otherwise).

    Every step is IEEE-double arithmetic in a fixed order so a SQL oracle
    computing the same formula (``floor``, ``least``, literal weights)
    reproduces the thresholds bit-for-bit. Callers should pick weights and
    budget_frac exactly representable in binary (0.5, 0.25, 0.0078125, …)
    so the literals round-trip identically through both engines.
    """
    total = sum(counts.values())
    budget = math.floor(total * budget_frac)
    out: dict[str, int] = {}
    for stratum, cnt in counts.items():
        w = weights.get(stratum, default_weight)
        keep = min(cnt, math.floor(budget * w))
        out[stratum] = min(65535, math.floor(65536.0 * keep / cnt) - 1) if cnt else -1
    return out


def domain_mix(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights: dict[str, float],
    budget_frac: float,
    default_weight: float = 0.0,
) -> DataFrame:
    """Resample a corpus toward a target domain mixture, deterministically.

    The LLM-pretraining data-mixing step (upweight curated sources,
    downweight crawl): the output holds ≈ ``budget_frac·|df|`` rows whose
    per-stratum shares follow ``weights`` (capped at each stratum's actual
    size; weights needn't sum to 1 — ``budget·w_s`` is a per-stratum
    target, not a partition of the budget).

    100 TB shape: one partial-aggregated count per stratum (collected —
    a legitimate post-agg scalar, one row per *domain*, dozens not
    billions), thresholds computed driver-side with the exact integer/IEEE
    recipe of :func:`mixture_thresholds`, then a literal CASE hash-filter
    that evaluates scan-side in whole-stage codegen: zero shuffle on the
    data path, identical keep set on every run/engine/retry.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1))).collect()
    }
    thr_int = mixture_thresholds(counts, weights, budget_frac, default_weight)
    thr: Column = F.lit("")  # "" < any 4-hex bucket ⇒ unseen stratum drops
    for stratum, t in thr_int.items():
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(format(t, "04x") if t >= 0 else "")
        ).otherwise(thr)
    return df.filter(sample_bucket(F.col(key_col)) <= thr)


def token_budget_mix(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    tokens_col: str,
    weights: dict[str, float],
    budget_frac: float,
    default_weight: float = 0.0,
) -> DataFrame:
    """``domain_mix`` with the budget measured in TOKENS, not documents —
    how pretraining mixtures are actually specified ("300B tokens, 50%
    web, 25% books…"): a doc-count mixture over-represents short-doc
    domains by token share.

    Identical machinery, different unit: one partial-aggregated SUM of
    ``tokens_col`` per stratum (collected — one row per domain), the
    :func:`mixture_thresholds` integer/IEEE recipe on those token
    counts, then the same scan-side literal CASE hash-filter. Keeping a
    hash-uniform ``keep_tokens/stratum_tokens`` fraction of DOCS keeps
    that fraction of the stratum's tokens in expectation (doc length is
    independent of its key hash); exact-to-the-token budgeting would
    need an order-dependent running sum — not scan-side, not
    replay-stable — so the expected-token contract is the deliberate
    choice, same as every hash-sampling operator here.
    """
    counts = {
        r[0]: int(r[1] or 0)
        for r in df.groupBy(strata_col)
        .agg(F.sum(F.col(tokens_col).cast("long")))
        .collect()
    }
    thr_int = mixture_thresholds(counts, weights, budget_frac, default_weight)
    thr: Column = F.lit("")
    for stratum, t in thr_int.items():
        thr = F.when(
            F.col(strata_col) == stratum,
            F.lit(format(t, "04x") if t >= 0 else ""),
        ).otherwise(thr)
    return df.filter(sample_bucket(F.col(key_col)) <= thr)


def group_sample_k(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    k: int,
) -> DataFrame:
    """EXACTLY-k deterministic sample per stratum (hash_stratified_sample
    fixes the RATE; this fixes the COUNT — the eval-set / debug-slice
    contract "give me 100 docs per language" where a rate either over- or
    under-shoots small strata). Rows rank by md5(key) within their
    stratum — a uniform, engine-portable, retry-stable order (rand()
    would break replay) — and the top k survive, all rows for strata
    smaller than k. One shuffle on the stratum key; rank ≤ k runs as
    WindowGroupLimit (partial top-k before the exchange), so a hot
    stratum never sorts fully."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def weighted_priority(key: Column, weight: Column) -> Column:
    """The Efraimidis-Spirakis A-ES priority ln(u)/w for a row, with u a
    deterministic 32-bit hash-uniform in (0,1): u = (v + 0.5)/2^32, v =
    the first 8 hex chars of md5(key). Taking the k LARGEST priorities
    samples k rows without replacement with probability proportional to
    weight (ln(u)/w is monotone in the classic u^(1/w) key). Hash-based
    u keeps the sample retry-stable and engine-portable (same md5 hex in
    Spark and DuckDB; the hex->int, +0.5, /2^32, ln, /w expression tree
    is written identically on both sides — all exact-integer inputs into
    the same IEEE double ops).

    Residual portability risk (round-9 advice, same caveat as
    daily_value_corr): ln() is only ~1-ulp-accurate and platform-
    dependent (JVM Math.log vs DuckDB libm), so a priority landing
    within one ulp of a rank-k boundary could order differently on a
    different platform/libm. Observed identical on this host; a
    StrictMath-pinned expression would remove the risk at the cost of a
    slower scan."""
    v = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "double"
    )
    u = (v + F.lit(0.5)) / F.lit(4294967296.0)
    return F.ln(u) / F.greatest(F.lit(1), weight).cast("double")


def weighted_sample_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    strata_col: str | None = None,
) -> DataFrame:
    """EXACTLY-k weighted sample without replacement per stratum (or
    globally): group_sample_k draws uniformly; this draws with
    probability proportional to ``weight_col`` — the "sample documents
    by token count" contract that makes a doc sample token-representative
    instead of over-representing short docs. A-ES (Efraimidis-Spirakis
    2006): rank by the deterministic priority :func:`weighted_priority`
    DESC and keep the top k. Weights clamp to >= 1 so zero/negative
    weights degrade to uniform instead of dividing by zero.

    Scale shape: one shuffle on the stratum key (none of the weight
    math shuffles — it's scan-side codegen); rank <= k runs as
    WindowGroupLimit, so each map partition forwards at most k rows per
    stratum before the exchange — the full corpus never sorts."""
    parts = [strata_col] if strata_col is not None else []
    w = Window.partitionBy(*parts).orderBy(
        F.desc("_pri"), F.col(key_col)
    )
    return (
        df.withColumn(
            "_pri", weighted_priority(F.col(key_col), F.col(weight_col))
        )
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk", "_pri")
    )


def split_thresholds(splits: list[tuple[str, float]]) -> list[tuple[str, int]]:
    """(label, exclusive-upper-bound int) per split on the 16-bit bucket
    space: threshold_i = round(cumfrac_i * 65536). The last split's
    bound is forced to 0x10000 (every bucket below it) so rounding
    never strands a bucket. Bounds are INTS, not hex strings, because
    0x10000 formats to 5 hex chars and lexicographic compare against a
    4-char bucket inverts ('ffff' > '10000') — callers render bounds
    <= 0xffff as 4-char hex and treat >= 0x10000 as always-true."""
    if not splits:
        raise ValueError("need at least one split")
    if any(f < 0 for _, f in splits):
        raise ValueError("negative split fraction")
    total = sum(f for _, f in splits)
    if total <= 0:
        raise ValueError("split fractions sum to zero")
    out: list[tuple[str, int]] = []
    cum = 0.0
    for i, (label, frac) in enumerate(splits):
        cum += frac / total
        bound = 0x10000 if i == len(splits) - 1 else int(cum * 65536 + 0.5)
        out.append((label, bound))
    return out


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: list[tuple[str, float]],
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: every row gets a split
    label from its key's 16-bit md5 bucket vs cumulative-fraction
    thresholds — the reproducible-experiment contract (same row, same
    split, every run/engine/retry; new rows join a split without
    reshuffling old ones, unlike randomSplit whose assignment depends on
    partitioning and seed plumbing). Scan-side CASE in whole-stage
    codegen — zero shuffle, zero state; the oracle runs the identical
    lexicographic hex compares.

    Splits are (label, fraction) IN ORDER — order is part of the
    contract since it fixes which bucket range each label owns."""
    b = sample_bucket(F.col(key_col))
    expr = None
    for label, bound in split_thresholds(splits):
        cond = (
            F.lit(True)
            if bound >= 0x10000
            else b < F.lit(format(bound, "04x"))
        )
        expr = (
            F.when(cond, F.lit(label))
            if expr is None
            else expr.when(cond, F.lit(label))
        )
    return df.withColumn(out_col, expr)
