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

from pyspark.sql import Column, DataFrame
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
