"""Bloom-filter decontamination — the fixed-memory form of the eval-set
n-gram collision check (the "BFF" pattern popularized by AI2's Dolma
dedup tooling; Bloom 1970 for the structure itself).

Why it exists next to ``ngram_overlap_flags``: the exact check broadcasts
the eval shingle STRINGS, so its broadcast grows with the benchmark
suite. The bloom variant compresses any eval set into an ``m``-bit
filter (k md5-derived positions per shingle) — the executor-side state
is a constant ``m/8`` bytes (128 KiB at the default 2^20) no matter how
many benchmarks are registered, at the price of a bounded
false-positive rate (over-flagging only: contamination screening is
exactly the workload where one-sided error is acceptable, since a
false positive drops a fine doc but a false negative leaks eval data).

Engine shape:
- The BUILD collects the eval set's DISTINCT bit positions to the
  driver — bounded by ``m`` values regardless of eval-set size (they're
  mod-``m`` ints), so the collect is capped at a few MB by construction.
- The PROBE is zero-shuffle: each doc's shingle positions are computed
  JVM-side (the portable md5→int idiom), and one Arrow-batched pandas
  UDF tests them against the broadcast numpy bitset. No join, no
  exchange — the plan is scan → project → UDF.
- Bloom FPs are a deterministic function of (hash family, m, k), so the
  flag is engine-portable: the DuckDB oracle reproduces the identical
  result with the join-semantics definition (all k positions present in
  the eval position set), making this a fully hash-checked bloom filter.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

DEFAULT_M = 1 << 20  # bits; 128 KiB packed
DEFAULT_K = 4


def _positions(col, m: int, k: int):
    """array<bigint> of the k bloom positions for a shingle column:
    position j = md5-prefix int of "j|shingle" mod m (the repo's
    cross-engine hash idiom; independent-ish hashes via the j prefix,
    the same family minhash_signatures uses)."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{j}|"), col)), 1, 8),
                    16,
                    10,
                ).cast("long")
                % F.lit(m)
            )
            for j in range(k)
        ]
    )


def bloom_build(
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> bytes:
    """Pack the eval set's shingle positions into an m-bit bloom filter
    (returned as m/8 little-endian bytes). The collect is bounded by m
    distinct ints however large the eval corpus is."""
    from .dedup import shingle_rows

    sh = shingle_rows(eval_docs, id_col, text_col, n=n)
    pos_rows = (
        sh.select(F.explode(_positions(F.col("shingle"), m, k)).alias("p"))
        .distinct()
        .collect()
    )
    bits = np.zeros(m // 8, dtype=np.uint8)
    pos = np.array([r["p"] for r in pos_rows], dtype=np.int64)
    if pos.size:
        np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
    return bits.tobytes()


def bloom_contaminated(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    bloom_bits: bytes,
    n: int = 3,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> DataFrame:
    """(id, n_ngrams, contaminated): flag docs with ANY distinct shingle
    whose k positions are all set in the filter. Scan-side only — the
    per-doc position arrays are built JVM-side and a single Arrow-batched
    pandas UDF does the bit tests against the broadcast bitset."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(bloom_bits)

    @F.pandas_udf(BooleanType())
    def any_all_set(pos_lists):
        import pandas as pd

        bits = np.frombuffer(bc.value, dtype=np.uint8)
        out = []
        for doc_pos in pos_lists:
            hit = False
            for ngram_pos in doc_pos:
                p = np.asarray(ngram_pos, dtype=np.int64)
                if bool(
                    np.all(bits[p // 8] & (1 << (p % 8)).astype(np.uint8))
                ):
                    hit = True
                    break
            out.append(hit)
        return pd.Series(out)

    # materialize the token array before shingling (the shingle_rows
    # lesson: the inline HOF re-evaluates the tokenizer per n-gram)
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    toked = docs.select(F.col(id_col), toks.alias("_toks"))
    idx = F.sequence(F.lit(0), F.greatest(F.size("_toks") - n, F.lit(0)))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice("_toks", i + 1, n)))
    )
    shingled = toked.select(F.col(id_col), grams.alias("_sh"))
    pos = F.transform(F.col("_sh"), lambda g: _positions(g, m, k))
    return shingled.select(
        F.col(id_col),
        F.size("_sh").cast("long").alias("n_ngrams"),
        any_all_set(pos).alias("contaminated"),
    )
