"""Skew-mitigation operators: salted aggregation and salted join.

No reference counterpart — the reference runs at local[4] scale where
skew never bites (SURVEY.md §4.2). At 100 TB a single hot key (one viral
SKU, one bot user) turns a shuffle partition into the whole job's
critical path. AQE's skew-join splitting handles storage skew in sort-
merge joins; these operators handle the cases AQE can't:

- ``salted_agg``: two-phase aggregation — partial agg on (key, salt)
  spreads a hot key over N partitions, final agg on (key) combines the
  partials. Identical results to a direct groupBy for decomposable
  aggregates (sum/count/min/max), provably: the oracle checks equality.
- ``salted_join``: the left (big, skewed) side gets a deterministic salt
  in [0, n); the right side is replicated n× with every salt value, and
  the join key becomes (key, salt). A hot left key now lands on n
  partitions instead of one, at the cost of an n× blowup of the right
  side — the classic trade, worth it when right is dim-sized but too big
  to broadcast outright.

Salts are DETERMINISTIC (hash of a unique column mod n), not random:
plans stay replayable, retried tasks produce identical partitioning, and
the DuckDB oracle can verify results exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name → (input column, fn) with fn in
    {sum, count, min, max} (the decomposable set; avg = sum/count at the
    call site). ``salt_col`` is any column that distributes hot keys'
    rows (a unique id is ideal).
    """
    _partial = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    _final = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for _, (_, fn) in aggs.items():
        if fn not in _partial:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    salted = df.withColumn("_salt", F.pmod(F.hash(F.col(salt_col)), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _partial[fn](F.col(src)).alias(f"_p_{name}")
            for name, (src, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _final[fn](F.col(f"_p_{name}")).alias(name)
            for name, (src, fn) in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt_source: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``n_salts``
    partitions; the right side is replicated once per salt value.

    ``salt_source`` is a left-side column whose hash spreads rows of the
    same key (a line number / event id — anything varying within a key).
    """
    l_salted = left.withColumn(
        "_salt", F.pmod(F.hash(F.col(salt_source)), F.lit(n_salts))
    )
    r_replicated = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = l_salted.join(
        r_replicated,
        (l_salted[left_key] == r_replicated[right_key])
        & (l_salted["_salt"] == r_replicated["_salt"]),
        how,
    )
    return out.drop("_salt")


def key_size_profile(df: DataFrame, key_col: str) -> DataFrame:
    """ONE-row skew diagnostic for a join/aggregation key: exact group
    sizes at p50/p90/p99 (discrete order statistics — the value at
    1-based rank ceil(q·n_keys) ascending, ties broken by key, so both
    engines pick the identical element; no interpolation, no floats),
    the max, and two integral ratios: top1_share6 (largest group's
    share of all rows) and p99_over_p50_6 (the skew ratio that decides
    whether salted_join/salted_agg is worth its extra exchange). All
    outputs are exact integers.

    The ranking window runs over the SIZES table — key-cardinality
    rows, dimension-scale, never the fact; at a fact-sized key space
    you'd profile a hash-sample of keys with the same arithmetic."""
    import math

    sizes = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("s")
    )
    w = Window.orderBy("s", "k")
    ranked = sizes.withColumn("rn", F.row_number().over(w)).persist()
    n_keys = ranked.count()  # also materializes before the two reads
    n_rows = ranked.agg(F.sum("s")).collect()[0][0]

    def at(q: float) -> int:
        return math.ceil(q * n_keys)

    wanted = {at(0.5), at(0.9), at(0.99), n_keys}
    by_rank = {
        r["rn"]: r["s"]
        for r in ranked.filter(F.col("rn").isin(*wanted)).collect()
    }
    ranked.unpersist()
    p50, p90 = by_rank[at(0.5)], by_rank[at(0.9)]
    p99, mx = by_rank[at(0.99)], by_rank[n_keys]
    return df.sparkSession.createDataFrame(
        [
            (
                n_keys,
                n_rows,
                p50,
                p90,
                p99,
                mx,
                mx * 1_000_000 // n_rows,
                p99 * 1_000_000 // p50,
            )
        ],
        "n_keys long, n_rows long, p50 long, p90 long, p99 long, "
        "max_sz long, top1_share6 long, p99_over_p50_6 long",
    )
