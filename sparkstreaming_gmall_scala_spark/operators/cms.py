"""Count-min sketch: fixed-size frequency summaries with one-sided error.

The missing member of the engine's sketch family (bloom.py answers
"seen?", approx_count_distinct answers "how many distinct?"; CMS answers
"about how often?" in O(depth x width) space regardless of key
cardinality). Reference counterpart: none — the reference's per-key
counts are exact hash aggregations (ads/TrademarkStatApp.scala:67-72);
CMS is what replaces them when the key space itself no longer fits a
shuffle at 100 TB (per-user counters over billions of users).

Design, Spark-first:
- The sketch IS a DataFrame of (row, bucket, cnt) — at most depth*width
  rows no matter the input size. Building it is ONE shuffle: each input
  row explodes to its `depth` (row, bucket) cells and a single groupBy
  partial-aggregates map-side, so the wire carries <= depth*width rows
  per task, not the input.
- Estimation joins probe cells against the sketch; the sketch side is
  always broadcast (bounded by depth*width), so probing is zero-shuffle
  beyond the per-key distinct.
- Hashes are md5-derived (row-salted), the engine-portable determinism
  discipline every dedup/DSIR operator here uses: DuckDB computes the
  exact same sketch, which is why ``heavy_hitters_cms`` can carry a full
  value-hash oracle despite being an *approximate* structure — the
  approximation is deterministic.
- Merging sketches is addition on matching (row, bucket) cells (CMS is a
  commutative monoid), which is what makes the streaming ingest in
  streaming/cms.py exact across micro-batches.

Guarantees (Cormode & Muthukrishnan 2005): est >= true, and
est <= true + e*N/width with probability 1 - (1/2)^depth per key
(pinned as a property test over the real tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cms_bucket(col: F.Column, row: int, width: int) -> F.Column:
    """Deterministic bucket of ``col`` for sketch row ``row``: first 15
    hex chars of md5(key ∥ '|' ∥ row) mod width. 15 hex chars = 60 bits,
    safely inside a long; identical to the DuckDB expression
    ('0x' || substr(md5(k || '|' || i), 1, 15))::BIGINT % width."""
    h = F.md5(F.concat_ws("|", col.cast("string"), F.lit(str(row))))
    return F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(width)
    )


def cms_cells(df: DataFrame, key_col: str, depth: int, width: int) -> DataFrame:
    """Explode each input row into its ``depth`` sketch cells:
    (row, bucket) — the map side of both build and probe."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("row"),
                cms_bucket(F.col(key_col), i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    # null keys are dropped, not hashed: Spark's concat_ws would skip the
    # null and hash just the salt (a phantom shared bucket for every null)
    # while the SQL '||' in the oracle propagates NULL — filtering is the
    # one semantics both engines can state explicitly
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col), F.explode(cells).alias("_c"))
        .select(
            key_col,
            F.col("_c.row").alias("row"),
            F.col("_c.bucket").alias("bucket"),
        )
    )


def cms_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: (row, bucket, cnt), <= depth*width rows. One
    shuffle, map-side combined down to the cell space per task."""
    return (
        cms_cells(df, key_col, depth, width)
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): cell-wise sum.
    The monoid operation streaming ingest folds micro-batches with."""
    it = iter(sketches)
    acc = next(it)
    for s in it:
        acc = acc.unionByName(s)
    return acc.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int,
    width: int,
) -> DataFrame:
    """Point estimates for each key in ``keys`` (one row per key):
    min over the key's depth cells. The sketch is broadcast — it is at
    most depth*width rows by construction — so the probe adds no
    shuffle beyond the caller's distinct. A key's own counts are in
    every cell it hashes to, hence est >= true always; absent cells
    coalesce to 0 (key never seen)."""
    probes = cms_cells(keys, key_col, depth, width)
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )
