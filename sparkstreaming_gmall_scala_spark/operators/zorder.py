"""Z-order (Morton) layout: multi-dimensional data clustering for scan
pruning.

No reference counterpart — this is a storage-layout operator for the
100 TB tier: min/max file statistics (parquet footers, partition dirs)
prune scans only along the SORT dimension; sorting by the interleaved-bit
Morton code clusters files into compact hyper-rectangles so predicates
on ANY of the participating columns prune files (the Delta/Iceberg
OPTIMIZE ZORDER BY idea, from Morton 1966 / the UB-tree line of work).

Spark-first: the z-value is pure integer bit arithmetic built as ONE
whole-stage-codegen expression (no UDF), the layout is an ntile bucket
assignment over the z-order (deterministic — repartitionByRange's
sampling is not) followed by a partitioned write, and the pruning
benefit is measurable from the per-bucket min/max envelopes (pinned in
tests: a single-dimension slice predicate touches O(sqrt(F)) of F
z-ordered buckets vs ALL buckets of a layout sorted by the other
column).

The same expression string drives both engines (F.expr on the Spark
side, verbatim SQL in the DuckDB oracle), so ``zorder_keys`` carries a
full value-hash oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def z_expr_sql(cols: Sequence[str], bits: int = 16) -> str:
    """The Morton interleave as portable SQL: bit i of (masked) column j
    lands at position i*ncols + j. ncols*bits must stay < 63. Columns
    are masked to ``bits`` (values beyond the mask wrap into the same
    cell — callers bucketize wide domains first)."""
    n = len(cols)
    if n * bits >= 63:
        raise ValueError("z-value would overflow a signed 64-bit long")
    mask = (1 << bits) - 1
    # every term fully parenthesized: + binds tighter than << in both
    # engines, so a bare `x << 3 + y << 5` would parse as x << (3+y) << 5
    terms = [
        f"(((({c} & {mask}) >> {i}) & 1) << {i * n + j})"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def with_zvalue(
    df: DataFrame, cols: Sequence[str], bits: int = 16, out: str = "zval"
) -> DataFrame:
    """Append the Morton code of ``cols`` — one codegen'd integer
    expression, no shuffle."""
    return df.withColumn(out, F.expr(z_expr_sql(cols, bits)).cast("long"))


def _normalized_cols(
    df: DataFrame, cols: Sequence[str], bits: int
) -> tuple[DataFrame, list[str]]:
    """Min-max-scale each column to the full [0, 2^bits) range so the
    interleave weights every dimension equally — raw interleaving of a
    10-value column against a 100k-value column degenerates to a sort
    on the wide one (the narrow column's high bits are all zero). One
    tiny agg collects 2 scalars per column (the bounded-driver-action
    class); the scaling is exact long arithmetic (`div`), valid while
    (col - min) * mask stays under 2^63 — any key column does."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}__mn"), F.max(c).alias(f"{c}__mx")]
    row = df.agg(*aggs).collect()[0]
    mask = (1 << bits) - 1
    out = df
    names = []
    for c in cols:
        mn, mx = row[f"{c}__mn"], row[f"{c}__mx"]
        span = max(1, (mx - mn) if mx is not None and mn is not None else 1)
        name = f"_z_{c}"
        out = out.withColumn(
            name,
            F.expr(f"(({c} - {mn}) * {mask}) div {span}").cast("long"),
        )
        names.append(name)
    return out, names


def zorder_buckets(
    df: DataFrame,
    cols: Sequence[str],
    n_buckets: int,
    bits: int = 16,
    tiebreak: str | Sequence[str] | None = None,
) -> DataFrame:
    """Assign each row a deterministic z-order bucket (1..n_buckets):
    ntile over the global z-order of the min-max-NORMALIZED columns
    (see _normalized_cols — equal bit weight per dimension). The ntile
    is one global sort — the same cost class as any total-order layout
    job (it IS the rewrite pass; at 100 TB this runs
    per-partition-batch, not per query). ``tiebreak`` (a column or
    column list) must make (zval, tiebreak) UNIQUE per row — without a
    total order, rows straddling an ntile boundary land in
    shuffle-order-dependent buckets and the layout stops being
    reproducible run-to-run."""
    scaled, names = _normalized_cols(df, cols, bits)
    z = with_zvalue(scaled, names, bits)
    if tiebreak is None:
        tb_cols = []
    elif isinstance(tiebreak, str):
        tb_cols = [F.col(tiebreak)]
    else:
        tb_cols = [F.col(c) for c in tiebreak]
    w = W.orderBy(F.col("zval"), *tb_cols)
    return (
        z.withColumn("bucket", F.ntile(n_buckets).over(w).cast("long"))
        .drop(*names)
    )


def zorder_write(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    n_buckets: int = 64,
    bits: int = 16,
    tiebreak: str | Sequence[str] | None = None,
) -> None:
    """Materialize the z-ordered layout: one directory partition per
    bucket, rows sorted by zval within each file so row-group stats nest
    inside the bucket envelope. Readers prune buckets (partition dirs)
    AND row groups on any predicate over ``cols``."""
    (
        zorder_buckets(df, cols, n_buckets, bits, tiebreak)
        .repartition(n_buckets, "bucket")
        .sortWithinPartitions("bucket", "zval")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def bucket_envelopes(zdf: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-bucket min/max of each layout column — exactly the file-stat
    envelope a pruning scan consults. Used by tests and by planners that
    want to count candidate buckets for a predicate box."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return zdf.groupBy("bucket").agg(*aggs)
