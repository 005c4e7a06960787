"""Temporal joins the reference lacks (SURVEY.md §2.3 "not present":
range/as-of joins) — implemented shuffle-minimally for the 100 TB target.

As-of join: the classic union-and-carry formulation — probes and refs are
unioned, sorted once per key by (time, side, tiebreak), and the latest ref
attributes are carried forward with last(ignorenulls). ONE shuffle on the
key, no per-probe range scan, no state blowup: cost is a sort of
|probes| + |refs| per key, which is the optimal distributed shape (an
interval/theta join would make Catalyst fall back to a nested-loop).

Range join: equi-join on (key, time-bucket) with the left side exploded
into the <=2 buckets its window spans, then the exact range predicate as a
post-filter. Bucketing turns an unbounded range predicate into a bounded
equi-join so Catalyst uses a hash/sort-merge join; work per (key, bucket)
is bounded by the window width instead of the key's full history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    refs: DataFrame,
    on: str,
    time_col: str,
    tiebreak: str,
    n_prior_alias: str = "n_prior",
) -> DataFrame:
    """Backward as-of join: for each probe row, attach the ref row with the
    greatest ``time_col`` <= the probe's ``time_col`` (per ``on`` key),
    ties broken by the greatest ``tiebreak``; left semantics (no ref ⇒
    nulls, ``n_prior_alias`` = 0).

    ``probes`` and ``refs`` must share ONLY the ``on`` and ``time_col``
    column names; every other ref column is carried onto the probe row.
    """
    ref_cols = [c for c in refs.columns if c not in (on, time_col)]
    overlap = set(ref_cols) & set(probes.columns)
    if overlap:
        raise ValueError(f"probe/ref column collision: {sorted(overlap)}")
    u = (
        refs.withColumn("_is_probe", F.lit(0))
        .unionByName(probes.withColumn("_is_probe", F.lit(1)), allowMissingColumns=True)
    )
    # Refs sort before probes at equal time ⇒ inclusive (<=) match; among
    # refs at equal time the LAST in (tiebreak asc) order wins ⇒ max tiebreak.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(time_col).asc(), F.col("_is_probe").asc(), F.col(tiebreak).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # ONE struct carries the whole winning ref row: per-column
    # last(ignorenulls) would back-fill a NULL attribute of the winning ref
    # from an OLDER ref, producing a mixed row no actual ref ever held.
    # The struct itself is NULL only on probe rows, so ignorenulls skips
    # probes but keeps the winning ref's interior NULLs.
    ref_struct = F.when(
        F.col("_is_probe") == 0, F.struct(*[F.col(c) for c in ref_cols])
    )
    carried = F.last(ref_struct, ignorenulls=True).over(w).alias("_ref")
    n_prior = F.sum(1 - F.col("_is_probe")).over(w).alias(n_prior_alias)
    return (
        u.select(*probes.columns, "_is_probe", carried, n_prior)
        .filter(F.col("_is_probe") == 1)
        .select(
            *probes.columns,
            *[F.col(f"_ref.{c}").alias(c) for c in ref_cols],
            n_prior_alias,
        )
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lo_sec: int,
    hi_sec: int,
) -> DataFrame:
    """Inner join of rows where ``right_time`` falls in the window
    ``(left_time + lo_sec, left_time + hi_sec]`` for the same ``on`` key.

    Bucket width = window span, so every left window intersects at most 2
    buckets: the left side is exploded 2×, the right side bucketed 1×, and
    the join is a plain equi-join on (key, bucket) — each candidate pair
    meets exactly once (a right row lives in ONE bucket), so no dedup pass
    is needed after the exact-range post-filter.
    """
    if hi_sec <= lo_sec:
        raise ValueError("hi_sec must be > lo_sec")
    from pyspark.sql.types import DateType

    left_is_date = isinstance(left.schema[left_time].dataType, DateType)
    right_is_date = isinstance(right.schema[right_time].dataType, DateType)
    if left_is_date != right_is_date:
        raise ValueError("left_time/right_time must both be DATE or both be time-like")
    if left_is_date:
        # Pure calendar-day arithmetic (unix_date): a date→timestamp cast
        # would go through the session timezone, whose UTC offset can
        # differ across a DST transition — the fixed-width second window
        # would then diverge from the calendar interval the caller means.
        if lo_sec % 86_400 or hi_sec % 86_400:
            raise ValueError("DATE inputs need whole-day lo_sec/hi_sec")
        lo_u, hi_u = lo_sec // 86_400, hi_sec // 86_400
        lt = F.unix_date(F.col(left_time)).cast("long")
        rt = F.unix_date(F.col(right_time)).cast("long")
    else:
        # cast("timestamp") lifts NTZ columns to LTZ for unix_micros; any
        # session-timezone shift is identical on both sides, so the bucket
        # ids and the range predicate (pure differences) are unaffected.
        lo_u, hi_u = lo_sec * 1_000_000, hi_sec * 1_000_000
        lt = F.unix_micros(F.col(left_time).cast("timestamp"))
        rt = F.unix_micros(F.col(right_time).cast("timestamp"))
    width = hi_u - lo_u
    first_bucket = F.floor((lt + lo_u) / width).cast("long")
    l = left.withColumn("_b", F.explode(F.array(first_bucket, first_bucket + 1)))
    r = right.withColumn("_b", F.floor(rt / width).cast("long"))
    return (
        l.join(r, [on, "_b"])
        .filter((rt > lt + lo_u) & (rt <= lt + hi_u))
        .drop("_b")
    )
