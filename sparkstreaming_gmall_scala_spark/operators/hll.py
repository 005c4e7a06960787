"""HLL sketch columns: persistable, mergeable cardinality indexes.

``dau`` counts distinct users exactly (one shuffle of user ids per
query window); ``dau_approx`` estimates one window with
approx_count_distinct. This module keeps the SKETCH ITSELF as data
(Spark's Datasketches HllSketch binary column): build tiny per-day
sketches ONCE, then answer any distinct-count window — rolling MAU,
arbitrary date ranges, per-segment reach — by unioning sketch bytes,
never rescanning the events table. At 100 TB that's the difference
between a dashboard query over a few-KB-per-day sketch table and a
daily full-log shuffle.

HLL union is lossless for a fixed lgK (register-wise max), so
sub-sketches built per micro-batch and unioned equal the one-shot
sketch — the monoid property the streaming form (streaming/hll.py)
leans on, same as CMS/histogram/OHLC partials.

No DuckDB oracle: DuckDB's approx_count_distinct is a different HLL
implementation, so these entries carry pytest error-bound and
exact-equality-of-merge pins instead (the rows-only gate class, like
the IVF probes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def daily_sketches(
    events: DataFrame, key: str = "user_id", ts: str = "ts", lgk: int = 12
) -> DataFrame:
    """(day, sketch): one HllSketch per UTC day — the materialized
    cardinality index. One partial-aggregated shuffle on day; output is
    days x ~2^lgk bytes."""
    return (
        events.select(F.to_date(ts).alias("day"), F.col(key))
        .groupBy("day")
        .agg(F.hll_sketch_agg(key, F.lit(lgk)).alias("sketch"))
    )


def estimate_daily(sketches: DataFrame) -> DataFrame:
    """(day, n_users): per-day distinct estimates straight off the
    index."""
    return sketches.select(
        "day", F.hll_sketch_estimate("sketch").alias("n_users")
    )


def rolling_distinct(
    sketches: DataFrame, window_days: int = 30
) -> DataFrame:
    """(day, n_users): distinct keys over the trailing ``window_days``
    ending at each day — rolling MAU from daily sketches. The
    day-to-covered-day expansion is a broadcast range join over the
    (tiny) sketch table against its own day list: |days| x window rows,
    then one hll_union_agg per day. The events table is never
    touched."""
    days = sketches.select(F.col("day").alias("anchor"))
    cond = (
        (sketches["day"] <= days["anchor"])
        & (sketches["day"] > F.date_sub(days["anchor"], window_days))
    )
    return (
        days.join(F.broadcast(sketches), cond)
        .groupBy("anchor")
        .agg(F.hll_union_agg("sketch").alias("u"))
        .select(
            F.col("anchor").alias("day"),
            F.hll_sketch_estimate("u").alias("n_users"),
        )
    )


def merge_sketch_tables(*tables: DataFrame) -> DataFrame:
    """Union per-day sketch tables built over disjoint (or replayed)
    row subsets into one index: register-wise max per day."""
    it = iter(tables)
    acc = next(it)
    for t in it:
        acc = acc.unionByName(t)
    return acc.groupBy("day").agg(F.hll_union_agg("sketch").alias("sketch"))
