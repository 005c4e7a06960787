"""Shared product-analytics aggregations: one body, two surfaces.

The batch catalog queries (``event_funnel``, ``user_retention``,
``event_ohlc`` in plans/temporal.py) and the streaming mart reports
(streaming/funnel.py, streaming/ohlc.py) must compute IDENTICAL
semantics — the streamed-equals-batch pins depend on it. Before this
module each side hand-maintained its own copy of the aggregation
(~40 lines each); a semantics tweak applied to one would silently
diverge the streamed mart from the batch query until an equality test
happened to cover the changed case. Each aggregation now lives here
once, as a pure events-frame → result-frame function both sides call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel_frame(ev: DataFrame) -> DataFrame:
    """(stage, stage_ord, n_users): strict ordered conversion — users
    with a view, users whose FIRST view is followed by a click, users
    whose first such click is followed by a purchase. Three
    aggregations all keyed on user_id (AQE reuses one exchange)."""
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .select("user_id")
        .distinct()
    )

    def stage(name: str, ord_: int, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"),
            F.lit(ord_).alias("stage_ord"),
            "n_users",
        )

    return (
        stage("view", 1, v)
        .unionByName(stage("click_after_view", 2, c))
        .unionByName(stage("purchase_after_click", 3, p))
    )


def retention_frame(ev: DataFrame) -> DataFrame:
    """(cohort_day, day_offset, n_users): first-activity-day cohorts ×
    activity-day offsets (UTC day boundaries — sessions pin UTC)."""
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    cohort = act.groupBy("user_id").agg(F.min("day").alias("c0"))
    return (
        act.join(cohort, "user_id")
        .groupBy(
            F.date_format("c0", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "c0").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def ohlc_ord_key() -> F.Column:
    """The OHLC total order: zero-padded epoch-micros ∥ event_id — the
    same string both the batch query ranks by and the streaming partial
    bars arg-min/arg-max over (first/last are associative only under a
    shared total order)."""
    return F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 10, "0"),
    )


def ohlc_frame(ev: DataFrame, event_type: str = "purchase") -> DataFrame:
    """(hour_us, open, high, low, close, n_events): hourly OHLC bars via
    min_by/max_by on the shared order key — one partial-aggregated
    groupBy, no window, no sort."""
    return (
        ev.filter(F.col("event_type") == event_type)
        .select(
            F.date_trunc("hour", "ts").alias("hour"),
            "value",
            ohlc_ord_key().alias("ord"),
        )
        .groupBy("hour")
        .agg(
            F.expr("min_by(value, ord)").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.expr("max_by(value, ord)").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.unix_micros("hour").alias("hour_us"),
            "open", "high", "low", "close", "n_events",
        )
    )


def rolling_distinct_users(
    ev: DataFrame, days: int = 7, user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """EXACT trailing-``days`` distinct users per active day (rolling
    DAU/WAU/MAU) — the window-distinct aggregation Spark has no native
    frame for (COUNT(DISTINCT) OVER RANGE is unsupported).

    Scale shape: the firehose collapses to distinct (user, day) first
    (active-user-days — orders of magnitude below events), each of
    those explodes into only the ``days`` windows it can serve, and one
    (window_day, user) distinct + count finishes it. Two shuffles total,
    both on dimension-bounded keys; no global sort, no per-day rescan of
    the events table — the day-exploded twin of the HLL sketch-mart's
    rolling_mau (operators/hll.py), exact instead of approximate. Only
    days that actually appear in the data are reported (a trailing
    window ending on a dead day has no dashboard row to serve)."""
    ud = ev.select(
        F.col(user_col).alias("u"), F.to_date(ts_col).alias("d")
    ).distinct()
    return rolling_distinct_from_user_days(ud, days)


def rolling_distinct_from_user_days(ud: DataFrame, days: int) -> DataFrame:
    """The rolling-distinct core over a (u, d) activity frame — shared by
    the batch query (which derives it from the firehose) and the
    streaming mart (which reads it from the append-only activity index,
    where replays may leave duplicate rows: the distincts here absorb
    them by contract)."""
    served = ud.select(
        "u",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), days - 1)
            )
        ).alias("w"),
    ).distinct()
    observed = ud.select(F.col("d").alias("w")).distinct()
    return (
        served.join(observed, "w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias(f"dau_{days}d"))
        .select(
            F.date_format("w", "yyyy-MM-dd").alias("day"),
            f"dau_{days}d",
        )
    )


def top_paths_frame(ev: DataFrame, steps: int = 3, top_n: int = 25) -> DataFrame:
    """Most frequent ``steps``-long consecutive event-type paths across
    user journeys (path mining): per user, events ordered by (ts,
    event_id), each window of ``steps`` consecutive types is one path
    occurrence. One (user) window shuffle + one path aggregate;
    TakeOrderedAndProject serves the top-k — never a global sort."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cols = [F.col("event_type")] + [
        F.lead("event_type", i).over(w) for i in range(1, steps)
    ]
    paths = ev.select(F.concat_ws(">", *cols).alias("path"),
                      *[c.alias(f"_s{i}") for i, c in enumerate(cols)])
    complete = paths.filter(
        F.lit(True) if steps == 1 else F.col(f"_s{steps-1}").isNotNull()
    )
    return (
        complete.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(top_n)
    )
