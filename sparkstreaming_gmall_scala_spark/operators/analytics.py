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

from pyspark.sql import DataFrame, Window, functions as F


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
    # EVERY step must be non-null, not just the last: concat_ws silently
    # skips NULLs, so a NULL event_type mid-sequence would otherwise
    # yield a shortened 'a>c' path that a null-propagating '||'
    # concatenation (the oracle's semantics) nulls out entirely.
    complete = paths
    for i in range(steps):
        complete = complete.filter(F.col(f"_s{i}").isNotNull())
    return (
        complete.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(top_n)
    )


def decile_profile(
    df: DataFrame, value_col: str, n_buckets: int = 10
) -> DataFrame:
    """Per-decile profile (n, min, max, sum) of a positive integral value
    column, with EXACT discrete boundaries and no global sort.

    Deciles are VALUE-bucketed: boundary b_k is the value at 1-based
    rank ceil(k·n/n_buckets) of the ascending ordering, and a row lands
    in the smallest bucket whose boundary covers its value — ties share
    a bucket (so bucket sizes deviate from n/10 exactly where ntile
    would split equal values arbitrarily across deciles; this is the
    deterministic choice both engines agree on).

    Scale shape: ONE scan folds the rows into a (value, cnt) histogram;
    boundaries read off the two-level cumulative histogram
    (operators/skew.py:size_histogram_cum — no window ever touches the
    row-cardinality frame), and the per-decile stats fold from the
    HISTOGRAM itself (n = Σcnt, sum = Σ value·cnt), so the fact table is
    never rescanned. Requires value >= 1 (the histogram's log2
    bucketing); the sums use DECIMAL(38,0) so cents·count never
    overflows at any scale."""
    from .skew import size_histogram_cum

    hist = (
        df.select(F.col(value_col).alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    # ONE collect answers n AND every boundary (r15 — was eager count +
    # n collect + boundary collect): for integer cum
    #   cum >= ceil(k·n/nb)  ⇔  nb·cum >= k·n
    # so the boundaries are bit-identical to the rank formulation. The
    # collect is also the persist's first consumer, filling the cache
    # the per-decile stats pass below reads.
    cum = size_histogram_cum(hist)
    # n attaches as a 1-row broadcast cross join (r16, r15 verdict #6):
    # the old F.max("cum").over(Window.partitionBy()) forced the whole
    # distinct-value histogram through ONE window partition; the 1-row
    # aggregate computes the same total in parallel and the cross join
    # reproduces the same "_n on every row" shape — boundaries
    # bit-identical (max of the running sum over positive counts IS
    # Σcnt, same nb·cum >= k·n test), still ONE collect. The broadcast
    # side aggregates the CACHED hist directly, so the two-level prefix
    # pipeline is never executed twice.
    brow = (
        cum.crossJoin(
            F.broadcast(hist.agg(F.sum("cnt").alias("_n")))
        )
        .agg(
            F.max("_n").alias("_total"),
            *[
                F.min(
                    F.when(
                        F.col("cum") * n_buckets >= F.col("_n") * k,
                        F.col("s"),
                    )
                ).alias(f"b{i}")
                for i, k in enumerate(range(1, n_buckets))
            ],
        )
        .collect()[0]
    )
    if brow["_total"] is None:
        hist.unpersist()
        return df.sparkSession.createDataFrame(
            [],
            "decile integer, n_rows long, min_value long, max_value long, "
            "sum_value long",
        )
    bounds = [int(brow[f"b{i}"]) for i in range(n_buckets - 1)]
    dec = F.lit(1)
    for b in bounds:
        dec = dec + F.when(F.lit(b) < F.col("s"), 1).otherwise(0)
    out = (
        hist.select(dec.cast("int").alias("decile"), "s", "cnt")
        .groupBy("decile")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.min("s").alias("min_value"),
            F.max("s").alias("max_value"),
            F.sum(
                (F.col("s").cast("decimal(38,0)") * F.col("cnt"))
            ).cast("long").alias("sum_value"),
        )
    )
    rows = out.collect()  # <= n_buckets rows; frees the histogram cache
    hist.unpersist()
    return df.sparkSession.createDataFrame(rows, schema=out.schema)


def spearman_rho(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """ONE-row Spearman rank correlation between two integral columns,
    exact under ties (Pearson over AVERAGE ranks, the standard tie
    treatment) and fully distributed: no row-cardinality window — each
    variable's average ranks read off its (value, cnt) HISTOGRAM
    (avg rank of value v = cum_before(v) + (cnt+1)/2, kept integral as
    r2 = 2·cum − cnt + 1), joined back by value. Moments fold as
    DECIMAL(38,0) (r2 ≈ 2n, so Σr2x·r2y ≈ 4n³ — exact to n ≈ 10^11);
    the ρ itself is one shared IEEE tree (×, ÷, sqrt — all correctly
    rounded), floored at 1e-6."""

    def r2_map(col: str) -> DataFrame:
        from .skew import size_histogram_cum

        h = df.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        # the cumulative walk runs on size_histogram_cum's TWO-LEVEL
        # prefix (per-log2-bucket windows + a <=64-row carry), so no
        # unpartitioned window ever touches the distinct-value frame —
        # it survives fact-cardinality value domains. The histogram
        # needs positive keys: shift by (1 - min), one bounded scalar
        # collect per variable.
        mn = h.agg(F.min("v").alias("m")).collect()[0]["m"]
        if mn is None:  # empty input: no ranks to map
            return df.sparkSession.createDataFrame([], "v long, r2 long")
        shifted = h.select(
            (F.col("v") - F.lit(int(mn)) + 1).alias("s"), "cnt"
        )
        return size_histogram_cum(shifted).select(
            (F.col("s") + F.lit(int(mn)) - 1).alias("v"),
            (2 * F.col("cum") - F.col("cnt") + 1).alias("r2"),
        )

    xr = r2_map(x_col).withColumnRenamed("v", "_vx").withColumnRenamed(
        "r2", "r2x"
    )
    yr = r2_map(y_col).withColumnRenamed("v", "_vy").withColumnRenamed(
        "r2", "r2y"
    )
    ranked = df.join(
        xr, df[x_col] == xr["_vx"]
    ).join(yr, df[y_col] == yr["_vy"])
    dec = "decimal(38,0)"
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("r2x").cast(dec)).alias("sx"),
        F.sum(F.col("r2y").cast(dec)).alias("sy"),
        F.sum((F.col("r2x") * F.col("r2x")).cast(dec)).alias("sxx"),
        F.sum((F.col("r2y") * F.col("r2y")).cast(dec)).alias("syy"),
        F.sum((F.col("r2x") * F.col("r2y")).cast(dec)).alias("sxy"),
    )
    n_dec = F.col("n").cast(dec)
    num = (n_dec * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (n_dec * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (n_dec * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        F.col("n").alias("n_rows"),
        # zero rank variance (a constant column) leaves rho undefined:
        # NULL, not a NaN that ANSI-mode floor/cast would throw on
        F.when(
            (dx > 0) & (dy > 0),
            F.floor(num / F.sqrt(dx * dy) * 1000000.0 + 0.5).cast("long"),
        ).alias("rho6"),
    ).where(F.col("n_rows") > 1)


def cusum_changepoint(
    daily: DataFrame, key_col: str, day_col: str, value_col: str
) -> DataFrame:
    """Per-key CUSUM change point over a (key, day, integral value)
    frame: the day k maximizing |n·prefix_k − k·S| (the cumulative
    deviation from the key's mean, scaled by n to stay in exact
    integers — no mean division until never). Ties break on the
    earliest day. One key-partitioned window pass over the DAILY frame
    (dimension × days — the facts were already folded before this is
    called); outputs (key, change_day, cusum_abs, n_days)."""
    w = Window.partitionBy(key_col).orderBy(day_col)
    wall = Window.partitionBy(key_col)
    d = daily.select(
        F.col(key_col),
        F.col(day_col),
        F.sum(value_col).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("pfx"),
        F.row_number().over(w).alias("k"),
        F.sum(value_col).over(wall).cast("decimal(38,0)").alias("s"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    dev = d.select(
        key_col,
        day_col,
        "n",
        F.abs(
            F.col("n").cast("decimal(38,0)") * F.col("pfx")
            - F.col("k") * F.col("s")
        ).alias("c"),
    )
    pick = Window.partitionBy(key_col).orderBy(
        F.col("c").desc(), F.col(day_col).asc()
    )
    return (
        dev.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select(
            key_col,
            F.col(day_col).alias("change_day"),
            # exact integer <= n_days²·max_daily — BIGINT-safe far past
            # any realistic history; the decimal above did the math
            F.col("c").cast("long").alias("cusum_abs"),
            F.col("n").alias("n_days"),
        )
    )


def value_bucket_bounds(
    df: DataFrame, value_col: str, n_buckets: int
) -> list[int]:
    """Exact value-bucket boundaries without a global sort: b_k is the
    value at 1-based rank ceil(k·n/n_buckets) of the ascending ordering
    (k = 1..n_buckets−1), read off the two-level cumulative histogram
    (the decile_profile machinery, factored out so scoring queries — RFM
    quintiles — can bucket SEVERAL metrics without ranking the
    row-cardinality frame). Requires value >= 1 (log2 bucketing).
    Returns [] on an empty frame."""
    from .skew import size_histogram_cum

    hist = (
        df.select(F.col(value_col).alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    cum = size_histogram_cum(hist)
    # ONE collect for n and every boundary (r15 — was three jobs:
    # eager hist count, n collect, boundary collect). The rank test
    # folds the ceiling away exactly: for integer cum,
    #   cum >= ceil(k·n/nb)  ⇔  nb·cum >= k·n
    # so the boundaries are bit-identical to the rank formulation.
    # 1-row broadcast cross join instead of an unpartitioned window —
    # same rationale and identical boundaries as decile_profile above
    # (the broadcast side reads the cached hist, not a second copy of
    # the prefix pipeline)
    brow = (
        cum.crossJoin(
            F.broadcast(hist.agg(F.sum("cnt").alias("_n")))
        )
        .agg(
            F.max("_n").alias("_total"),
            *[
                F.min(
                    F.when(
                        F.col("cum") * n_buckets >= F.col("_n") * k,
                        F.col("s"),
                    )
                ).alias(f"b{i}")
                for i, k in enumerate(range(1, n_buckets))
            ],
        )
        .collect()[0]
    )
    hist.unpersist()
    if brow["_total"] is None:
        return []
    return [int(brow[f"b{i}"]) for i in range(n_buckets - 1)]


def value_bucket_bounds_multi(
    df: DataFrame, value_cols: list[str], n_buckets: int
) -> dict[str, list[int]]:
    """``value_bucket_bounds`` for SEVERAL metrics of one frame in ONE
    job (r15): rfm_segments needs quintile boundaries for three metrics
    off the same cached aggregate; three separate calls are three
    driver round trips scanning the same cache. The metrics melt into
    (metric, s) rows, the two-level prefix-sum histogram machinery runs
    per metric (metric rides every partition key, so no window crosses
    metrics), and one conditional-min aggregate per metric answers all
    boundaries — bit-identical to per-metric calls by construction
    (same histogram, same nb·cum >= k·n rank test)."""
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("m"), F.col(c).alias("s")
                    )
                    for c in value_cols
                ]
            )
        ).alias("_ms")
    ).select(F.col("_ms.m").alias("m"), F.col("_ms.s").alias("s"))
    hist = (
        melted.groupBy("m", "s").agg(F.count(F.lit(1)).alias("cnt")).persist()
    )
    loc = hist.withColumn(
        "_b", F.floor(F.log2(F.col("s").cast("double"))).cast("int")
    ).withColumn(
        "_cum_in",
        F.sum("cnt").over(
            Window.partitionBy("m", "_b")
            .orderBy("s")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    btot = loc.groupBy("m", "_b").agg(F.sum("cnt").alias("_tot"))
    woff = (
        Window.partitionBy("m")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = btot.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(woff), F.lit(0))
    ).select("m", "_b", "_off")
    cum = loc.join(F.broadcast(offs), ["m", "_b"]).select(
        "m", "s", (F.col("_cum_in") + F.col("_off")).alias("cum")
    )
    n_col = F.max("cum").over(Window.partitionBy("m"))
    rows = (
        cum.withColumn("_n", n_col)
        .groupBy("m")
        .agg(
            F.max("_n").alias("_total"),
            *[
                F.min(
                    F.when(
                        F.col("cum") * n_buckets >= F.col("_n") * k,
                        F.col("s"),
                    )
                ).alias(f"b{i}")
                for i, k in enumerate(range(1, n_buckets))
            ],
        )
        .collect()
    )
    hist.unpersist()
    by_m = {r["m"]: r for r in rows}
    return {
        c: (
            [int(by_m[c][f"b{i}"]) for i in range(n_buckets - 1)]
            if c in by_m and by_m[c]["_total"] is not None
            else []
        )
        for c in value_cols
    }


def bucket_score(value, bounds: list[int]):
    """1 + number of boundaries strictly below ``value`` — the smallest
    bucket whose boundary covers the value (ties share a bucket, the
    deterministic cross-engine choice decile_profile documents)."""
    score = F.lit(1)
    for b in bounds:
        score = score + F.when(F.lit(b) < value, 1).otherwise(0)
    return score
