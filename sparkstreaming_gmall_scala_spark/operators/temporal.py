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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_sec: int,
) -> DataFrame:
    """Inner join of interval PAIRS that overlap — half-open semantics:
    ``l_start < r_end AND r_start < l_end`` (touching endpoints do not
    overlap). The missing join shape next to asof_join (point->last
    event) and range_join_bucketed (point-in-shifted-window, shared equi
    key): here BOTH sides are intervals and there is NO shared key, so
    a naive formulation is a cartesian with a residual predicate.

    Scale shape: each side explodes into the fixed-width time buckets
    its interval touches (``sequence`` over floor(start/w) ..
    floor((end-1us)/w)), the join is a plain equi-join on the bucket id,
    and the exact predicate re-checks overlap. A pair sharing several
    buckets would meet several times, so the MEET-ONCE guard keeps a
    pair only in the first bucket both touch (the later of the two
    interval start-buckets) — candidates are emitted exactly once and no
    post-join distinct shuffle is needed. Pick ``bucket_sec`` near the
    typical interval length: explosion factor is ~len/bucket_sec + 1 per
    row, while too-wide buckets put unrelated intervals in one bucket
    (candidate bloat). Empty/negative intervals (end <= start) join
    nothing, matching the half-open semantics.
    """
    if bucket_sec <= 0:
        raise ValueError("bucket_sec must be > 0")
    w = bucket_sec * 1_000_000

    def us(col: str) -> F.Column:
        return F.unix_micros(F.col(col).cast("timestamp"))

    # micros + first-bucket materialize per side BEFORE the join so the
    # residual predicate references unambiguous columns even when both
    # inputs share column names
    # empty/negative intervals drop BEFORE the explode: [a, a) overlaps
    # nothing, but the pairwise predicate below can't see that (10:00 <
    # a AND a < 11:00 holds for a point inside the other interval) — and
    # pre-filtering is the cheaper plan anyway (nothing junk explodes)
    l = (
        left.withColumn("_ls", us(left_start))
        .withColumn("_le", us(left_end))
        .filter(F.col("_ls") < F.col("_le"))
        .withColumn("_lb0", F.floor(F.col("_ls") / w))
        .withColumn(
            "_b",
            F.explode(
                F.sequence(F.col("_lb0"), F.floor((F.col("_le") - 1) / w))
            ),
        )
    )
    r = (
        right.withColumn("_rs", us(right_start))
        .withColumn("_re", us(right_end))
        .filter(F.col("_rs") < F.col("_re"))
        .withColumn("_rb0", F.floor(F.col("_rs") / w))
        .withColumn(
            "_b",
            F.explode(
                F.sequence(F.col("_rb0"), F.floor((F.col("_re") - 1) / w))
            ),
        )
    )
    return (
        l.join(r, "_b")
        .filter(
            (F.col("_ls") < F.col("_re"))
            & (F.col("_rs") < F.col("_le"))
            & (F.col("_b") == F.greatest(F.col("_lb0"), F.col("_rb0")))
        )
        .drop("_b", "_lb0", "_rb0", "_ls", "_le", "_rs", "_re")
    )


def concurrency_sweep(
    df: DataFrame,
    start_col: str,
    end_col: str,
    grain: str = "day",
) -> DataFrame:
    """(bucket_start, max_active) per time bucket: the interval-stabbing
    sweep — +1 at each interval start, -1 at its (exclusive) end, and
    the running sum IS the number of concurrently-active intervals. The
    global ordered prefix sum is computed the distributed way (a single
    global window would move everything to one task): (1) deltas sum per
    exact timestamp (kills intra-timestamp order ambiguity), (2) prefix
    sums WITHIN each time bucket under a bucket-partitioned window,
    (3) per-bucket totals — one tiny row per bucket — prefix-summed and
    broadcast back as each bucket's carry-in offset. Exact concurrency
    at every instant, no single-partition stage, intervals spanning
    bucket borders carried correctly by the offset.

    Half-open [start, end): a session ending exactly when another starts
    does not overlap it. ``grain`` ∈ {'hour', 'day', 'week'} (fixed-width
    units, so gap buckets can be enumerated with F.sequence).

    Two boundary-free corners (round-9 advice): (1) the carried-in level
    ``off`` holds on [bucket_start, first_in-bucket_boundary) and is a
    max candidate whenever that interval is non-empty — a day where
    long-lived sessions only END peaks at ``off``, not ``off-1``; when
    the first boundary lands exactly on the bucket start the interval is
    empty and ``off`` is NOT attained. (2) buckets containing no
    boundary at all but covered by live intervals emit a carry row
    (bucket, level) — enumerated from the tiny per-bucket totals frame,
    never the firehose.

    The input is scanned ONCE: each interval explodes into its two
    boundary deltas in a single pass (a union of two selects would scan
    — and at 100 TB re-sessionize — the source twice), and the reduced
    boundary index (one row per distinct timestamp, tiny next to the
    input) is persisted+counted before the three-consumer fan-out
    (local prefix / per-bucket totals / final join) so the upstream
    lineage never recomputes per consumer."""
    s = F.unix_micros(F.col(start_col).cast("timestamp"))
    e = F.unix_micros(F.col(end_col).cast("timestamp"))
    deltas = (
        df.filter(e > s)
        .select(
            F.explode(
                F.array(
                    F.struct(s.alias("t"), F.lit(1).alias("d")),
                    F.struct(e.alias("t"), F.lit(-1).alias("d")),
                )
            ).alias("x")
        )
        .select("x.t", "x.d")
        .groupBy("t")
        .agg(F.sum("d").alias("d"))
        .persist()
    )
    deltas.count()  # materialize BEFORE the fan-out (graph.py discipline)
    _step = {"hour": "1 hour", "day": "1 day", "week": "7 days"}
    if grain not in _step:
        raise ValueError(f"grain must be one of {sorted(_step)}, got {grain!r}")
    bucket = F.date_trunc(grain, F.timestamp_micros(F.col("t")))
    wb = (
        Window.partitionBy("b")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = deltas.withColumn("b", bucket).withColumn(
        "run", F.sum("d").over(wb)
    )
    totals = local.groupBy("b").agg(F.sum("d").alias("tot"))
    wo = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )  # tiny: one row per bucket — the only global window, bounded
    offsets = totals.withColumn(
        "off", F.coalesce(F.sum("tot").over(wo), F.lit(0))
    ).select("b", "tot", "off")
    per_bucket = (
        local.join(F.broadcast(offsets.select("b", "off")), "b")
        .groupBy("b")
        .agg(
            F.max(F.col("run") + F.col("off")).alias("_m"),
            F.min("t").alias("_mt"),
            F.first("off").alias("_off"),
        )
        .select(
            F.col("b").alias("bucket_start"),
            F.when(
                F.col("_mt") > F.unix_micros(F.col("b")),
                F.greatest(F.col("_m"), F.col("_off")),
            )
            .otherwise(F.col("_m"))
            .alias("max_active"),
        )
    )
    step = F.expr(f"interval {_step[grain]}")
    gaps = (
        offsets.withColumn("lvl_end", F.col("off") + F.col("tot"))
        .withColumn("next_b", F.lead("b").over(Window.orderBy("b")))
        .filter(
            (F.col("lvl_end") > 0)
            & F.col("next_b").isNotNull()
            & (F.col("next_b") > F.col("b") + step)
        )
        .select(
            F.explode(
                F.sequence(F.col("b") + step, F.col("next_b") - step, step)
            ).alias("bucket_start"),
            F.col("lvl_end").alias("max_active"),
        )
    )
    return per_bucket.unionByName(gaps)


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket_sec: int = 86400,
) -> DataFrame:
    """(key, bucket_start, twap6, dur_us): time-weighted average of a
    last-observation-carried-forward level per key per fixed bucket —
    the TWAP/sensor-rollup aggregate a plain avg() gets wrong (it
    weights by OBSERVATION COUNT; a level that held for six hours
    counts the same as one that held a second).

    Each observation's level holds from its timestamp until the key's
    next observation (one lead() over the key partition, tiebroken for
    determinism); the final open-ended observation carries no known
    duration and is dropped (documented, matches the oracle). Segments
    explode into the buckets they touch (same bucket arithmetic as
    interval_overlap_join) and clip at bucket edges, so a level held
    across midnight weights each day exactly.

    Determinism: levels fix to 1e-6 integers; the weighted sum
    Σ level6·dur_us runs in DECIMAL(38,0) (exact, order-free — a double
    Σ would be partition-order dependent), and only the final division
    twap6 = round(Σ/Σdur) happens in doubles with one fixed tree."""
    w = bucket_sec * 1_000_000
    kwin = Window.partitionBy(key_col).orderBy("_s", tiebreak_col)
    seg = (
        df.select(
            F.col(key_col),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_s"),
            F.floor(F.col(value_col) * 1e6 + 0.5).cast("long").alias("_v6"),
            F.col(tiebreak_col),
        )
        .withColumn("_e", F.lead("_s").over(kwin))
        .filter(F.col("_e") > F.col("_s"))
    )
    clipped = (
        seg.withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(F.col("_s") / w), F.floor((F.col("_e") - 1) / w)
                )
            ),
        )
        .withColumn(
            "_dur",
            F.least(F.col("_e"), (F.col("_b") + 1) * w)
            - F.greatest(F.col("_s"), F.col("_b") * w),
        )
    )
    agg = clipped.groupBy(key_col, "_b").agg(
        F.sum(
            F.col("_v6").cast("decimal(20,0)") * F.col("_dur").cast("decimal(18,0)")
        ).alias("_wsum"),
        F.sum("_dur").alias("dur_us"),
    )
    return agg.select(
        F.col(key_col),
        F.timestamp_micros(F.col("_b") * w).alias("bucket_start"),
        F.floor(
            F.col("_wsum").cast("double") / F.col("dur_us").cast("double") + 0.5
        )
        .cast("long")
        .alias("twap6"),
        "dur_us",
    )


def nearest_join(
    probes: DataFrame,
    refs: DataFrame,
    on: str,
    time_col: str,
    ref_id_col: str,
    tolerance_us: int,
) -> DataFrame:
    """Nearest-in-time join: for each probe row, the ref row (same ``on``
    key) minimizing |ref_ts − probe_ts|, bounded by ``tolerance_us`` —
    the bidirectional extension of the backward-only ``asof_join``
    (sensor alignment, attribution to the closest touchpoint either
    side).

    Same union-and-carry shape as asof_join — one key-partitioned
    window sort, NO range self-join: the backward candidate is
    last(ref, ignorenulls) over (-∞, current], the forward candidate is
    first(ref, ignorenulls) over [current, +∞) — both frames share the
    single (ts, is_probe, ref_id) sort, so Spark pays one shuffle + one
    sort total. Semantics at equal timestamps (refs sort before
    probes): the backward frame is INCLUSIVE (a ref at the probe's
    exact ts matches at distance 0 and wins), the forward frame is
    strict. Backward wins distance ties; equal-ts ref ties go to the
    highest ref id backward / lowest forward (frame edge order) — all
    mirrored in the oracle.

    Output: every probe column + ``nearest_<ref_id_col>`` +
    ``delta_us`` (signed, ref − probe; NULL / row dropped when nothing
    lies within tolerance)."""
    p_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    u = (
        refs.select(
            F.col(on),
            p_us.alias("_us"),
            F.col(ref_id_col).alias("_rid"),
            F.lit(0).alias("_is_probe"),
        ).unionByName(
            probes.withColumn("_us", p_us)
            .withColumn("_rid", F.lit(None).cast("long"))
            .withColumn("_is_probe", F.lit(1)),
            allowMissingColumns=True,
        )
    )
    order = [F.col("_us").asc(), F.col("_is_probe").asc(), F.col("_rid").asc()]
    wp = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    ref_struct = F.when(
        F.col("_is_probe") == 0,
        F.struct(F.col("_rid").alias("rid"), F.col("_us").alias("us")),
    )
    c = u.select(
        *[x for x in u.columns if x not in ("_rid",)],
        F.last(ref_struct, ignorenulls=True).over(wp).alias("_prev"),
        F.first(ref_struct, ignorenulls=True).over(wn).alias("_next"),
    ).filter(F.col("_is_probe") == 1)
    dp = F.col("_us") - F.col("_prev.us")
    dn = F.col("_next.us") - F.col("_us")
    take_prev = F.col("_prev").isNotNull() & (
        F.col("_next").isNull() | (dp <= dn)
    )
    chosen_id = F.when(take_prev, F.col("_prev.rid")).otherwise(
        F.col("_next.rid")
    )
    delta = F.when(take_prev, -dp).otherwise(dn)
    probe_cols = [x for x in probes.columns]
    return (
        c.withColumn(f"nearest_{ref_id_col}", chosen_id)
        .withColumn("delta_us", delta)
        .filter(
            F.col(f"nearest_{ref_id_col}").isNotNull()
            & (F.abs(F.col("delta_us")) <= tolerance_us)
        )
        .select(*probe_cols, f"nearest_{ref_id_col}", "delta_us")
    )
