"""Unit tests for the as-of and bucketed range joins (operators/temporal.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_inclusive_ties_and_missing(spark):
    probes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100),  # ref at the same instant → match
            (1, _ts("2024-01-01 09:00:00"), 101),  # before every ref → nulls
            (2, _ts("2024-01-01 12:00:00"), 102),  # two refs tie on ts → max ref_id
            (3, _ts("2024-01-01 12:00:00"), 103),  # key with no refs at all
        ],
        ["k", "t", "probe_id"],
    )
    refs = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 7, "a"),
            (2, _ts("2024-01-01 11:00:00"), 8, "b"),
            (2, _ts("2024-01-01 11:00:00"), 9, "c"),
        ],
        ["k", "t", "ref_id", "payload"],
    )
    out = {
        r["probe_id"]: r
        for r in asof_join(probes, refs, on="k", time_col="t", tiebreak="ref_id").collect()
    }
    assert out[100]["ref_id"] == 7 and out[100]["n_prior"] == 1  # <= is inclusive
    assert out[101]["ref_id"] is None and out[101]["n_prior"] == 0
    assert out[102]["ref_id"] == 9 and out[102]["payload"] == "c"  # tie → max ref_id
    assert out[102]["n_prior"] == 2
    assert out[103]["ref_id"] is None and out[103]["n_prior"] == 0


def test_asof_rejects_column_collision(spark):
    df = spark.createDataFrame([(1, _ts("2024-01-01"), 1)], ["k", "t", "x"])
    import pytest

    with pytest.raises(ValueError, match="collision"):
        asof_join(df, df, on="k", time_col="t", tiebreak="x")


def test_range_join_boundaries_and_bucket_crossing(spark):
    t0 = _ts("2024-01-01 00:00:00")
    left = spark.createDataFrame([(1, t0, 10)], ["k", "lt", "left_id"])
    right = spark.createDataFrame(
        [
            (1, t0, 20),  # rt == lt → excluded (strict lower bound)
            (1, t0 + dt.timedelta(seconds=3600), 21),  # inside
            (1, t0 + dt.timedelta(seconds=7200), 22),  # rt == lt+hi → included
            (1, t0 + dt.timedelta(seconds=7201), 23),  # just past → excluded
            (2, t0 + dt.timedelta(seconds=100), 24),  # other key → excluded
        ],
        ["k", "rt", "right_id"],
    )
    got = {
        r["right_id"]
        for r in range_join_bucketed(
            left, right, on="k", left_time="lt", right_time="rt",
            lo_sec=0, hi_sec=7200,
        ).collect()
    }
    assert got == {21, 22}


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    # windows that straddle a bucket boundary must yield each pair ONCE
    t0 = _ts("2024-01-01 00:30:00")
    left = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=i), i) for i in range(0, 180, 7)],
        ["k", "lt", "left_id"],
    )
    right = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=i), 1000 + i) for i in range(0, 180, 5)],
        ["k", "rt", "right_id"],
    )
    out = range_join_bucketed(
        left, right, on="k", left_time="lt", right_time="rt",
        lo_sec=0, hi_sec=3600,
    )
    rows = [(r["left_id"], r["right_id"]) for r in out.collect()]
    assert len(rows) == len(set(rows))  # exactly-once per qualifying pair
    # and matches the naive quadratic definition
    lts = {r["left_id"]: r["lt"] for r in left.collect()}
    rts = {r["right_id"]: r["rt"] for r in right.collect()}
    naive = {
        (li, ri)
        for li, lt in lts.items()
        for ri, rt in rts.items()
        if lt < rt <= lt + dt.timedelta(seconds=3600)
    }
    assert set(rows) == naive


def test_range_join_plan_is_hash_join_not_nested_loop(spark):
    t0 = _ts("2024-01-01 00:00:00")
    left = spark.createDataFrame([(1, t0, 1)], ["k", "lt", "left_id"])
    right = spark.createDataFrame([(1, t0, 2)], ["k", "rt", "right_id"])
    plan = (
        range_join_bucketed(
            left, right, on="k", left_time="lt", right_time="rt",
            lo_sec=0, hi_sec=60,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_asof_join_matches_bruteforce_on_random_inputs(spark):
    """Seeded-random probes/refs vs the quadratic reference definition:
    for each probe, the ref with max (t, ref_id) among t <= probe.t."""
    import random

    rng = random.Random(42)
    probes = [
        (rng.randrange(4), _ts(f"2024-01-01 00:00:{rng.randrange(60):02d}"), i)
        for i in range(60)
    ]
    refs = [
        (rng.randrange(4), _ts(f"2024-01-01 00:00:{rng.randrange(60):02d}"), 1000 + i)
        for i in range(40)
    ]
    pdf = spark.createDataFrame(probes, ["k", "t", "probe_id"])
    rdf = spark.createDataFrame(refs, ["k", "t", "ref_id"])
    got = {
        r["probe_id"]: (r["ref_id"], r["n_prior"])
        for r in asof_join(pdf, rdf, on="k", time_col="t", tiebreak="ref_id").collect()
    }
    assert set(got) == {p[2] for p in probes}
    for k, t, pid in probes:
        eligible = [(rt, rid) for rk, rt, rid in refs if rk == k and rt <= t]
        want = max(eligible)[1] if eligible else None
        assert got[pid] == (want, len(eligible)), (pid, k, t)


def test_asof_winning_ref_nulls_kept_wholesale(spark):
    """The winning ref row is carried as ONE struct: its NULL attributes
    stay NULL instead of being back-filled from an older ref (per-column
    last(ignorenulls) would produce a mixed row no ref ever held)."""
    probes = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00"), 100)], ["k", "t", "probe_id"]
    )
    refs = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 7, "older"),
            (1, _ts("2024-01-01 11:00:00"), 8, None),  # winner, NULL payload
        ],
        ["k", "t", "ref_id", "payload"],
    )
    [row] = asof_join(probes, refs, on="k", time_col="t", tiebreak="ref_id").collect()
    assert row["ref_id"] == 8
    assert row["payload"] is None  # NOT "older"
    assert row["n_prior"] == 2


def test_range_join_date_inputs_use_day_arithmetic(spark):
    """DATE inputs join on calendar-day arithmetic (unix_date), immune to
    session-timezone DST offsets; sub-day windows on DATEs are rejected."""
    import pytest

    d = dt.date
    left = spark.createDataFrame([(1, d(2024, 3, 1), 10)], ["k", "ld", "left_id"])
    right = spark.createDataFrame(
        [
            (1, d(2024, 3, 1), 20),   # same day → excluded (strict lower)
            (1, d(2024, 3, 15), 21),  # inside (DST transition mid-window in
            (1, d(2024, 3, 31), 22),  # most US/EU zones) → both included
            (1, d(2024, 4, 1), 23),   # day 31 → excluded
        ],
        ["k", "rd", "right_id"],
    )
    got = {
        r["right_id"]
        for r in range_join_bucketed(
            left, right, on="k", left_time="ld", right_time="rd",
            lo_sec=0, hi_sec=30 * 86400,
        ).collect()
    }
    assert got == {21, 22}
    with pytest.raises(ValueError, match="whole-day"):
        range_join_bucketed(
            left, right, on="k", left_time="ld", right_time="rd",
            lo_sec=0, hi_sec=3600,
        )
    with pytest.raises(ValueError, match="both"):
        range_join_bucketed(
            left,
            right.withColumn("rd", F.col("rd").cast("timestamp")),
            on="k", left_time="ld", right_time="rd", lo_sec=0, hi_sec=86400,
        )


# ---------------------------------------------------------------------------
# interval_overlap_join (round 9)
# ---------------------------------------------------------------------------


def test_interval_overlap_half_open_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
        ],
        ["lid", "ls", "le"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:30:00"), _ts("2024-01-01 10:40:00")),  # inside
            (2, _ts("2024-01-01 09:00:00"), _ts("2024-01-01 10:00:00")),  # touches start
            (3, _ts("2024-01-01 11:00:00"), _ts("2024-01-01 12:00:00")),  # touches end
            (4, _ts("2024-01-01 09:30:00"), _ts("2024-01-01 12:30:00")),  # contains
            (5, _ts("2024-01-01 10:59:59"), _ts("2024-01-01 10:59:59")),  # empty
            (6, _ts("2024-01-01 10:50:00"), _ts("2024-01-01 11:10:00")),  # straddles end
        ],
        ["rid", "rs", "re_"],
    )
    from sparkstreaming_gmall_scala_spark.operators.temporal import (
        interval_overlap_join,
    )

    got = sorted(
        r["rid"]
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re_", bucket_sec=600
        ).collect()
    )
    # half-open: touching endpoints (2, 3) and empty intervals (5) excluded
    assert got == [1, 4, 6]


def test_interval_overlap_meet_once_and_matches_bruteforce(spark):
    import random

    rng = random.Random(90)
    base = int(_ts("2024-05-01 00:00:00").timestamp())

    def mk(n, tag):
        rows = []
        for i in range(n):
            s = base + rng.randint(0, 40_000)
            e = s + rng.randint(-100, 8_000)  # some empty/negative
            rows.append(
                (
                    tag * 1000 + i,
                    dt.datetime.fromtimestamp(s),
                    dt.datetime.fromtimestamp(e),
                )
            )
        return rows

    left = spark.createDataFrame(mk(120, 1), ["lid", "ls", "le"])
    right = spark.createDataFrame(mk(120, 2), ["rid", "rs", "re_"])
    from sparkstreaming_gmall_scala_spark.operators.temporal import (
        interval_overlap_join,
    )

    got = [
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re_", bucket_sec=900
        ).collect()
    ]
    # meet-once: no pair emitted twice even when intervals share many buckets
    assert len(got) == len(set(got))
    lrows = left.collect()
    rrows = right.collect()
    expect = {
        (lr["lid"], rr["rid"])
        for lr in lrows
        for rr in rrows
        if lr["ls"] < lr["le"]  # empty intervals overlap nothing
        and rr["rs"] < rr["re_"]
        and lr["ls"] < rr["re_"]
        and rr["rs"] < lr["le"]
    }
    assert set(got) == expect and len(expect) > 50


def test_interval_overlap_plan_is_hash_join(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        ["lid", "ls", "le"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:30:00"), _ts("2024-01-01 10:40:00"))],
        ["rid", "rs", "re_"],
    )
    from sparkstreaming_gmall_scala_spark.operators.temporal import (
        interval_overlap_join,
    )

    plan = (
        interval_overlap_join(left, right, "ls", "le", "rs", "re_", bucket_sec=600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_rejects_bad_bucket(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, _ts("2024-01-01"), _ts("2024-01-02"))], ["i", "s", "e"]
    )
    from sparkstreaming_gmall_scala_spark.operators.temporal import (
        interval_overlap_join,
    )

    with pytest.raises(ValueError, match="bucket_sec"):
        interval_overlap_join(df, df, "s", "e", "s", "e", bucket_sec=0)


# ---------------------------------------------------------------------------
# concurrency_sweep (round 9)
# ---------------------------------------------------------------------------


def test_concurrency_sweep_matches_bruteforce(spark):
    import random

    rng = random.Random(91)
    base = _ts("2024-06-01 00:00:00")
    rows = []
    for i in range(300):
        s = base + dt.timedelta(seconds=rng.randint(0, 5 * 86400))
        e = s + dt.timedelta(seconds=rng.randint(-60, 90_000))  # some empty
        rows.append((i, s, e))
    df = spark.createDataFrame(rows, ["i", "s", "e"])
    from sparkstreaming_gmall_scala_spark.operators.temporal import (
        concurrency_sweep,
    )

    got = {
        r["bucket_start"]: r["max_active"]
        for r in concurrency_sweep(df, "s", "e", "day").collect()
    }
    # brute force: walk the STEP FUNCTION (level between consecutive
    # boundaries), not just the levels AT boundaries — the carried-in
    # level before a day's first boundary and boundary-free days covered
    # by live intervals both count (round-9 advice fix)
    events = []
    for _, s, e in rows:
        if e > s:
            events.append((s, 1))
            events.append((e, -1))
    by_t = {}
    for t, d in events:
        by_t[t] = by_t.get(t, 0) + d
    ts = sorted(by_t)
    day_of = lambda t: t.replace(hour=0, minute=0, second=0, microsecond=0)
    boundary_days = {day_of(t) for t in ts}
    # segments (a, b, level): leading zero-level segment clipped to its
    # day, then [t_i, t_{i+1}) at the post-t_i level, then the final
    # zero-level instant at the last boundary
    segs, active = [], 0
    if ts and ts[0] > day_of(ts[0]):
        segs.append((day_of(ts[0]), ts[0], 0))
    for i, t in enumerate(ts):
        active += by_t[t]
        nxt = ts[i + 1] if i + 1 < len(ts) else t + dt.timedelta(microseconds=1)
        segs.append((t, nxt, active))
    expect = {}
    one_day = dt.timedelta(days=1)
    for a, b, lvl in segs:
        day = day_of(a)
        while day < b:
            if day in boundary_days or lvl > 0:
                expect[day] = max(expect.get(day, lvl), lvl)
            day = day + one_day
    assert got == expect
    # intervals span day borders, so some day's max must exceed its own
    # net delta — proof the carry-in offset path is exercised
    assert any(v > 0 for v in got.values())


def test_concurrency_sweep_half_open_and_cross_bucket_carry(spark):
    # two sessions: one covers all of day 1 and half of day 2 (carry-in
    # of +1 into day 2); the second starts exactly when the third ends
    # (half-open: never concurrent with it)
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 12:00:00")),
            (2, _ts("2024-01-02 06:00:00"), _ts("2024-01-02 08:00:00")),
            (3, _ts("2024-01-02 08:00:00"), _ts("2024-01-02 09:00:00")),
        ],
        ["i", "s", "e"],
    )
    from sparkstreaming_gmall_scala_spark.operators.temporal import (
        concurrency_sweep,
    )

    got = {
        r["bucket_start"]: r["max_active"]
        for r in concurrency_sweep(df, "s", "e", "day").collect()
    }
    # day 2 has no +1 carry row of its own for session 1 (it started on
    # day 1): peak 2 = carried session 1 + session 2; never 3 (half-open)
    assert got[_ts("2024-01-01 00:00:00")] == 1
    assert got[_ts("2024-01-02 00:00:00")] == 2


def test_concurrency_sweep_carry_level_and_gap_days(spark):
    # round-9 advice corners: (A) a day whose only boundaries are ENDS
    # peaks at the carried-in level, not level-1; (B) boundary-free days
    # fully covered by a live interval emit carry rows; (C) a boundary
    # exactly at midnight does NOT admit the carried level (it holds for
    # an empty interval); (D) zero-level gap days emit nothing.
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), _ts("2024-01-05 10:00:00")),
            (2, _ts("2024-01-04 23:00:00"), _ts("2024-01-05 06:00:00")),
            (3, _ts("2024-01-07 00:00:00"), _ts("2024-01-08 00:00:00")),
        ],
        ["i", "s", "e"],
    )
    from sparkstreaming_gmall_scala_spark.operators.temporal import (
        concurrency_sweep,
    )

    got = {
        r["bucket_start"]: r["max_active"]
        for r in concurrency_sweep(df, "s", "e", "day").collect()
    }
    assert got == {
        _ts("2024-01-01 00:00:00"): 1,  # boundary day, start at 10:00
        _ts("2024-01-02 00:00:00"): 1,  # (B) gap day, carried level 1
        _ts("2024-01-03 00:00:00"): 1,  # (B) gap day
        _ts("2024-01-04 00:00:00"): 2,  # session 2 starts at 23:00
        _ts("2024-01-05 00:00:00"): 2,  # (A) ends only — peak = carry 2
        # Jan 6: zero-level gap day — no row (D)
        _ts("2024-01-07 00:00:00"): 1,  # (C) +1 exactly at midnight
        _ts("2024-01-08 00:00:00"): 0,  # -1 at midnight: level 0 all day
    }


# ---------------------------------------------------------------------------
# time_weighted_avg (round 9)
# ---------------------------------------------------------------------------


def test_twap_clips_at_midnight_and_time_weights(spark):
    from sparkstreaming_gmall_scala_spark.operators.temporal import (
        time_weighted_avg,
    )

    # user 1: level 10.0 holds 18:00..23:00 (5h), level 50.0 holds
    # 23:00..01:00 (1h on day1, 1h on day2); final event at 01:00 is
    # open-ended -> dropped
    df = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01 18:00:00"), 10.0),
            (2, 1, _ts("2024-01-01 23:00:00"), 50.0),
            (3, 1, _ts("2024-01-02 01:00:00"), 99.0),
        ],
        ["eid", "uid", "t", "v"],
    )
    got = {
        r["bucket_start"]: (r["twap6"], r["dur_us"])
        for r in time_weighted_avg(df, "uid", "t", "v", "eid").collect()
    }
    # day1: (10*5h + 50*1h)/6h = 100/6 — NOT the count-weighted avg 30
    day1 = got[_ts("2024-01-01 00:00:00")]
    assert day1 == (round(100 / 6 * 1e6), 6 * 3600 * 1_000_000)
    # day2: only the 50-level's 1h spill-over
    assert got[_ts("2024-01-02 00:00:00")] == (50_000_000, 3600 * 1_000_000)


def test_twap_duplicate_timestamps_tiebreak_deterministic(spark):
    from sparkstreaming_gmall_scala_spark.operators.temporal import (
        time_weighted_avg,
    )

    # two observations at the SAME instant: eid order decides the carry
    # (eid=5's level is replaced instantly, zero-duration -> dropped)
    df = spark.createDataFrame(
        [
            (5, 1, _ts("2024-03-01 00:00:00"), 100.0),
            (6, 1, _ts("2024-03-01 00:00:00"), 20.0),
            (7, 1, _ts("2024-03-01 06:00:00"), 0.0),
        ],
        ["eid", "uid", "t", "v"],
    )
    got = {
        r["bucket_start"]: r["twap6"]
        for r in time_weighted_avg(df, "uid", "t", "v", "eid").collect()
    }
    assert got == {_ts("2024-03-01 00:00:00"): 20_000_000}


def test_nearest_join_tie_rules_and_tolerance(spark):
    from sparkstreaming_gmall_scala_spark.operators.temporal import nearest_join

    probes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00")),  # ref at exact ts → dist 0, prev
            (2, _ts("2024-01-01 10:00:00")),  # equidistant ±60s → prev wins
            (3, _ts("2024-01-01 10:00:00")),  # forward-only match
            (4, _ts("2024-01-01 10:00:00")),  # nothing within tolerance
            (5, _ts("2024-01-01 10:00:00")),  # two refs at equal prev ts → max rid
        ],
        ["user_id", "ts"],
    )
    refs = spark.createDataFrame(
        [
            (10, 1, _ts("2024-01-01 10:00:00")),
            (11, 1, _ts("2024-01-01 09:00:00")),
            (20, 2, _ts("2024-01-01 09:59:00")),
            (21, 2, _ts("2024-01-01 10:01:00")),
            (30, 3, _ts("2024-01-01 10:05:00")),
            (40, 4, _ts("2024-01-01 13:00:00")),  # 3 h away > 1 h tolerance
            (50, 5, _ts("2024-01-01 09:30:00")),
            (51, 5, _ts("2024-01-01 09:30:00")),
        ],
        ["event_id", "user_id", "ts"],
    )
    out = {
        r["user_id"]: (r["nearest_event_id"], r["delta_us"])
        for r in nearest_join(
            probes, refs, on="user_id", time_col="ts",
            ref_id_col="event_id", tolerance_us=3_600_000_000,
        ).collect()
    }
    assert out[1] == (10, 0)                    # inclusive backward, dist 0
    assert out[2] == (20, -60_000_000)          # tie → backward wins
    assert out[3] == (30, 300_000_000)          # forward-only
    assert 4 not in out                         # outside tolerance → dropped
    assert out[5] == (51, -1_800_000_000)       # equal-ts refs → max ref id
