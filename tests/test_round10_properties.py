"""Property-based pins for the round-10 operators: each distributed
implementation is checked against a trivially-correct local reference on
arbitrary Hypothesis-generated inputs (the allocation-test discipline —
few examples, each a Spark job, but each example proves the whole
input-space contract class)."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
# r16 (r15 verdict #2 — driver pytest budget): the 3 tests whose PER-
# EXAMPLE cost is a multi-exchange Spark pipeline (~2-4 s each) run 6
# examples instead of 10; the cheap-per-example properties keep 10.
_SETTINGS_HEAVY = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- nearest_join vs brute force ------------------------------------------
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),     # key
        st.integers(min_value=0, max_value=600),   # seconds offset
    ),
    min_size=1,
    max_size=12,
)


@settings(**_SETTINGS)
@given(probes=events_strategy, refs=events_strategy)
def test_nearest_join_matches_bruteforce(spark, probes, refs):
    from sparkstreaming_gmall_scala_spark.operators.temporal import (
        nearest_join,
    )

    base = dt.datetime(2024, 1, 1)
    tol_us = 120_000_000  # 2 minutes
    p_rows = [
        (i + 1, k, base + dt.timedelta(seconds=s))
        for i, (k, s) in enumerate(probes)
    ]
    r_rows = [
        (i + 1, k, base + dt.timedelta(seconds=s))
        for i, (k, s) in enumerate(refs)
    ]
    pdf = spark.createDataFrame(p_rows, "pid long, k long, ts timestamp")
    rdf = spark.createDataFrame(r_rows, "event_id long, k long, ts timestamp")
    got = {
        r["pid"]: (r["nearest_event_id"], r["delta_us"])
        for r in nearest_join(
            pdf, rdf, on="k", time_col="ts", ref_id_col="event_id",
            tolerance_us=tol_us,
        ).collect()
    }

    # local brute force with the operator's documented tie rules
    want = {}
    for pid, pk, pts in p_rows:
        pus = int(pts.timestamp() * 1_000_000)
        cands = [
            (rid, int(rts.timestamp() * 1_000_000))
            for rid, rk, rts in r_rows
            if rk == pk
        ]
        prevs = [(u, rid) for rid, u in cands if u <= pus]
        nexts = [(u, rid) for rid, u in cands if u > pus]
        # backward: max time, then max id; forward: min time, then min id
        prev = max(prevs, key=lambda x: (x[0], x[1])) if prevs else None
        nxt = min(nexts, key=lambda x: (x[0], x[1])) if nexts else None
        pick = None
        if prev is not None and (
            nxt is None or pus - prev[0] <= nxt[0] - pus
        ):
            pick = (prev[1], prev[0] - pus)
        elif nxt is not None:
            pick = (nxt[1], nxt[0] - pus)
        if pick is not None and abs(pick[1]) <= tol_us:
            want[pid] = pick
    assert got == want


# --- decile_profile vs sorted reference ------------------------------------
values_strategy = st.lists(
    st.integers(min_value=1, max_value=50), min_size=1, max_size=40
)


@settings(**_SETTINGS_HEAVY)
@given(vals=values_strategy)
def test_decile_profile_matches_sorted_reference(spark, vals):
    from sparkstreaming_gmall_scala_spark.operators.analytics import (
        decile_profile,
    )

    df = spark.createDataFrame([(v,) for v in vals], "c long")
    got = {
        r["decile"]: (r["n_rows"], r["min_value"], r["max_value"],
                      r["sum_value"])
        for r in decile_profile(df, "c", n_buckets=10).collect()
    }

    n = len(vals)
    s = sorted(vals)
    bounds = [s[math.ceil(k * n / 10) - 1] for k in range(1, 10)]

    def bucket(v: int) -> int:
        return 1 + sum(1 for b in bounds if b < v)

    ref: dict[int, list[int]] = {}
    for v in vals:
        ref.setdefault(bucket(v), []).append(v)
    want = {
        d: (len(xs), min(xs), max(xs), sum(xs)) for d, xs in ref.items()
    }
    assert got == want
    # every row accounted for exactly once
    assert sum(g[0] for g in got.values()) == n


# --- spearman_rho vs local average-rank Pearson -----------------------------
pairs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=2,
    max_size=30,
)


def _avg_ranks(xs: list[int]) -> list[float]:
    by_v: dict[int, list[int]] = {}
    for i, v in enumerate(sorted(range(len(xs)), key=lambda i: xs[i])):
        by_v.setdefault(xs[v], []).append(i + 1)
    return [sum(by_v[v]) / len(by_v[v]) for v in xs]


@settings(**_SETTINGS_HEAVY)
@given(pairs=pairs_strategy)
def test_spearman_matches_local_avg_rank_pearson(spark, pairs):
    from sparkstreaming_gmall_scala_spark.operators.analytics import (
        spearman_rho,
    )

    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    # degenerate: a constant column has zero rank variance → rho undefined
    # (the operator emits NaN-free output only for non-degenerate input;
    # hypothesis will generate constants, so branch on it)
    df = spark.createDataFrame(list(pairs), "x long, y long")
    rows = spearman_rho(df, "x", "y").collect()
    rx, ry = _avg_ranks(xs), _avg_ranks(ys)
    n = len(pairs)
    mx, my = sum(rx) / n, sum(ry) / n
    dx = sum((a - mx) ** 2 for a in rx)
    dy = sum((a - my) ** 2 for a in ry)
    if dx == 0 or dy == 0:
        if rows:
            assert rows[0]["rho6"] is None
        return
    rho = sum((a - mx) * (b - my) for a, b in zip(rx, ry)) / math.sqrt(
        dx * dy
    )
    got = rows[0]["rho6"] / 1e6
    assert abs(got - rho) <= 2e-6  # 6-dp floor + float path differences


# --- rolling_distinct_users vs naive window scan ----------------------------
activity_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),    # user
        st.integers(min_value=0, max_value=20),   # day offset
    ),
    min_size=1,
    max_size=30,
)


@settings(**_SETTINGS_HEAVY)
@given(act=activity_strategy)
def test_rolling_distinct_matches_naive(spark, act):
    from sparkstreaming_gmall_scala_spark.operators.analytics import (
        rolling_distinct_users,
    )

    base = dt.datetime(2024, 3, 1)
    rows = [
        (u, base + dt.timedelta(days=d, hours=u % 3)) for u, d in act
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["day"]: r["dau_7d"]
        for r in rolling_distinct_users(df, days=7).collect()
    }
    days = sorted({d for _, d in act})
    want = {}
    for d in days:
        users = {u for u, d2 in act if d - 6 <= d2 <= d}
        want[(base + dt.timedelta(days=d)).strftime("%Y-%m-%d")] = len(users)
    assert got == want


# --- top_paths_frame vs local counting --------------------------------------
@settings(**_SETTINGS)
@given(
    seq=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),          # user
            # None exercises the null-propagation contract (r10 advice):
            # a window touching a NULL event_type counts for NOTHING —
            # not a shortened path (concat_ws would silently skip it)
            st.sampled_from(["a", "b", "c", None]),         # type
        ),
        min_size=1,
        max_size=20,
    )
)
def test_top_paths_matches_local(spark, seq):
    from sparkstreaming_gmall_scala_spark.operators.analytics import (
        top_paths_frame,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i + 1, base + dt.timedelta(seconds=i), u, t)
        for i, (u, t) in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r["path"]: r["n"]
        for r in top_paths_frame(df, steps=3, top_n=100).collect()
    }
    per_user: dict[int, list[str]] = {}
    for _, _, u, t in rows:  # rows already in (ts, event_id) order
        per_user.setdefault(u, []).append(t)
    want = Counter()
    for types in per_user.values():
        for i in range(len(types) - 2):
            win = types[i : i + 3]
            if None in win:
                continue  # null-propagating concat: whole path vanishes
            want[">".join(win)] += 1
    assert got == dict(want)
