"""Round-12 batch-5 pins: the KMV distinct sketch, the Brown-Forsythe
variance test, and Holt level+trend smoothing vs INDEPENDENT naive
references (the test_round12_stats discipline: recompute from the raw
sf0.001 parquet with plain Python — sorted lists, explicit dict folds —
and compare exactly), plus empty-input robustness for the new builders.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

KMV_K = 64
KMV_A = 2654435761
KMV_M = 4294967296


def _naive_kmv(day_users: dict[str, set[int]]):
    out = {}
    for dt, users in day_users.items():
        hashes = sorted((u * KMV_A) % KMV_M for u in users)
        n = len(hashes)
        if n < KMV_K:
            est = n
        else:
            est = (KMV_K - 1) * KMV_M // hashes[KMV_K - 1]
        out[dt] = (n, est, abs(est - n) * 1000000 // n)
    return out


def test_kmv_matches_naive_on_sf0001(spark, sf_dir):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
    from sparkstreaming_gmall_scala_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .selectExpr("date_format(ts, 'yyyy-MM-dd') AS dt", "user_id")
        .where("user_id IS NOT NULL")
        .collect()
    )
    day_users: dict[str, set[int]] = defaultdict(set)
    for r in rows:
        day_users[r["dt"]].add(r["user_id"])
    want = _naive_kmv(day_users)
    got = (
        load_all()["kmv_distinct_daily"].builder(spark, sf_dir).collect()
    )
    assert len(got) == len(want)
    for r in got:
        assert (
            r["exact_distinct"],
            r["kmv_estimate"],
            r["err_ppm"],
        ) == want[r["dt"]], r["dt"]


def test_kmv_kth_min_path_vs_naive(spark, tmp_path):
    """sf0.001 days rarely exceed k distinct users, so force the
    (k-1)*2^32 div h_(k) path with a synthetic 200-user day and pin it
    against the naive sorted-hashes estimate."""
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    users = [7 * i + 3 for i in range(200)]  # arbitrary, distinct
    df = spark.createDataFrame(
        [(i, "2024-03-01 10:00:00", u, "view", 1.0, "{}")
         for i, u in enumerate(users)],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    )
    d = str(tmp_path / "sf_kmv")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = load_all()["kmv_distinct_daily"].builder(spark, d).collect()
    want = _naive_kmv({"2024-03-01": set(users)})["2024-03-01"]
    assert len(got) == 1
    r = got[0]
    assert r["exact_distinct"] == 200  # > k: estimate path taken
    assert (r["exact_distinct"], r["kmv_estimate"], r["err_ppm"]) == want
    # and the estimator is actually usable: within 15% on this day
    assert r["err_ppm"] <= 150000


def test_levene_bf_matches_naive(spark, sf_dir):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
    from sparkstreaming_gmall_scala_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_totalprice")
        .collect()
    )
    groups: dict[str, list[int]] = defaultdict(list)
    for r in rows:
        groups[r["o_orderstatus"]].append(
            int(math.floor(r["o_totalprice"] * 100 + 0.5))
        )
    stats = {}
    for st in ("O", "F", "P"):
        vals = sorted(groups.get(st, []))
        n = len(vals)
        # doubled median: a+b of the two mid elements (equal when odd)
        med2x = vals[(n - 1) // 2] + vals[n // 2]
        z2 = [abs(2 * v - med2x) for v in vals]
        stats[st] = (n, sum(z2), sum(z * z for z in z2))
    n_o, s_o, q_o = stats["O"]
    n_f, s_f, q_f = stats["F"]
    n_p, s_p, q_p = stats["P"]
    n = n_o + n_f + n_p
    zb_o, zb_f, zb_p = s_o / n_o, s_f / n_f, s_p / n_p
    zb = float(s_o + s_f + s_p) / float(n)
    between = (
        (float(n_o) * (zb_o - zb)) * (zb_o - zb)
        + (float(n_f) * (zb_f - zb)) * (zb_f - zb)
    ) + (float(n_p) * (zb_p - zb)) * (zb_p - zb)
    within = (
        (float(q_o) - (float(s_o) * float(s_o)) / float(n_o))
        + (float(q_f) - (float(s_f) * float(s_f)) / float(n_f))
    ) + (float(q_p) - (float(s_p) * float(s_p)) / float(n_p))
    want_w = math.floor(
        (float(n - 3) / 2.0) * (between / within) * 1000.0 + 0.5
    )
    got = load_all()["levene_bf_status"].builder(spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n"], r["n_o"], r["n_f"], r["n_p"]) == (n, n_o, n_f, n_p)
    assert (r["s_o"], r["s_f"], r["s_p"]) == (s_o, s_f, s_p)
    assert r["w_milli"] == want_w


def _tdiv(a: int, d: int) -> int:
    return -((-a) // d) if a < 0 else a // d


def test_holt_matches_naive(spark, sf_dir):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
    from sparkstreaming_gmall_scala_spark.sources import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    na = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rows = (
        o.join(cu, o["o_custkey"] == cu["c_custkey"])
        .join(na, cu["c_nationkey"] == na["n_nationkey"])
        .select("n_name", "o_orderdate", "o_totalprice")
        .collect()
    )
    daily: dict[tuple, int] = defaultdict(int)
    for r in rows:
        daily[(r["n_name"], str(r["o_orderdate"])[:10])] += int(
            math.floor(r["o_totalprice"] * 100 + 0.5)
        )
    series: dict[str, list[int]] = defaultdict(list)
    for (name, day) in sorted(daily):
        series[name].append(daily[(name, day)])
    want = {}
    for name, ys in series.items():
        l, b, err = ys[0], 0, 0
        for y in ys[1:]:
            err += abs(y - (l + b))
            l_new = _tdiv(2 * y + 8 * (l + b), 10)
            b = _tdiv(2 * (l_new - l) + 8 * b, 10)
            l = l_new
        want[name] = (len(ys), l, b, l + b, err // max(len(ys) - 1, 1))
    got = load_all()["holt_forecast"].builder(spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        assert (
            r["n_days"],
            r["level_cents"],
            r["trend_cents"],
            r["forecast_cents"],
            r["mae_cents"],
        ) == want[r["n_name"]], r["n_name"]


def test_holt_tracks_linear_trend_better_than_ewma_lag():
    """Sanity on the recurrence itself: on a clean linear ramp the
    trend term converges near the true slope and the forecast error
    shrinks, which plain EWMA (b pinned at 0) cannot do."""
    ys = [1000 * t for t in range(1, 120)]
    l, b = ys[0], 0
    for y in ys[1:]:
        l_new = _tdiv(2 * y + 8 * (l + b), 10)
        b = _tdiv(2 * (l_new - l) + 8 * b, 10)
        l = l_new
    assert abs(b - 1000) <= 50  # trend locked onto the true slope
    assert abs((l + b) - 1000 * 120) <= 2000  # one-step forecast close


@pytest.fixture()
def empty_sf_dir(spark, tmp_path):
    import os

    src = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    d = str(tmp_path / "sf_empty5")
    for t in ("orders", "customer", "nation", "events"):
        spark.read.parquet(f"{src}/{t}.parquet").limit(0).write.mode(
            "overwrite"
        ).parquet(f"{d}/{t}.parquet")
    return d


def test_batch5_builders_survive_empty_inputs(spark, empty_sf_dir):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    reg = load_all()
    for name, cols in [
        (
            "kmv_distinct_daily",
            ["dt", "exact_distinct", "kmv_estimate", "err_ppm"],
        ),
        (
            "levene_bf_status",
            ["n", "n_o", "n_f", "n_p", "s_o", "s_f", "s_p", "w_milli"],
        ),
        (
            "holt_forecast",
            [
                "n_name",
                "n_days",
                "level_cents",
                "trend_cents",
                "forecast_cents",
                "mae_cents",
            ],
        ),
    ]:
        out = reg[name].builder(spark, empty_sf_dir)
        assert out.columns == cols, (name, out.columns)
        assert out.count() == 0, name


def test_jl_projection_matches_naive(spark, sf_dir):
    """The hash-sign JL audit vs a plain-Python recompute: Python floats
    ARE IEEE doubles and the folds share one left-to-right association,
    so the match is exact, not approximate."""
    import math as _math

    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
    from sparkstreaming_gmall_scala_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("label", "embedding")
        .where("embedding IS NOT NULL")
        .collect()
    )

    def sign(i, j):
        return (
            1.0
            if ((i * 16 + j) * 2654435761) % 4294967296 < 2147483648
            else -1.0
        )

    agg: dict[int, list[int]] = {}
    for r in rows:
        x = [float(v) for v in r["embedding"]]
        orig2 = 0.0
        for v in x:
            orig2 = orig2 + v * v
        proj2 = 0.0
        for j in range(16):
            p = 0.0
            for i in range(64):
                p = p + sign(i, j) * x[i]
            proj2 = proj2 + p * p
        a = agg.setdefault(r["label"], [0, 0, 0])
        a[0] += 1
        a[1] += int(_math.floor(orig2 * 1000000.0 + 0.5))
        a[2] += int(_math.floor(proj2 * 1000000.0 + 0.5))
    got = load_all()["jl_projection_audit"].builder(spark, sf_dir).collect()
    assert len(got) == len(agg)
    for r in got:
        n, so, sp = agg[r["label"]]
        assert (r["n"], r["sum_orig2_u"], r["sum_proj2_u"]) == (n, so, sp)
        assert r["ratio_ppm"] == sp * 1000000 // (16 * so)
        # and the JL property itself: norms preserved within 25% per label
        assert abs(r["ratio_ppm"] - 1000000) < 250000


def test_kmv_set_ops_matches_naive(spark, sf_dir):
    """Sketch set algebra vs a plain-Python recompute: build both
    audiences' hash sets from the raw events, walk the k-min/union/
    inclusion logic with sorted lists, compare every column exactly."""
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
    from sparkstreaming_gmall_scala_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .selectExpr("date_format(ts, 'yyyy-MM-dd') AS dt", "user_id")
        .where("user_id IS NOT NULL")
        .collect()
    )
    d0 = min(r["dt"] for r in rows)
    d1 = max(r["dt"] for r in rows)
    a = {(r["user_id"] * KMV_A) % KMV_M for r in rows if r["dt"] == d0}
    b = {(r["user_id"] * KMV_A) % KMV_M for r in rows if r["dt"] == d1}

    def est(hashes: set[int]) -> int:
        s = sorted(hashes)
        return (
            len(s)
            if len(s) < KMV_K
            else (KMV_K - 1) * KMV_M // s[KMV_K - 1]
        )

    ka = set(sorted(a)[:KMV_K])
    kb = set(sorted(b)[:KMV_K])
    ku = sorted(ka | kb)[:KMV_K]
    kmv_union = (
        len(ku) if len(ka | kb) < KMV_K else (KMV_K - 1) * KMV_M // ku[-1]
    )
    m_both = sum(1 for h in ku if h in ka and h in kb)
    kmv_inter = (
        m_both if len(ka | kb) < KMV_K else m_both * kmv_union // KMV_K
    )
    got = load_all()["kmv_set_ops"].builder(spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["exact_a"], r["exact_b"], r["exact_inter"]) == (
        len(a), len(b), len(a & b),
    )
    assert (r["kmv_a"], r["kmv_b"]) == (est(a), est(b))
    assert (r["kmv_union"], r["kmv_inter"]) == (kmv_union, kmv_inter)
    assert r["inter_err_ppm"] == abs(kmv_inter - len(a & b)) * 1000000 // max(
        len(a & b), 1
    )
