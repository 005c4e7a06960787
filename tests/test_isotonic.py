"""Isotonic-regression pins: PAVA vs the INDEPENDENT minimax formula
fitted_i = max_{j<=i} min_{k>=i} mean(y[j..k]) (computed with exact
Fractions — a different algorithm entirely, the dup_cores
two-implementation discipline), plus the projection's defining
properties and the catalog query's shape."""

from __future__ import annotations

import random
from fractions import Fraction

from sparkstreaming_gmall_scala_spark.plans.scale import pava_fit


def _minimax(ys):
    """fitted_i = max over j<=i of (min over k>=i of mean(y[j..k])) —
    O(n³) by intent, exact Fractions."""
    n = len(ys)
    pref = [0]
    for y in ys:
        pref.append(pref[-1] + y)
    out = []
    for i in range(n):
        best = None
        for j in range(i + 1):
            worst = None
            for k in range(i, n):
                m = Fraction(pref[k + 1] - pref[j], k + 1 - j)
                if worst is None or m < worst:
                    worst = m
            if best is None or worst > best:
                best = worst
        out.append(best)
    return out


def _check(ys):
    fit = pava_fit(ys)
    mm = _minimax(ys)
    assert len(fit) == len(ys)
    for (s, n), want in zip(fit, mm):
        assert Fraction(s, n) == want, (ys, fit, mm)
    # defining properties: monotone, block means, mass preservation
    means = [Fraction(s, n) for s, n in fit]
    assert all(a <= b for a, b in zip(means, means[1:]))
    assert sum(s for s, n in fit) // fit[0][1] is not None  # shape only
    assert sum(Fraction(s, n) for s, n in fit) == sum(ys)


def test_pava_equals_minimax_on_random_series():
    rng = random.Random(12)
    for trial in range(8):
        n = rng.randrange(1, 25)
        ys = [rng.randrange(-50, 200) for _ in range(n)]
        _check(ys)


def test_pava_edge_shapes():
    _check([5])
    _check([1, 2, 3, 4])          # already monotone: identity
    _check([4, 3, 2, 1])          # strictly decreasing: one global pool
    _check([10, 10, 10])          # ties
    fit = pava_fit([4, 3, 2, 1])
    assert all((s, n) == (10, 4) for s, n in fit)


def test_catalog_query_matches_direct_pava(spark, sf_dir):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
    from sparkstreaming_gmall_scala_spark.sources import load_table
    import math
    from collections import defaultdict

    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    daily: dict[str, int] = defaultdict(int)
    for r in rows:
        daily[str(r["o_orderdate"])[:10]] += int(
            math.floor(r["o_totalprice"] * 100 + 0.5)
        )
    days = sorted(daily)
    fit = pava_fit([daily[d] for d in days])
    want = {
        d: (daily[d], s * 1000000 // n)
        for d, (s, n) in zip(days, fit)
    }
    got = load_all()["isotonic_revenue"].builder(spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        assert (r["y_cents"], r["fit_microcents"]) == want[r["d"]], r["d"]
    fits = [
        r["fit_microcents"] for r in sorted(got, key=lambda r: r["d"])
    ]
    assert all(a <= b for a, b in zip(fits, fits[1:]))


def test_live_twin_equals_batch(spark, sf_dir):
    """isotonic_revenue_live folds the SPC mart's additive (d, y)
    partials into the daily frame and runs the identical evaluator —
    the result must equal the batch query's exactly."""
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    reg = load_all()
    batch = sorted(
        map(tuple, reg["isotonic_revenue"].builder(spark, sf_dir).collect())
    )
    live = sorted(
        map(
            tuple,
            reg["isotonic_revenue_live"].builder(spark, sf_dir).collect(),
        )
    )
    assert live == batch


# ---------------------------------------------------------------------------
# Round 13: the WEIGHTED case (calibrated_quality_scores' fit) pinned the
# same way — pava_fit_pools vs the weighted minimax with exact Fractions,
# fitted_i = max_{j<=i} min_{k>=i} (sum s[j..k]) / (sum n[j..k]).
# ---------------------------------------------------------------------------
def _minimax_weighted(sn):
    n = len(sn)
    ps, pn = [0], [0]
    for s, w in sn:
        ps.append(ps[-1] + s)
        pn.append(pn[-1] + w)
    out = []
    for i in range(n):
        best = None
        for j in range(i + 1):
            worst = None
            for k in range(i, n):
                m = Fraction(ps[k + 1] - ps[j], pn[k + 1] - pn[j])
                if worst is None or m < worst:
                    worst = m
            if best is None or worst > best:
                best = worst
        out.append(best)
    return out


def _check_weighted(sn):
    from sparkstreaming_gmall_scala_spark.plans.scale import pava_fit_pools

    fit = pava_fit_pools(sn)
    mm = _minimax_weighted(sn)
    assert len(fit) == len(sn)
    for (s, c), m in zip(fit, mm):
        assert Fraction(s, c) == m, (sn, fit, mm)
    # monotone non-decreasing, and pool ppm matches the minimax floor
    # (the application step calibrated_quality_scores broadcasts)
    means = [Fraction(s, c) for s, c in fit]
    assert all(a <= b for a, b in zip(means, means[1:]))
    for (s, c), m in zip(fit, mm):
        assert s * 1000000 // c == (m.numerator * 1000000) // m.denominator


def test_weighted_pava_equals_weighted_minimax_random():
    rng = random.Random(13)
    for _ in range(60):
        n = rng.randint(1, 12)
        sn = []
        for _ in range(n):
            w = rng.randint(1, 9)
            sn.append((rng.randint(0, w), w))  # s <= w: a success count
        _check_weighted(sn)


def test_weighted_pava_edges():
    _check_weighted([(3, 5)])
    _check_weighted([(5, 5), (0, 5)])  # one violator pair pools
    _check_weighted([(0, 1), (1, 1), (2, 2), (3, 3)])  # already isotone
    _check_weighted([(9, 9), (4, 8), (1, 7), (0, 6)])  # fully decreasing


def test_unit_weight_pools_match_pava_fit():
    rng = random.Random(7)
    from sparkstreaming_gmall_scala_spark.plans.scale import pava_fit_pools

    for _ in range(40):
        ys = [rng.randint(-20, 20) for _ in range(rng.randint(1, 30))]
        assert pava_fit(ys) == pava_fit_pools([(y, 1) for y in ys])
