"""Degenerate-data robustness for the round-12 statistics: constructed
orders tables (all-tied values, one status only, single order, two-day
calendars) flow through the REGISTERED builders end to end — no crashes,
documented graceful output. The real test tables contain none of these
shapes, so this file is the only coverage (the test_null_robustness
pattern, applied to the stats family)."""

from __future__ import annotations

import datetime

import pytest


def _write_orders(spark, tmp_path, rows):
    """rows: (o_orderkey, o_custkey, o_orderstatus, o_totalprice, date)"""
    d = str(tmp_path / "sf_degenerate")
    spark.createDataFrame(
        [
            (ok, ck, st, tp, datetime.datetime.combine(dt, datetime.time()))
            for ok, ck, st, tp, dt in rows
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    # the nation-joining builders also need customer + nation
    spark.createDataFrame(
        [(ck, 0) for ck in {r[1] for r in rows}],
        "c_custkey long, c_nationkey long",
    ).write.mode("overwrite").parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [(0, "ALPHA")], "n_nationkey long, n_name string"
    ).write.mode("overwrite").parquet(f"{d}/nation.parquet")
    return d


D0 = datetime.date(2024, 1, 1)


def test_mwu_all_tied_values_z_is_zero(spark, tmp_path):
    """Every order the same price: U1 = n1·n2/2 exactly, z = 0 — the
    tie-corrected variance stays positive (T < N³−N when both groups
    are nonempty at one shared value... here T = N³−N exactly, so the
    variance is 0/0-adjacent; the builder must not crash and must emit
    the exact integer U)."""
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    rows = [
        (i, 1, "F" if i % 2 else "O", 100.0, D0 + datetime.timedelta(days=i))
        for i in range(6)
    ]
    d = _write_orders(spark, tmp_path, rows)
    out = load_all()["mwu_spend_by_status"].builder(spark, d).collect()
    # n1=3, n2=3, one tie run of 6: 2R1 = 3·(2·6−6+1) = 21, u1_x2 = 21−12 = 9
    # → 2U1 − n1n2 = 0 → z numerator exactly 0; var = (9/12)·(7 − 210/30)=0
    # → 0/0 = nan; floor(nan·1e6+0.5) — Python math.floor(nan) raises.
    # The builder must therefore either emit z_ppm = 0 or an empty frame,
    # never crash. (Pinned: exact-zero numerator short-circuits.)
    assert len(out) <= 1
    if out:
        assert out[0]["u1_x2"] == 9
        assert out[0]["z_ppm"] == 0


def test_mann_kendall_single_day_per_nation_emits_nothing(spark, tmp_path):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    rows = [(1, 1, "F", 50.0, D0)]
    d = _write_orders(spark, tmp_path, rows)
    out = load_all()["mann_kendall_trend"].builder(spark, d).collect()
    assert out == []  # n_days >= 2 filter


def test_mann_kendall_all_tied_days_z_zero(spark, tmp_path):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    rows = [
        (i, 1, "F", 100.0, D0 + datetime.timedelta(days=i)) for i in range(5)
    ]
    d = _write_orders(spark, tmp_path, rows)
    out = load_all()["mann_kendall_trend"].builder(spark, d).collect()
    assert len(out) == 1
    assert out[0]["s_stat"] == 0 and out[0]["z_ppm"] == 0


def test_spc_two_days_no_violations(spark, tmp_path):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    rows = [(1, 1, "F", 100.0, D0), (2, 1, "F", 200.0, D0 + datetime.timedelta(days=1))]
    d = _write_orders(spark, tmp_path, rows)
    out = load_all()["spc_violations"].builder(spark, d).collect()
    # two days: each is 1·n−S = ±dev; (dev)² vs 9(nQ−S²): nQ−S² = (y1−y2)²/…
    # exact check: n=2, S=y1+y2, y·2−S = ±(y1−y2); 9(2Q−S²) = 9(y1−y2)²
    # → (y1−y2)² > 9(y1−y2)² is false → rule1 never fires with n=2;
    # run_len max 1 < 8 → rule2 never fires. Empty output, no crash.
    assert out == []


def test_revenue_acf_single_day_emits_nothing(spark, tmp_path):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    rows = [(1, 1, "F", 100.0, D0)]
    d = _write_orders(spark, tmp_path, rows)
    assert load_all()["revenue_acf"].builder(spark, d).collect() == []


def test_interorder_gaps_single_order_per_customer(spark, tmp_path):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    rows = [(i, i, "F", 100.0, D0 + datetime.timedelta(days=i)) for i in range(4)]
    d = _write_orders(spark, tmp_path, rows)
    out = load_all()["interorder_gap_quantiles"].builder(spark, d).collect()
    # no customer has 2 orders → zero gaps → quartile aggregates over an
    # empty histogram: one row of nulls or an empty frame are both
    # acceptable; a crash is not. Current behavior: empty agg emits one
    # all-null row — pin it so a change is deliberate.
    if out:
        assert len(out) == 1
        assert out[0]["n_gaps"] is None or out[0]["n_gaps"] == 0
