"""A4 allocation invariants (reference: dws/OrderWideApp.scala:134-178).

The property the reference maintains with Redis running sums — per order,
Σ final_detail_amount == final_total_amount to the cent — must hold under
the batch window formulation for any input, in any arrival order.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.allocation import allocate


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "order_id long, detail_id long, amount double, total double"
    )
    return allocate(
        df,
        order_key="order_id",
        detail_order="detail_id",
        amount="amount",
        total="total",
    )


def _cents(x: float) -> int:
    import math

    return int(math.floor(x * 100 + 0.5))


def test_shares_sum_exactly_to_total(spark):
    rows = [
        (1, 1, 10.0, 99.99),
        (1, 2, 20.0, 99.99),
        (1, 3, 30.01, 99.99),
        (2, 1, 7.77, 10.00),
    ]
    out = _run(spark, rows).groupBy("order_id").agg(
        F.round(F.sum("final_detail_amount"), 2).alias("s"),
        F.first("total").alias("t"),
    )
    for r in out.collect():
        assert _cents(r["s"]) == _cents(r["t"]), r


def test_single_detail_takes_full_total(spark):
    out = _run(spark, [(5, 1, 3.33, 42.42)]).collect()
    assert len(out) == 1
    assert out[0]["final_detail_amount"] == pytest.approx(42.42)


def test_proportionality_non_last_rows(spark):
    # amounts 25/75 of a 100 basis, total 10 → shares 2.50 / 7.50
    out = {
        r["detail_id"]: r["final_detail_amount"]
        for r in _run(spark, [(1, 1, 25.0, 10.0), (1, 2, 75.0, 10.0)]).collect()
    }
    assert out[1] == pytest.approx(2.50)
    assert out[2] == pytest.approx(7.50)


def test_order_insensitive(spark):
    """A4-b is arrival-order independent (unlike the reference): shuffling
    input row order never changes any allocated share."""
    rng = random.Random(7)
    rows = []
    for order in range(1, 30):
        total = round(rng.uniform(1, 500), 2)
        for d in range(1, rng.randint(2, 6)):
            rows.append((order, d, round(rng.uniform(0.01, 99), 2), total))
    base = {
        (r["order_id"], r["detail_id"]): r["final_detail_amount"]
        for r in _run(spark, rows).collect()
    }
    shuffled = rows[:]
    rng.shuffle(shuffled)
    again = {
        (r["order_id"], r["detail_id"]): r["final_detail_amount"]
        for r in _run(spark, shuffled).collect()
    }
    assert base == again


def test_property_random_orders_invariant(spark):
    """Property: for 200 random orders, Σ shares == total to the cent and
    every share is a whole number of cents."""
    rng = random.Random(42)
    rows = []
    for order in range(1, 200):
        total = round(rng.uniform(0.01, 10000), 2)
        n = rng.randint(1, 7)
        for d in range(1, n + 1):
            rows.append((order, d, round(rng.uniform(0.01, 500), 2), total))
    out = _run(spark, rows)
    per_order = (
        out.groupBy("order_id")
        .agg(F.sum("final_detail_amount").alias("s"), F.first("total").alias("t"))
        .collect()
    )
    for r in per_order:
        assert _cents(r["s"]) == _cents(r["t"]), r
    for r in out.collect():
        v = r["final_detail_amount"] * 100
        assert abs(v - round(v)) < 1e-6, r


# ---------------------------------------------------------------------------
# equal_split_exact (round 9)
# ---------------------------------------------------------------------------


def test_equal_split_exact_remainder_goes_to_earliest(spark):
    from sparkstreaming_gmall_scala_spark.operators.allocation import (
        equal_split_exact,
    )

    # 100 units across 3 rows: 34, 33, 33 — the extra unit to the lowest
    # order key; group g2 divides evenly
    df = spark.createDataFrame(
        [("g1", 1, 100), ("g1", 2, 100), ("g1", 3, 100),
         ("g2", 1, 10), ("g2", 2, 10)],
        ["g", "ord", "amt"],
    )
    got = {
        (r["g"], r["ord"]): r["split_amount"]
        for r in equal_split_exact(df, "g", ["ord"], "amt").collect()
    }
    assert got == {("g1", 1): 34, ("g1", 2): 33, ("g1", 3): 33,
                   ("g2", 1): 5, ("g2", 2): 5}


def test_equal_split_exact_negative_amounts_refunds(spark):
    # round-9 advice: pmod arithmetic must conserve NEGATIVE amounts too
    # (refunds): -7 over 3 rows -> -2, -2, -3 (remainder units +1 to the
    # earliest rows on top of floor(-7/3) = -3)
    from sparkstreaming_gmall_scala_spark.operators.allocation import (
        equal_split_exact,
    )

    df = spark.createDataFrame(
        [("r1", 1, -7), ("r1", 2, -7), ("r1", 3, -7),
         ("r2", 1, -6), ("r2", 2, -6)],
        ["g", "ord", "amt"],
    )
    got = {
        (r["g"], r["ord"]): r["split_amount"]
        for r in equal_split_exact(df, "g", ["ord"], "amt").collect()
    }
    assert got == {("r1", 1): -2, ("r1", 2): -2, ("r1", 3): -3,
                   ("r2", 1): -3, ("r2", 2): -3}
    assert sum(v for (g, _), v in got.items() if g == "r1") == -7


def test_equal_split_exact_conserves_any_group_size(spark):
    import random

    from pyspark.sql import functions as F

    from sparkstreaming_gmall_scala_spark.operators.allocation import (
        equal_split_exact,
    )

    rng = random.Random(99)
    rows = []
    for g in range(40):
        amt = rng.randint(-(10**9), 10**9)
        for i in range(rng.randint(1, 9)):
            rows.append((g, i, amt))
    df = spark.createDataFrame(rows, ["g", "ord", "amt"])
    out = equal_split_exact(df, "g", ["ord"], "amt")
    # per-group sums reproduce the amount to the unit
    bad = (
        out.groupBy("g", "amt")
        .agg(F.sum("split_amount").alias("s"))
        .filter(F.col("s") != F.col("amt"))
        .count()
    )
    assert bad == 0
    # every row within 1 unit of the mean
    spread = out.groupBy("g").agg(
        (F.max("split_amount") - F.min("split_amount")).alias("d")
    )
    assert spread.filter(F.col("d") > 1).count() == 0
