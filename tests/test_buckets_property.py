"""P4/P5 boundary tests (SURVEY.md §5.2.3: ages 19/20/21/30/31) and
hypothesis property tests for the A4 allocation invariant."""

from __future__ import annotations

from datetime import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.functions.buckets import (
    AGE_21_30,
    AGE_GT30,
    AGE_LT20,
    GENDER_F,
    GENDER_M,
    age_bucket_cn,
    gender_cn,
)
from sparkstreaming_gmall_scala_spark.operators.allocation import allocate


def test_age_bucket_boundaries(spark):
    """Age 19 → under-20 bucket; 20..30 → middle (the reference's strict
    ``if (age < 20) … else if (age > 30)`` chain puts EXACTLY 20 and 30 in
    the middle); 31 → upper — on 365-day years."""
    as_of = datetime(2024, 1, 1)
    rows = []
    for age in (19, 20, 21, 30, 31):
        # birthday exactly `age` 365-day years (plus 1 day of slack)
        # before as_of → floor == age
        bday = datetime.fromtimestamp(
            as_of.timestamp() - age * 365 * 86400 - 86400
        )
        rows.append((age, bday))
    df = spark.createDataFrame(rows, "age long, birthday timestamp").select(
        "age", age_bucket_cn(F.col("birthday"), F.lit(as_of)).alias("bucket")
    )
    got = {r["age"]: r["bucket"] for r in df.collect()}
    assert got[19] == AGE_LT20
    assert got[20] == AGE_21_30 and got[21] == AGE_21_30 and got[30] == AGE_21_30
    assert got[31] == AGE_GT30


def test_gender_decode(spark):
    df = spark.createDataFrame([("M",), ("F",), ("x",), (None,)], "g string")
    got = [r[0] for r in df.select(gender_cn(F.col("g"))).collect()]
    assert got == [GENDER_M, GENDER_F, GENDER_F, GENDER_F]


# ---------------------------------------------------------------------------
# A4 allocation properties (SURVEY.md §5.2.4)
# ---------------------------------------------------------------------------
amounts_strategy = st.lists(
    st.integers(min_value=1, max_value=100_000),  # detail amounts in cents
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=12,  # each example is a Spark job; keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cents=amounts_strategy, discount_pct=st.integers(min_value=0, max_value=99))
def test_allocation_sums_exact_and_order_insensitive(spark, cents, discount_pct):
    """For ANY detail amounts and any discounted total: Σ shares ==
    final_total to the cent, and the result is identical under a
    different input row order (the batch form is order-insensitive — the
    property the reference's Redis-order-dependent version lacks)."""
    original_total = sum(cents) / 100.0
    final_total = round(original_total * (100 - discount_pct) / 100, 2)
    rows = [
        (1, i + 1, c / 100.0, original_total, final_total)
        for i, c in enumerate(cents)
    ]
    schema = (
        "order_id long, detail_id long, amount double, "
        "original_total double, final_total double"
    )
    out = {}
    for perm in (rows, rows[::-1]):
        df = spark.createDataFrame(perm, schema)
        res = allocate(
            df,
            order_key="order_id",
            detail_order=["detail_id"],
            amount="amount",
            total="final_total",
        ).collect()
        shares = {r["detail_id"]: r["final_detail_amount"] for r in res}
        assert len(shares) == len(cents)
        total_cents = round(sum(shares.values()) * 100)
        assert total_cents == round(final_total * 100), (
            f"sum {total_cents} != {round(final_total * 100)} for {cents}"
        )
        out[id(perm)] = shares
    a, b = out.values()
    assert a == b, "allocation depends on input row order"
