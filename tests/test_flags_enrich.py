"""First-event flagging (A3/W1/J5) and dim-enrichment (J3/J4) semantics
(reference: dwd/OrderInfoApp.scala:92-157, 194-253)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.enrich import enrich_left
from sparkstreaming_gmall_scala_spark.operators.flags import (
    first_event_flag,
    members_only,
)


def test_first_event_flag_one_first_per_key(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-02 00:00:00", 11),
            (1, "2024-01-01 00:00:00", 12),
            (1, "2024-01-01 00:00:00", 10),  # tie on time → id breaks it
            (2, "2024-03-01 00:00:00", 20),
        ],
        "user_id long, create_time string, order_id long",
    )
    out = first_event_flag(
        df, key="user_id", order_by=["create_time", "order_id"], flag_col="f"
    )
    firsts = out.filter(F.col("f") == "1").collect()
    assert {(r["user_id"], r["order_id"]) for r in firsts} == {(1, 10), (2, 20)}
    # exactly one '1' per key
    per_key = (
        out.groupBy("user_id")
        .agg(F.sum(F.col("f").cast("int")).alias("n_first"))
        .collect()
    )
    assert all(r["n_first"] == 1 for r in per_key)


def test_members_only_semi_anti_partition(spark):
    """semi + anti of the same probe partition the input exactly."""
    facts = spark.createDataFrame([(i,) for i in range(10)], "user_id long")
    state = spark.createDataFrame([(2,), (5,), (7,), (99,)], "user_id long")
    seen = members_only(facts, state, "user_id", "left_semi")
    new = members_only(facts, state, "user_id", "left_anti")
    assert {r["user_id"] for r in seen.collect()} == {2, 5, 7}
    assert seen.count() + new.count() == facts.count()


def test_enrich_left_missing_dim_leaves_null(spark):
    fact = spark.createDataFrame([(1, 100), (2, 200), (3, 999)], "id long, k long")
    dim = spark.createDataFrame([(100, "a"), (200, "b")], "dk long, name string")
    out = enrich_left(fact, [(dim, "k", "dk")])
    got = {r["id"]: r["name"] for r in out.collect()}
    assert got == {1: "a", 2: "b", 3: None}
    assert out.count() == 3  # left join never drops fact rows


import pytest


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"]
)
def test_dau_approx_within_error_bound(spark, sf):
    """HLL++ DAU must land within 5% of the exact distinct count per day
    (rsd=2%; 5% gives slack for small days) — at BOTH the tiny SF and
    sf0.1, so the rsd claim survives scale-up."""
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    reg = load_all()
    exact = {r["dt"]: r["dau"] for r in reg["dau"].builder(spark, sf).collect()}
    approx = {
        r["dt"]: r["dau_approx"]
        for r in reg["dau_approx"].builder(spark, sf).collect()
    }
    assert set(exact) == set(approx)
    for dt, n in exact.items():
        assert abs(approx[dt] - n) / max(n, 1) <= 0.05, (dt, n, approx[dt])


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"]
)
def test_price_quantiles_approx_within_rank_error(spark, sf):
    """approx_percentile at accuracy=10000 guarantees rank error
    ≤ n/accuracy per group; every group here has n << 10000 at sf0.001
    and n/accuracy ≤ ~2.4 ranks at sf0.1, so the approx median/p90 must
    sit inside the exact [p-ε, p+ε] value bracket with ε = 0.01 of rank
    space (plus one interpolation step of slack)."""
    from pyspark.sql import functions as F

    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
    from sparkstreaming_gmall_scala_spark.sources import load_table

    reg = load_all()
    approx = {
        r["p_brand"]: r
        for r in reg["price_quantiles_approx"].builder(spark, sf).collect()
    }
    li = load_table(spark, sf, "lineitem").select("l_partkey", "l_extendedprice")
    p = load_table(spark, sf, "part").select("p_partkey", "p_brand")
    eps = 0.01
    brackets = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            *[
                F.percentile("l_extendedprice", F.lit(q)).alias(name)
                for name, q in (
                    ("med_lo", 0.5 - eps),
                    ("med_hi", 0.5 + eps),
                    ("p90_lo", 0.9 - eps),
                    ("p90_hi", 0.9 + eps),
                )
            ],
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert {r["p_brand"] for r in brackets} == set(approx)
    for r in brackets:
        a = approx[r["p_brand"]]
        # r2 rounding in the query ⇒ 0.01 value slack on the bracket edges
        assert r["med_lo"] - 0.01 <= a["median_price"] <= r["med_hi"] + 0.01, (
            r["p_brand"], a["median_price"], r["med_lo"], r["med_hi"],
        )
        assert r["p90_lo"] - 0.01 <= a["p90_price"] <= r["p90_hi"] + 0.01, (
            r["p_brand"], a["p90_price"], r["p90_lo"], r["p90_hi"],
        )
