"""Co-located (bucketed) join: the pay-the-shuffle-once-at-ingest path.

Asserts the physical property the 100 TB design depends on: a join
between two tables bucketed on the join key with equal bucket counts has
NO Exchange (shuffle) in its physical plan, and returns exactly the same
rows as the plain shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(autouse=True)
def clean_tables(spark):
    """saveAsTable leaves warehouse directories behind even after the
    in-memory catalog forgets the table (fresh session) — drop both the
    catalog entries and their locations around each test."""
    import shutil

    names = ("b_orders", "b_lineitem", "b_orders_8", "b_lineitem_4")

    def scrub():
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        for n in names:
            spark.sql(f"DROP TABLE IF EXISTS {n}")
            shutil.rmtree(f"{warehouse}/{n}", ignore_errors=True)

    scrub()
    yield
    scrub()


@pytest.fixture()
def no_broadcast(spark):
    """Force a real distributed join so the exchange-elision claim is
    tested on the sort-merge path, not hidden by a broadcast."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cobucketed_join_has_no_exchange_and_matches_plain_join(
    spark, sf_dir, no_broadcast
):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_quantity"
    )
    write_bucketed(o, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(li, "b_lineitem", "o_orderkey", 8, sort_col="o_orderkey")

    joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:3000]

    plain = o.join(li, "o_orderkey")
    got = {tuple(r) for r in joined.collect()}
    expect = {tuple(r) for r in plain.collect()}
    assert got == expect


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark, sf_dir, no_broadcast):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber"
    )
    write_bucketed(o, "b_orders_8", "o_orderkey", 8)
    write_bucketed(li, "b_lineitem_4", "o_orderkey", 4)
    joined = bucketed_join(spark, "b_orders_8", "b_lineitem_4", "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # one side (at most) re-shuffles; correctness is unaffected
    assert joined.count() == o.join(li, "o_orderkey").count()
    assert "Exchange" in plan  # documents the fallback, not a silent lie


def test_bucketed_order_lineitem_single_exchange(spark, sf_dir):
    """bucketed_order_lineitem's claim is physical (r12 verdict #5):
    with auto-broadcast disabled, the fact x fact order-detail join
    reads matching buckets directly AND the per-order rollup reuses the
    scan partitioning — the ONLY exchange in the executed plan is the
    final |priorities|-row rollup; the join subtree and the per-order
    aggregate have none."""
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
    from sparkstreaming_gmall_scala_spark.plans.scale import (
        _bucketed_ol_tables,
    )

    _bucketed_ol_tables(spark, sf_dir)  # ensure the layout exists
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = load_all()["bucketed_order_lineitem"].builder(spark, sf_dir)
        df.collect()  # finalize the AQE plan before reading it
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # AQE's toString echoes the pre-adaptive plan under "== Initial
    # Plan ==" — only the executed Final Plan section is the claim
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==", 1)[0]
    assert "SortMergeJoin" in plan, plan[:2000]
    assert plan.count("Exchange") == 1, plan[:3000]
    join_subtree = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange" not in join_subtree, join_subtree[:2000]
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, (
        plan[:3000]
    )


def test_point_lookup_prunes_to_one_bucket(spark, sf_dir):
    """bucketed_point_lookup's physical contract: the equality literal
    on the bucket column makes the scan read ONE of the 8 bucket files
    (SelectedBucketsCount in the scan node) — the third pruning form
    next to static partition pruning and DPP."""
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    q = load_all()["bucketed_point_lookup"].builder(spark, sf_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:3000]
