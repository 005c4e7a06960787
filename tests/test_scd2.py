"""SCD2 (operators/scd2.py): timeline collapse, incremental merge
equivalence under the monotone-batch contract, and as-of dim lookup."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.scd2 import (
    asof_dim_lookup,
    scd2_merge,
    scd2_timeline,
)
from sparkstreaming_gmall_scala_spark.sources import load_table

KEY = ("o_custkey", "o_orderdate", ["o_orderstatus"], "o_orderkey")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_timeline_invariants(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    t = scd2_timeline(o, *KEY).cache()
    try:
        # exactly one current row per key; versions are 1..n dense;
        # intervals chain: eff_to == next version's eff_from
        per_key = t.groupBy("o_custkey").agg(
            F.sum(F.col("is_current").cast("long")).alias("cur"),
            F.count(F.lit(1)).alias("n"),
            F.max("version").alias("vmax"),
            F.min("version").alias("vmin"),
        )
        bad = per_key.filter(
            (F.col("cur") != 1) | (F.col("vmax") != F.col("n"))
            | (F.col("vmin") != 1)
        )
        assert bad.count() == 0
        # adjacent versions never share a state (they would have
        # collapsed) and intervals are non-overlapping and chained
        from pyspark.sql import Window as W

        w = W.partitionBy("o_custkey").orderBy("version")
        chained = t.select(
            "o_custkey", "o_orderstatus", "eff_from", "eff_to", "version",
            F.lead("eff_from").over(w).alias("nxt_from"),
            F.lead("o_orderstatus").over(w).alias("nxt_state"),
        )
        assert chained.filter(
            F.col("nxt_from").isNotNull()
            & (F.col("eff_to") != F.col("nxt_from"))
        ).count() == 0
        assert chained.filter(
            F.col("nxt_state").isNotNull()
            & (F.col("nxt_state") == F.col("o_orderstatus"))
        ).count() == 0
        # observation conservation: run weights sum to the row count
        n = t.agg(F.sum("n_observations")).collect()[0][0]
        assert n == o.count()
    finally:
        t.unpersist()


def test_merge_fold_equals_full_rebuild(spark, sf_dir):
    """Date-sliced batches (the monotone ingestion contract) folded
    through scd2_merge reproduce the full-log timeline exactly,
    n_observations included."""
    o = load_table(spark, sf_dir, "orders")
    cuts = [
        dt.datetime(1997, 1, 1),
        dt.datetime(1999, 1, 1),
    ]
    b0 = o.filter(F.col("o_orderdate") < cuts[0])
    b1 = o.filter(
        (F.col("o_orderdate") >= cuts[0]) & (F.col("o_orderdate") < cuts[1])
    )
    b2 = o.filter(F.col("o_orderdate") >= cuts[1])
    dim = scd2_merge(None, b0, *KEY)
    dim = scd2_merge(dim, b1, *KEY)
    dim = scd2_merge(dim, b2, *KEY)
    assert _rows(dim) == _rows(scd2_timeline(o, *KEY))


def test_merge_leaves_untouched_keys_alone(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    half = o.filter(F.col("o_custkey") % 2 == 0)
    dim = scd2_timeline(half, *KEY)
    # batch touches only odd keys — even keys' rows must pass through
    batch = o.filter(
        (F.col("o_custkey") % 2 == 1)
        & (F.col("o_orderdate") >= dt.datetime(1999, 1, 1))
    )
    merged = scd2_merge(dim, batch, *KEY)
    assert _rows(merged.filter(F.col("o_custkey") % 2 == 0)) == _rows(dim)


def test_same_instant_flip_resolved_by_tiebreak(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1), "A", 10),
        (1, dt.datetime(2024, 1, 1), "B", 20),  # same instant, later key
        (1, dt.datetime(2024, 2, 1), "B", 30),  # extends the B run
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp, o_orderstatus string, o_orderkey long"
    )
    t = scd2_timeline(df, *KEY).orderBy("version").collect()
    assert [(r["o_orderstatus"], r["version"], r["n_observations"]) for r in t] == [
        ("A", 1, 1), ("B", 2, 2),
    ]
    # A's interval closes at the SAME instant B opens
    assert t[0]["eff_to"] == t[1]["eff_from"]
    assert t[1]["is_current"] and not t[0]["is_current"]


def test_asof_lookup_returns_covering_version(spark, sf_dir):
    """Every order, joined as-of its own date, lands in exactly one
    version (no row loss, no fanout), and the looked-up state is the
    LAST observation at-or-before that instant — at a same-instant
    status flip the earlier observation's run is the empty interval
    [t, t), so the survivor is the tiebreak-last sibling's state."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    dim = scd2_timeline(o, *KEY)
    last_at_instant = W.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    facts = o.select(
        "o_custkey",
        F.col("o_orderdate").alias("fts"),
        F.first("o_orderstatus").over(last_at_instant).alias("expected"),
        "o_orderkey",
    )
    hit = asof_dim_lookup(facts, dim, "o_custkey", "fts")
    assert hit.count() == o.count()
    assert hit.filter(
        F.col("o_orderstatus").isNull()
        | (F.col("o_orderstatus") != F.col("expected"))
    ).count() == 0


def test_single_observation_and_null_state(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1), None, 1),
        (1, dt.datetime(2024, 2, 1), None, 2),   # same (null) state: collapses
        (1, dt.datetime(2024, 3, 1), "X", 3),
        (2, dt.datetime(2024, 1, 5), "Y", 4),
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp, o_orderstatus string, o_orderkey long"
    )
    t = scd2_timeline(df, *KEY)
    got = {
        (r["o_custkey"], r["version"]): (r["o_orderstatus"], r["n_observations"])
        for r in t.collect()
    }
    assert got == {
        (1, 1): (None, 2),
        (1, 2): ("X", 1),
        (2, 1): ("Y", 1),
    }


def test_merge_exact_at_same_instant_prior_runs(spark):
    """Regression (review repro): a dim holding a same-instant flip
    (two runs sharing eff_from, the earlier one zero-length) must merge
    a later batch into EXACTLY the full rebuild — the collapsed runs
    re-expand at their ORIGINAL tiebreaks (first_tb), so their relative
    order is data, not shuffle luck."""
    rows0 = [
        (1, dt.datetime(2024, 1, 1), "A", 10),
        (1, dt.datetime(2024, 1, 1), "B", 20),  # same instant
    ]
    later = [(1, dt.datetime(2024, 2, 1), "B", 30)]
    schema = "o_custkey long, o_orderdate timestamp, o_orderstatus string, o_orderkey long"
    b0 = spark.createDataFrame(rows0, schema)
    b1 = spark.createDataFrame(later, schema)
    # build the dim under an adversarial physical order (B row first)
    dim = scd2_merge(None, b0.orderBy(F.col("o_orderkey").desc()), *KEY)
    merged = scd2_merge(dim, b1, *KEY)
    want = scd2_timeline(b0.unionByName(b1), *KEY)
    assert _rows(merged) == _rows(want)
    got = sorted(
        (r["o_orderstatus"], r["version"], r["n_observations"])
        for r in merged.collect()
    )
    assert got == [("A", 1, 1), ("B", 2, 2)]
