"""Z-order layout (operators/zorder.py): injective interleave, envelope
pruning is lossless, and the clustering actually buys multi-dimensional
pruning over a single-column sort."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W, functions as F

from sparkstreaming_gmall_scala_spark.operators.zorder import (
    bucket_envelopes,
    with_zvalue,
    z_expr_sql,
    zorder_buckets,
    zorder_write,
)
from sparkstreaming_gmall_scala_spark.sources import load_table

COLS = ("l_partkey", "l_suppkey")


def test_interleave_is_injective_on_masked_domain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(*COLS)
    z = with_zvalue(li, COLS, bits=16)
    n_pairs = li.distinct().count()
    assert z.select("zval").distinct().count() == n_pairs


def test_overflow_guard():
    with pytest.raises(ValueError):
        z_expr_sql(("a", "b", "c", "d"), bits=16)  # 64 bits


def _candidates(env_rows, col_min, col_max, col):
    return [
        r["bucket"]
        for r in env_rows
        if not (r[f"{col}_max"] < col_min or r[f"{col}_min"] > col_max)
    ]


def test_zorder_prunes_on_both_dimensions(spark, sf_dir):
    """16 buckets, slice predicate on l_suppkey only: a layout sorted by
    l_partkey cannot prune at all (every bucket spans the full suppkey
    domain), the z-layout prunes most buckets. Same check on l_partkey:
    the z-layout still prunes (coarser than a dedicated sort, the
    sqrt tradeoff)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", *COLS
    )
    nb = 16
    zb = zorder_buckets(li, COLS, nb, tiebreak=("l_orderkey", "l_linenumber"))
    zenv = bucket_envelopes(zb, COLS).collect()

    one_dim = li.withColumn(
        "bucket",
        F.ntile(nb).over(W.orderBy("l_partkey", "l_orderkey")).cast("long"),
    )
    oenv = bucket_envelopes(one_dim, COLS).collect()

    # a thin suppkey slice: bottom ~10% of the domain
    smax = li.agg(F.max("l_suppkey")).collect()[0][0]
    lo, hi = 1, max(2, smax // 10)
    z_cand = _candidates(zenv, lo, hi, "l_suppkey")
    o_cand = _candidates(oenv, lo, hi, "l_suppkey")
    assert len(o_cand) == nb  # partkey sort is blind to suppkey
    assert len(z_cand) < nb // 2, (len(z_cand), nb)

    # a thin partkey slice: z still prunes
    pmax = li.agg(F.max("l_partkey")).collect()[0][0]
    z_cand_p = _candidates(zenv, 1, max(2, pmax // 10), "l_partkey")
    assert len(z_cand_p) < nb, len(z_cand_p)


def test_envelope_pruned_read_is_lossless(spark, sf_dir, tmp_path):
    """Write the layout, prune buckets by envelope intersection, read
    only the surviving partitions: the filtered result must equal the
    full-scan filter — envelope pruning never drops a matching row."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", *COLS
    )
    path = str(tmp_path / "zlay")
    zorder_write(li, COLS, path, n_buckets=8, tiebreak=("l_orderkey", "l_linenumber"))

    back = spark.read.parquet(path)
    env = bucket_envelopes(back, COLS).collect()
    smax = li.agg(F.max("l_suppkey")).collect()[0][0]
    lo, hi = 1, max(2, smax // 5)
    keep = _candidates(env, lo, hi, "l_suppkey")
    assert 0 < len(keep) < 8

    pruned = back.filter(F.col("bucket").isin(keep)).filter(
        F.col("l_suppkey").between(lo, hi)
    )
    want = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in li.filter(F.col("l_suppkey").between(lo, hi)).collect()
    )
    got = sorted(
        (r["l_orderkey"], r["l_linenumber"]) for r in pruned.collect()
    )
    assert got == want

    # the bucket filter IS partition pruning on the read: fewer files
    # touched than the full layout
    all_files = set(back.inputFiles())
    pruned_files = set(
        spark.read.parquet(path).filter(F.col("bucket").isin(keep)).inputFiles()
    )
    assert len(pruned_files) <= len(all_files)


def test_bucket_assignment_is_deterministic(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", *COLS
    )
    a = zorder_buckets(li, COLS, 8, tiebreak=("l_orderkey", "l_linenumber"))
    b = zorder_buckets(li, COLS, 8, tiebreak=("l_orderkey", "l_linenumber"))
    key = ["l_orderkey", "l_linenumber"]
    assert (
        a.select(*key, "bucket")
        .exceptAll(b.select(*key, "bucket"))
        .count()
        == 0
    )
