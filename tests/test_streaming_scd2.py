"""Streaming SCD2 (streaming/scd2.py): the maintained dim must equal
the batch timeline over the union of delivered observations — through
replay, cross-batch duplicate delivery, compaction, and LATE data (the
case the batch merge's monotone contract excludes)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.scd2 import scd2_timeline
from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.scd2 import (
    scd2_dim,
    scd2_ingest_batch,
)

KEY = ("o_custkey", "o_orderdate", ["o_orderstatus"], "o_orderkey")


def _rows(df):
    cols = [
        "o_custkey", "o_orderstatus", "eff_from", "eff_to", "version",
        "is_current", "n_observations",
    ]
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _run(spark, tmp_path, batches, compact_every=None):
    run = scd2_ingest_batch(
        spark, str(tmp_path / "log"), str(tmp_path / "dim"), *KEY,
        compact_every=compact_every,
    )
    for i, b in batches:
        run(b, i)
    return scd2_dim(spark, str(tmp_path / "dim"))


def test_streamed_dim_equals_batch_timeline(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    cut0, cut1 = dt.datetime(1997, 1, 1), dt.datetime(1999, 1, 1)
    batches = [
        (0, o.filter(F.col("o_orderdate") < cut0)),
        (1, o.filter(
            (F.col("o_orderdate") >= cut0) & (F.col("o_orderdate") < cut1))),
        (2, o.filter(F.col("o_orderdate") >= cut1)),
    ]
    dim = _run(spark, tmp_path, batches, compact_every=2)
    assert _rows(dim) == _rows(scd2_timeline(o, *KEY))


def test_late_data_rewrites_history(spark, sf_dir, tmp_path):
    """Batches sliced by orderkey mod 3 interleave event time arbitrarily
    — every key sees out-of-order observations. The log rebuild must
    still converge to the full timeline."""
    o = load_table(spark, sf_dir, "orders")
    batches = [(i, o.filter(F.col("o_orderkey") % 3 == i)) for i in range(3)]
    dim = _run(spark, tmp_path, batches)
    assert _rows(dim) == _rows(scd2_timeline(o, *KEY))


def test_replay_and_cross_batch_duplicates_are_absorbed(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    b0 = o.filter(F.col("o_orderkey") % 2 == 0)
    b1 = o.filter(F.col("o_orderkey") % 2 == 1)
    log_dir, dim_dir = str(tmp_path / "log"), str(tmp_path / "dim")
    run = scd2_ingest_batch(spark, log_dir, dim_dir, *KEY)
    run(b0, 0)
    run(b1, 1)
    want = _rows(scd2_dim(spark, dim_dir))
    assert want == _rows(scd2_timeline(o, *KEY))
    # replay batch 0 (same id) and redeliver half of b1 under a NEW id
    # (at-least-once across batch boundaries): observation identity
    # dedup must keep the dim byte-identical, n_observations included
    run(b0, 0)
    run(b1.filter(F.col("o_orderkey") % 4 == 1), 2)
    assert _rows(scd2_dim(spark, dim_dir)) == want


def test_untouched_keys_not_rewritten(spark, sf_dir, tmp_path):
    """A batch touching one key must upsert rows for that key only —
    the rebuild is semi-join-bounded, not a full-dim rewrite."""
    o = load_table(spark, sf_dir, "orders")
    some_key = o.limit(1).collect()[0]["o_custkey"]
    log_dir, dim_dir = str(tmp_path / "log"), str(tmp_path / "dim")
    run = scd2_ingest_batch(spark, log_dir, dim_dir, *KEY)
    run(o, 0)
    before = _rows(scd2_dim(spark, dim_dir))
    # second batch: a brand-new late observation for one key
    extra = spark.createDataFrame(
        [(int(some_key), dt.datetime(2030, 1, 1), "Z", 10_000_000)],
        "o_custkey long, o_orderdate timestamp, o_orderstatus string, o_orderkey long",
    )
    run(extra, 1)
    after = _rows(scd2_dim(spark, dim_dir))
    changed_keys = {
        r[0] for r in set(after) ^ set(before)
    }
    assert changed_keys == {some_key}
    # and the touched key gained exactly one current 'Z' version
    z = [r for r in after if r[0] == some_key and r[1] == "Z"]
    assert len(z) == 1 and z[0][5] is True
