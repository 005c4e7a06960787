"""Partition-grained idempotent ingest (streaming/partition_ingest.py):
the lake-first exactly-once — replayed batches overwrite exactly their
own partitions with identical content and touch nothing else."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.partition_ingest import (
    _batch_bounds,
    _write_batch,
    ingest_events_partitioned,
    read_ingested_events,
)


def _rollup(df):
    return {
        tuple(r)
        for r in df.groupBy(
            F.col("dt").cast("string").alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_ingest_with_replay_matches_raw(spark, sf_dir):
    """The builder already replays batch 2; the table must still equal
    the raw events table row-for-row at rollup granularity."""
    ev = read_ingested_events(spark, sf_dir)
    raw = load_table(spark, sf_dir, "events").withColumn(
        "dt", F.to_date("ts")
    )
    assert ev.count() == raw.count()
    assert _rollup(ev) == _rollup(raw)


def test_replaying_one_batch_leaves_other_partitions_untouched(
    spark, sf_dir
):
    """Dynamic partition overwrite scope: re-delivering batch 0 must not
    rewrite (or even touch) a partition owned by batch 2."""
    work = ingest_events_partitioned(spark, sf_dir)
    raw_b = load_table(spark, sf_dir, "events").withColumn(
        "dt", F.to_date("ts")
    )
    bounds = _batch_bounds(raw_b)
    # a partition owned by the LAST batch: snapshot its files
    lo = bounds[-1][0]
    victim = os.path.join(work, f"dt={lo}")
    before = {
        (os.path.basename(p), os.path.getsize(p), os.path.getmtime(p))
        for p in glob.glob(os.path.join(victim, "*.parquet"))
    }
    assert before, f"no parquet files under {victim}"

    raw = raw_b
    b0_lo, b0_hi = bounds[0]
    batch0 = raw.filter(
        (F.col("dt") >= F.lit(b0_lo)) & (F.col("dt") <= F.lit(b0_hi))
    )
    _write_batch(batch0, work)

    after = {
        (os.path.basename(p), os.path.getsize(p), os.path.getmtime(p))
        for p in glob.glob(os.path.join(victim, "*.parquet"))
    }
    assert after == before  # untouched, not merely equal-content

    # and the table as a whole is still exactly the raw table
    assert read_ingested_events(spark, sf_dir).count() == raw.count()


def test_compaction_lifecycle_invisible_and_single_file(spark, sf_dir):
    """events_compacted_rollup's builder: fragmented ingest + replay +
    compaction leaves exactly one file per partition AND the table is
    row-identical to the raw events table (layout independence — the
    compaction-lifecycle contract the catalog entry hash-checks)."""
    from sparkstreaming_gmall_scala_spark.sources.partitioned import (
        partition_file_counts,
    )
    from sparkstreaming_gmall_scala_spark.streaming.partition_ingest import (
        ingest_events_compacted,
        read_compacted_events,
    )

    work = ingest_events_compacted(spark, sf_dir)
    counts = partition_file_counts(work)
    assert counts and all(n == 1 for n in counts.values()), counts
    ev = read_compacted_events(spark, sf_dir)
    raw = load_table(spark, sf_dir, "events").withColumn(
        "dt", F.to_date("ts")
    )
    assert ev.count() == raw.count()
    assert _rollup(ev) == _rollup(raw)


def test_batch_bounds_cover_data_contiguously(spark, sf_dir):
    """r13 advice: bounds are DERIVED from min/max(dt), so no event can
    fall outside any batch — contiguous day ranges, first/last pinned to
    the data's own extremes."""
    import datetime

    raw = load_table(spark, sf_dir, "events").withColumn(
        "dt", F.to_date("ts")
    )
    lo, hi = raw.agg(F.min("dt"), F.max("dt")).first()
    bounds = _batch_bounds(raw)
    assert bounds[0][0] == lo and bounds[-1][1] == hi
    for (a_lo, a_hi), (b_lo, b_hi) in zip(bounds, bounds[1:]):
        assert a_lo <= a_hi and b_lo == a_hi + datetime.timedelta(days=1)


def test_read_paths_fail_loud_outside_utc(spark, sf_dir):
    """r13 advice: the cache-HIT read paths replicate load_table's UTC
    session-timezone guard instead of silently shifting hour(ts)."""
    import pytest

    from sparkstreaming_gmall_scala_spark.sources.partitioned import (
        read_partitioned_events,
    )

    # warm both caches under UTC so the non-UTC call is a pure cache hit
    read_ingested_events(spark, sf_dir).count()
    read_partitioned_events(spark, sf_dir).count()
    spark.conf.set("spark.sql.session.timeZone", "Asia/Shanghai")
    try:
        with pytest.raises(ValueError, match="UTC session timezone"):
            read_ingested_events(spark, sf_dir)
        with pytest.raises(ValueError, match="UTC session timezone"):
            read_partitioned_events(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_schema_evolution_read_models_case_on_date(spark, sf_dir):
    """The mergeSchema read of the evolved table: union schema, value
    NULL exactly on pre-evolution partitions, no row lost."""
    from sparkstreaming_gmall_scala_spark.streaming.partition_ingest import (
        read_evolving_events,
    )

    ev = read_evolving_events(spark, sf_dir)
    raw = load_table(spark, sf_dir, "events").withColumn(
        "dt", F.to_date("ts")
    )
    assert ev.count() == raw.count()
    assert "value" in ev.columns
    bounds = _batch_bounds(raw, 2)
    split = bounds[0][1]
    # value is NULL iff the row's partition predates the evolution
    n_bad = ev.filter(
        (F.col("dt") <= F.lit(split)) != F.col("value").isNull()
    ).count()
    assert n_bad == 0
    # and the valued half carries the raw values exactly
    got = {
        (r["event_id"], r["value"])
        for r in ev.filter(F.col("dt") > F.lit(split))
        .select("event_id", "value")
        .collect()
    }
    expect = {
        (r["event_id"], r["value"])
        for r in raw.filter(F.col("dt") > F.lit(split))
        .select("event_id", "value")
        .collect()
    }
    assert got == expect and got
