"""Partition-grained idempotent ingest (streaming/partition_ingest.py):
the lake-first exactly-once — replayed batches overwrite exactly their
own partitions with identical content and touch nothing else."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.sources import load_table
from sparkstreaming_gmall_scala_spark.streaming.partition_ingest import (
    _BATCH_BOUNDS,
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
    # a partition owned by the LAST batch (2024-01-21..): snapshot files
    lo = _BATCH_BOUNDS[2][0]
    victim = os.path.join(work, f"dt={lo}")
    before = {
        (os.path.basename(p), os.path.getsize(p), os.path.getmtime(p))
        for p in glob.glob(os.path.join(victim, "*.parquet"))
    }
    assert before, f"no parquet files under {victim}"

    raw = load_table(spark, sf_dir, "events").withColumn(
        "dt", F.to_date("ts")
    )
    b0_lo, b0_hi = _BATCH_BOUNDS[0]
    batch0 = raw.filter(
        (F.col("dt") >= F.lit(b0_lo).cast("date"))
        & (F.col("dt") <= F.lit(b0_hi).cast("date"))
    )
    _write_batch(batch0, work)

    after = {
        (os.path.basename(p), os.path.getsize(p), os.path.getmtime(p))
        for p in glob.glob(os.path.join(victim, "*.parquet"))
    }
    assert after == before  # untouched, not merely equal-content

    # and the table as a whole is still exactly the raw table
    assert read_ingested_events(spark, sf_dir).count() == raw.count()
