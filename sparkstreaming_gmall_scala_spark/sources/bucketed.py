"""Bucketed-table storage: the co-located-join path for 100 TB facts.

The reference re-shuffles on every join because its data lives in Kafka
topics keyed by producer whim (reference: dws/OrderWideApp.scala:98-111
keys and joins per batch). The lake-first equivalent is to pay the
shuffle ONCE at ingest: `bucketBy(n, key)` writes each table pre-hashed
on the join key, after which every join between tables bucketed on the
same key with the same bucket count is exchange-free — Catalyst sees the
compatible HashPartitioning from the scan and elides the shuffle
entirely (verified by plan assertion in tests/test_bucketed.py).

At 100 TB this is the difference between shuffling the fact table per
query and never shuffling it at all; bucket count is chosen once per
table (~target partition size) and shared by all co-bucketed tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by the join key.
    Sorting within buckets additionally lets sort-merge joins skip their
    sort phase."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str]
) -> DataFrame:
    """Join two co-bucketed tables — exchange-free when both were written
    with write_bucketed on the join key with equal bucket counts."""
    return spark.table(left_table).join(spark.table(right_table), on)
