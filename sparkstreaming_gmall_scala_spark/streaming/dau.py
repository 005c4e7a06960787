"""A2 — streaming distinct (the DAU pipeline).

Reference: app/DauApp.scala:85-104 — first event per (day, device) passes,
implemented as Redis ``SADD dau:{dt}`` with a 24 h TTL; survivors get
dt/hr derivations and are bulk-upserted into a date-partitioned ES index
keyed by device id (app/DauApp.scala:107-139).

Spark-first: ``withWatermark(24h) + dropDuplicates([dt, user])`` — the
watermark IS the TTL (state for day D evicts once event time passes
D+24h), and checkpointing makes replays emit nothing new, reproducing the
Redis set's idempotence without external infrastructure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dates import dt_of, hr_of


def dau_distinct(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "24 hours",
) -> DataFrame:
    """First event per (day, user): the streaming-distinct core.

    Works on both streaming and batch frames (dropDuplicates is the same
    API; the watermark only applies when streaming).
    """
    with_dt = events.withColumn("dt", dt_of(F.col(ts_col))).withColumn(
        "hr", hr_of(F.col(ts_col))
    )
    if with_dt.isStreaming:
        with_dt = with_dt.withWatermark(ts_col, watermark)
    return with_dt.dropDuplicates(["dt", user_col])
