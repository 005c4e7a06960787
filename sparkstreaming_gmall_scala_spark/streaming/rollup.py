"""W3 — watermarked tumbling-window aggregate: the canonical Structured
Streaming shape (continuous aggregate / hypertable rollup). The batch
analog is plans/streaming_analog.py::hourly_event_rollup; this live form
maintains it incrementally:

- ``withWatermark(ts, delay)`` bounds state: a window's partial aggregate
  lives only until the watermark passes its end;
- append output mode emits each window EXACTLY ONCE, when it closes —
  the idempotent ledger shape (a closed window never re-emits, so the
  per-batch sink directories are final);
- rows later than the watermark are dropped by the engine — the
  reference's 20 s join-window drop horizon (dws/OrderWideApp.scala:91)
  generalized to aggregation.

State at 100 TB: one partial aggregate per (open window × event_type) —
bounded by delay/window-size, independent of stream length; sums are
per-row-rounded integer cents so replays and partition order cannot
change a result by an ulp.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sinks.batch import IdempotentBatchWriter
from .pipelines import EVENT_SCHEMA
from .sources import file_stream


def windowed_rollup(
    events,
    window: str = "1 hour",
    delay: str = "10 minutes",
    slide: str | None = None,
):
    """The transformation alone (works on a batch OR streaming frame).

    ``slide`` < ``window`` makes it a HOPPING rollup: each event lands
    in window/slide overlapping windows (assigned executor-side by
    F.window — an explode, no self-join), each of which still emits
    exactly once when the watermark passes its end. Open-state grows by
    the same window/slide factor — bounded by delay/slide, independent
    of stream length. Batch twin: plans/temporal.py:hopping_event_stats.
    """
    return (
        events.withWatermark("ts", delay)
        .groupBy(
            F.window(F.col("ts"), window, slide or window).alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("sum_value_cents"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value_cents",
        )
    )


def hourly_rollup_pipeline(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint: str,
    window: str = "1 hour",
    delay: str = "10 minutes",
):
    """Event stream → append-mode windowed rollup (one emission per
    closed window) → per-batch idempotent sink."""
    events = file_stream(spark, src_dir, EVENT_SCHEMA)
    sink = IdempotentBatchWriter(out_dir)
    return (
        windowed_rollup(events, window, delay)
        .writeStream.foreachBatch(lambda df, bid: sink(df, bid))
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def hopping_rollup_pipeline(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint: str,
    window: str = "6 hours",
    slide: str = "1 hour",
    delay: str = "10 minutes",
):
    """Event stream → append-mode HOPPING rollup (window > slide; each
    of the window/slide overlapping windows emits exactly once when it
    closes) → per-batch idempotent sink. The live form of
    plans/temporal.py:hopping_event_stats."""
    events = file_stream(spark, src_dir, EVENT_SCHEMA)
    sink = IdempotentBatchWriter(out_dir)
    return (
        windowed_rollup(events, window, delay, slide=slide)
        .writeStream.foreachBatch(lambda df, bid: sink(df, bid))
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
