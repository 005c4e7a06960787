"""Streaming sessionization — the live twin of the ``sessionize`` batch
analog (plans/streaming_analog.py).

Spark-first: ``F.session_window(ts, gap)`` is the built-in stateful
session operator — state merges adjacent windows per key and evicts when
the watermark passes a session's close, so the 30-min gap semantics cost
no custom state code at all (the reference has no sessionization; this is
part of the §7 extension surface). Watermark delay bounds how late an
event may arrive and still extend a session — later than that, it starts
a (correctly) separate session, mirroring the DStream-era silent-drop
horizon made explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per (user, session) event counts + session bounds via the native
    session_window — works on streaming frames (append output once the
    watermark closes a session) and batch frames (immediate)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
