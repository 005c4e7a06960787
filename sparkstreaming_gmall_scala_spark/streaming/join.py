"""J1/J2 — watermarked stream-stream equi-join.

Reference: dws/OrderWideApp.scala:91-131 — both streams windowed
``window(Seconds(20), Seconds(5))``, paired by order_id, joined per batch;
the 4× sliding-window overlap re-emits each pair, deduplicated by a Redis
set with a 600 s TTL (J2).

Spark-first: a single watermarked stream-stream inner join. The watermark
delay encodes the reference's 20 s drop horizon (a detail arriving >20 s
after its order header silently never joins — SURVEY.md §2.9 "late
data"); SS emits each pair exactly once, so the entire J2 dedup layer
disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_equi_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    horizon: str = "20 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on an equi-key within ±horizon event time.

    ``how="inner"`` is the reference's J1 semantics. ``how="left_outer"``
    adds the half the reference CANNOT express (its per-batch join just
    drops unmatched headers): a left row with no partner emits ONCE,
    null-padded, as soon as the watermark passes its join horizon —
    i.e. when the engine can PROVE no matching right row can still
    arrive. State stays bounded either way (rows age out of the join
    buffers at the same watermark). Batch frames join with the same
    range predicate (the oracle form, `windowed_order_join` in
    plans/parity.py, is the inner batch analog).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    l = left.alias("l")
    r = right.alias("r")
    if left.isStreaming:
        l = left.withWatermark(left_ts, horizon).alias("l")
    if right.isStreaming:
        r = right.withWatermark(right_ts, horizon).alias("r")
    cond = (F.col(f"l.{left_key}") == F.col(f"r.{right_key}")) & (
        F.col(f"r.{right_ts}")
        >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {horizon}")
    ) & (
        F.col(f"r.{right_ts}")
        <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {horizon}")
    )
    return l.join(r, cond, how)
