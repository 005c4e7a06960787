"""A4-a — stateful payment allocation, exact streaming parity.

Reference: dws/OrderWideApp.scala:134-178 — per order, each arriving
detail takes ``round(final_total * amount / original_total, 2)``, except
the detail that exhausts the order (its amount equals the original total
minus the origin-sum so far), which takes ``final_total - split_sum`` so
the shares sum to the total exactly; the two running sums live in Redis
strings with a 600 s TTL (dws/OrderWideApp.scala:167-172).

Spark-first: ``applyInPandasWithState`` keyed by order id holds
``(origin_sum_cents, split_sum_cents)``. Sums are integer cents — the
reference's ``detailAmount == originalTotal - originSum`` equality test on
doubles is a float-equality landmine; cents make it exact and
deterministic.

State TTL is EVENT-time (watermark + 600 s), not the reference's
processing-time Redis expiry. Deliberate: with
``GroupStateTimeout.ProcessingTimeTimeout`` a micro-batch engine schedules
a state-cleanup batch on EVERY trigger, so an idle query spins empty
batches forever (and ``availableNow`` drains never terminate — observed:
hundreds of empty batches and an eventual StackOverflowError in the file
source). EventTimeTimeout ties cleanup to watermark advance, which only
happens when data arrives — at 100 TB that's the difference between state
GC proportional to data and state GC proportional to wall clock.

The batch formulation (operators/allocation.py, oracle-checked) is the
order-insensitive spec; this streaming variant reproduces the reference's
arrival-order behavior for details split across micro-batches. Rows
WITHIN a batch are processed in (detail_id) order for determinism.

Scale: state is two longs per in-flight order, partitioned by order id —
the same shuffle key the downstream sinks want; skewed hot orders don't
exist (an order has bounded details), so no salting needed here.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.LongType()),
        T.StructField("detail_id", T.LongType()),
        T.StructField("final_detail_amount", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("origin_sum_cents", T.LongType()),
        T.StructField("split_sum_cents", T.LongType()),
    ]
)


def _cents(x: float) -> int:
    # Half-up to cents, the reference's Math.round(x*100) semantics.
    return int(x * 100 + 0.5)


def _make_allocator(ttl_ms: int):
    def _allocate_group(
        key: tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        origin_sum, split_sum = state.get if state.exists else (0, 0)
        (order_id,) = key
        out_detail: list[int] = []
        out_amount: list[float] = []
        max_ts_ms = 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values("detail_id")
            if len(pdf):
                max_ts_ms = max(
                    max_ts_ms, int(pdf["ts"].max().timestamp() * 1000)
                )
            for row in pdf.itertuples(index=False):
                amount_c = _cents(row.amount)
                original_c = _cents(row.original_total)
                final_c = _cents(row.final_total)
                if amount_c == original_c - origin_sum:
                    share_c = final_c - split_sum  # last detail: residual
                else:
                    # round(final_total * amount / original_total, 2), in cents
                    share_c = int(final_c * row.amount / row.original_total + 0.5)
                origin_sum += amount_c
                split_sum += share_c
                out_detail.append(int(row.detail_id))
                out_amount.append(share_c / 100.0)
        state.update((origin_sum, split_sum))
        # Evict once event time passes the order's last activity by TTL.
        # Anchor on the group's max event time, NOT the current watermark:
        # in the first batch the watermark is still 0, and a 0-anchored
        # timeout expires the instant a restarted query loads the real
        # watermark from the checkpoint (state would silently vanish
        # across restarts). Must still exceed the watermark or Spark
        # rejects the timestamp.
        state.setTimeoutTimestamp(
            max(max_ts_ms, state.getCurrentWatermarkMs() + 1) + ttl_ms
        )
        yield pd.DataFrame(
            {
                "order_id": order_id,
                "detail_id": out_detail,
                "final_detail_amount": out_amount,
            }
        )

    return _allocate_group


def allocate_stateful(
    details: DataFrame,
    ts_col: str = "ts",
    ttl: str = "600 seconds",
    ttl_ms: int = 600_000,
) -> DataFrame:
    """Streaming allocation over a detail stream with columns
    ``order_id, detail_id, ts, amount, original_total, final_total``.

    Emits one row per detail as it arrives, with cross-batch running sums
    in the state store; per-order state evicts once the watermark passes
    last activity + TTL (the reference's 600 s Redis expiry, in event
    time). Invariant (tested): once all of an order's details have
    arrived, Σ final_detail_amount == final_total exactly.
    """
    if details.isStreaming:
        details = details.withWatermark(ts_col, ttl)
    return details.groupBy("order_id").applyInPandasWithState(
        _make_allocator(ttl_ms),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
