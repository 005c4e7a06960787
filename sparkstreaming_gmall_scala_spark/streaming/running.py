"""W2 — cross-batch running sums as a Spark 4 arbitrary-state operator.

Reference: the Redis running totals of dws/OrderWideApp.scala:143-172
(`order_origin_sum:{id}` strings incremented per record). The modern
Spark form is ``transformWithStateInPandas``: a StatefulProcessor holding
one ValueState per key, fed Arrow batches per micro-batch — this is the
engine's showcase of the 4.x arbitrary-state API next to the older
``applyInPandasWithState`` used by streaming/allocation.py.

Determinism contract: rows are folded in (ts, event_id) order inside each
batch and batches arrive in event-time order in the tests, so the running
double sum accumulates in exactly the batch window order — output equals
the batch analog (plans/streaming_analog.py::running_user_spend) row for
row. Requires the RocksDB state store provider (set in the test, as a
real deployment would set it in spark-defaults).

Container boundary: the TWS state-server wire protocol needs
``google.protobuf``, which is not installed in this image — the
engine-side pytest skips with that reason, and the processor's Python
semantics are unit-tested against a fake ValueState instead
(tests/test_streaming.py). The tested, runnable stateful path in this
container remains ``applyInPandasWithState`` (streaming/allocation.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

try:  # pyspark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
except ImportError:  # pragma: no cover - older runtime, operator unavailable
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = object  # type: ignore[assignment,misc]

OUTPUT_SCHEMA = "user_id long, event_id long, running_spend double"


class RunningSpendProcessor(StatefulProcessor):
    """Per-user cumulative spend with a single ValueState('total')."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._total = handle.getValueState("total", "total double")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        total = self._total.get()[0] if self._total.exists() else 0.0
        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        import math

        running = []
        for v in pdf["value"]:
            total += float(v)
            # 2-dp half-up, matching the batch analog's floor(x*100+0.5)/100
            running.append(math.floor(total * 100 + 0.5) / 100)
        self._total.update((total,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(pdf),
                "event_id": pdf["event_id"].to_numpy(),
                "running_spend": running,
            }
        )

    def close(self) -> None:
        pass


def running_spend_stream(events: DataFrame) -> DataFrame:
    """Purchase events → per-user cumulative spend rows (one per event),
    state carried across micro-batches by the state store."""
    from pyspark.sql import functions as F

    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    return purchases.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningSpendProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )
