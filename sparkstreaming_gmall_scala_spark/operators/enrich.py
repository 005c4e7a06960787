"""Dimension-enrichment joins.

The reference enriches fact streams against dimension tables two ways —
a per-batch driver-side fetch + broadcast Map (reference:
dwd/OrderInfoApp.scala:194-221, dim/SkuInfoApp.scala:60-109) and a
per-partition batched IN-list JDBC probe (reference:
dwd/OrderInfoApp.scala:227-253, dwd/OrderDetailApp.scala:64-93). Both are
LEFT joins by construction: a missing dim row leaves the enrichment columns
null (reference: dwd/OrderInfoApp.scala:211-217).

Spark-first: a stream-static (or batch) left join with an explicit
``F.broadcast`` hint on the dim side. At 100 TB the fact side never
shuffles for these joins — the dim is shipped to the executors, which is
exactly what the reference's broadcast Map did, minus the driver
single-point fetch and with columnar pruning intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_left(
    fact: DataFrame,
    dims: list[tuple],
    broadcast_dims: bool = True,
) -> DataFrame:
    """Left-join ``fact`` against each ``(dim, fact_key, dim_key)`` or
    ``(dim, fact_key, dim_key, broadcast)``.

    Dims are broadcast by default — the reference's dims (provinces,
    SKUs, trademarks) are small relative to the fact stream. Per-dim
    ``broadcast=False`` (or global ``broadcast_dims=False``) leaves the
    choice to Catalyst/AQE — required for dims that scale with the fact
    table (a customer/user dim at 100 TB is billions of rows: force-
    broadcasting it would OOM every executor, while AQE still broadcasts
    it automatically at test scale where it fits the threshold).
    """
    out = fact
    for entry in dims:
        dim, fact_key, dim_key = entry[:3]
        broadcast = entry[3] if len(entry) > 3 else broadcast_dims
        side = F.broadcast(dim) if broadcast else dim
        out = out.join(side, on=out[fact_key] == dim[dim_key], how="left")
    return out
