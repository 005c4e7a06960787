"""Broadcast-hint discipline for the 100 TB north star.

An explicit ``F.broadcast`` hint OVERRIDES the session's
``spark.sql.autoBroadcastJoinThreshold`` (64 MB here) unconditionally: a
hint on a table that scales with the fact data pins a broadcast-hash-join
plan that ships the whole table to every executor regardless of its actual
size. At TPC-H SF 100k (the ~100 TB north star) ``customer`` is ~2.5 TB and
``part`` ~2 TB — a pinned broadcast is a guaranteed executor/driver OOM,
where the unhinted plan degrades gracefully to a sort-merge join.

The repo-wide rule (enforced by
``tests/test_plan_properties.py::test_no_broadcast_hint_on_scaled_scan``):

- ``F.broadcast`` may hint only frames whose size is bounded independent
  of the fact scale: fixed-cardinality dims (``nation`` = 25 rows,
  ``region`` = 5 rows at EVERY scale factor), aggregates over bounded
  domains (per-brand, per-event-type, per-day, scalar totals), top-k
  results, and explicit query/eval sets.
- sf-scaled base tables (``part``, ``customer``, ``supplier``, ``orders``,
  ``lineitem``, ``events``, ``documents``, ``embeddings``) and their
  row-preserving projections/filters get NO hint. The session threshold +
  AQE pick a broadcast join at runtime when the ACTUAL size fits (it does
  at bench SF, so bench plans are unchanged) and a shuffle join when it
  doesn't.

``scaled_dim`` is the no-op marker used at former hint sites: it makes the
absence of a hint a deliberate, greppable decision rather than an
oversight, and gives the plan-guard test a positive signal to count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scaled_dim(df: DataFrame) -> DataFrame:
    """Mark a join side that LOOKS like a dimension but scales with the
    fact data (part/customer/supplier/orders at TPC-H scale factors).

    Deliberately NOT a broadcast hint: Spark's planner broadcasts it
    anyway at small SF (runtime size < autoBroadcastJoinThreshold, AQE
    re-plans shuffle joins into broadcast joins from actual sizes) and
    falls back to sort-merge at 100 TB where a pinned broadcast would OOM.
    """
    return df
