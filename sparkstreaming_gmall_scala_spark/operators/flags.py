"""Per-key first-event flagging (the reference's first-order machinery).

The reference computes ``if_first_order`` in two steps: an existence probe
against the ``USER_STATUS`` state table (anti-join-as-flag, reference:
dwd/OrderInfoApp.scala:92-117) and an intra-batch correction that sorts
each user's orders by ``create_time`` and demotes all but the earliest
(reference: dwd/OrderInfoApp.scala:121-157, a manual groupByKey+sortWith).

Spark-first both collapse into window functions / left-anti joins — no
external state table is needed in batch; the streaming variant keeps the
state in the checkpointed store (see streaming/).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def first_event_flag(
    df: DataFrame,
    key: str,
    order_by: list[str | Column],
    flag_col: str = "if_first",
) -> DataFrame:
    """Add ``flag_col`` = '1' on each key's earliest row else '0'.

    ``order_by`` must be a total order (include a unique tiebreaker) so the
    result is deterministic — the reference sorts only by ``create_time``
    and is nondeterministic on ties; we fix that and document it.
    """
    w = Window.partitionBy(key).orderBy(*order_by)
    rn = F.row_number().over(w)
    return df.withColumn(flag_col, F.when(rn == 1, "1").otherwise("0"))


def members_only(df: DataFrame, state: DataFrame, key: str, how: str) -> DataFrame:
    """Existence probe against a state/dim table: ``how`` is ``left_semi``
    (seen before) or ``left_anti`` (never seen) — the reference's
    `user_id IN (SELECT ...)` membership test without the hand-built
    IN-list SQL (reference: dwd/OrderInfoApp.scala:99-101)."""
    return df.join(state, on=key, how=how)
