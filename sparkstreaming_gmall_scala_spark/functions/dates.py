"""Date/time derivation helpers.

The reference derives ``dt`` / ``hr`` partition columns by formatting epoch
millis with SimpleDateFormat("yyyy-MM-dd HH") and splitting on the space
(reference: app/DauApp.scala:56-62), and splits fact-table
``create_time`` strings into ``create_date`` / ``create_hour``
(reference: dwd/OrderInfoApp.scala:62-66). Here they are single Column
expressions that stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dt_of(ts: Column) -> Column:
    """'yyyy-MM-dd' day string of a timestamp."""
    return F.date_format(ts, "yyyy-MM-dd")


def hr_of(ts: Column) -> Column:
    """'HH' hour-of-day string of a timestamp (two digits, as the
    reference's SimpleDateFormat emits)."""
    return F.date_format(ts, "HH")


def epoch_ms_of(ts: Column) -> Column:
    """Epoch milliseconds of a timestamp (the reference's ``ts`` long)."""
    return (F.unix_timestamp(ts).cast("long") * 1000) + (
        F.date_format(ts, "SSS").cast("long")
    )
