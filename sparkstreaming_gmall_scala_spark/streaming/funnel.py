"""Streaming conversion funnel: exact at any arrival order.

The tempting incremental design — per-user (first_view, first_click,
first_purchase) accumulators updated per batch — is WRONG under late
data: a late early view can retroactively qualify a click the
accumulator already discarded, and no bounded per-user scalar state can
recover it. Funnel stages are order-dependent joins, not monotone mins.

The exact design stores the minimal sufficient state instead: an
append-only index of just the funnel-relevant event projection
((user_id, event_type, ts, event_id), view/click/purchase only — the
projection funnel analytics systems persist). Ingest is O(batch) and
trivially replay-idempotent (identity rows, the AppendOnlyIndex crash
contract applies unchanged, inline compaction included); the report
runs the SAME three-stage aggregation as the batch ``event_funnel``
catalog query over the index, so streamed results are exactly the
batch results over the union of batches — pinned in tests including an
out-of-order late-arrival batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.batch import AppendOnlyIndex
from .sources import file_stream

FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_ingest_batch(
    spark: SparkSession,
    index_dir: str,
    compact_every: int | None = None,
):
    """Per-batch body: project the funnel-relevant events and append.
    The event_id key makes rows identity-semantic (duplicate deliveries
    and compaction-crash duplicates collapse in the report's dedup)."""
    index = AppendOnlyIndex(index_dir)
    if compact_every is not None and compact_every < 1:
        raise ValueError("compact_every must be >= 1")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        ev = batch_df.filter(
            F.col("event_type").isin(*FUNNEL_STAGES)
        ).select("event_id", "user_id", "event_type", "ts")
        index.append(ev.dropDuplicates(["event_id"]), batch_id)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            index.compact(spark, upto_batch_id=batch_id - 1)

    return process


def funnel_report(spark: SparkSession, index_dir: str) -> DataFrame:
    """(stage, stage_ord, n_users) over everything ingested — the same
    strict ordered semantics as the ``event_funnel`` catalog query:
    first view, first click after it, any purchase after that click."""
    ev = (
        AppendOnlyIndex(index_dir)
        .read(spark)
        .dropDuplicates(["event_id"])
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .select("user_id")
        .distinct()
    )

    def stage(name: str, ord_: int, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"),
            F.lit(ord_).alias("stage_ord"),
            "n_users",
        )

    return (
        stage("view", 1, v)
        .unionByName(stage("click_after_view", 2, c))
        .unionByName(stage("purchase_after_click", 3, p))
    )


def funnel_pipeline(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    checkpoint: str,
    schema,
    compact_every: int | None = None,
):
    """Event file-drop stream → incrementally grown funnel event index."""
    ev = file_stream(spark, src_dir, schema)
    return (
        ev.writeStream.foreachBatch(
            funnel_ingest_batch(spark, index_dir, compact_every)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def events_ingest_batch(
    spark: SparkSession,
    index_dir: str,
    compact_every: int | None = None,
):
    """Unfiltered sibling of ``funnel_ingest_batch``: append every
    event's (event_id, user_id, event_type, ts) projection — the shared
    analytics index ``retention_report`` (all event types count as
    activity) and ``funnel_report``-style readers draw from."""
    index = AppendOnlyIndex(index_dir)
    if compact_every is not None and compact_every < 1:
        raise ValueError("compact_every must be >= 1")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        ev = batch_df.select("event_id", "user_id", "event_type", "ts")
        index.append(ev.dropDuplicates(["event_id"]), batch_id)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            index.compact(spark, upto_batch_id=batch_id - 1)

    return process


def retention_report(spark: SparkSession, index_dir: str) -> DataFrame:
    """(cohort_day, day_offset, n_users) over everything ingested — the
    exact ``user_retention`` catalog semantics (first-activity-day
    cohorts × activity-day offsets), correct under late data for the
    same reason as the funnel: a late early event moves a user's cohort
    day retroactively, which bounded per-user state cannot undo but a
    recompute over the sufficient projection does for free."""
    ev = (
        AppendOnlyIndex(index_dir)
        .read(spark)
        .dropDuplicates(["event_id"])
    )
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    cohort = act.groupBy("user_id").agg(F.min("day").alias("c0"))
    return (
        act.join(cohort, "user_id")
        .groupBy(
            F.date_format("c0", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "c0").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def analytics_mart_batch(
    spark: SparkSession,
    events_index_dir: str,
    ohlc_index_dir: str,
    ohlc_event_type: str = "purchase",
    compact_every: int | None = None,
):
    """One event stream → every analytics mart (the reference's
    ODS→DWD→DWS fan-out as a single foreachBatch body): the batch lands
    ONCE into (a) the sufficient-projection event index that serves
    ``funnel_report`` and ``retention_report``, and (b) the algebraic
    OHLC partial-bar index — each batch is read once, each mart pays
    only its own O(batch) projection/aggregate, and every sink keeps its
    own replay/compaction contract. Reports stay on-demand reads; no
    mart ever re-scans the stream."""
    from .ohlc import ohlc_ingest_batch

    ev_body = events_ingest_batch(spark, events_index_dir, compact_every)
    ohlc_body = ohlc_ingest_batch(
        spark, ohlc_index_dir, ohlc_event_type, compact_every
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.persist()
        try:
            ev_body(b, batch_id)
            ohlc_body(b, batch_id)
        finally:
            b.unpersist()

    return process


def analytics_mart_pipeline(
    spark: SparkSession,
    src_dir: str,
    events_index_dir: str,
    ohlc_index_dir: str,
    checkpoint: str,
    schema,
    compact_every: int | None = None,
):
    """Event file-drop stream → all analytics marts, one checkpointed
    query."""
    ev = file_stream(spark, src_dir, schema)
    return (
        ev.writeStream.foreachBatch(
            analytics_mart_batch(
                spark, events_index_dir, ohlc_index_dir,
                compact_every=compact_every,
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
