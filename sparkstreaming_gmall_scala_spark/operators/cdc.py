"""CDC-envelope parsing and table routing (the ODS layer).

The reference's two ODS apps read a binlog-CDC Kafka topic and demultiplex
records into per-table ``ods_{table}`` topics, with per-table filter rules:
Canal envelopes carry a ``data`` ARRAY and pass INSERT-only (reference:
ods/BaseDBCanalApp.scala:56-82); Maxwell envelopes carry a ``data`` object,
an 8-table allow-list, and insert-only rules for the two fact tables
(reference: ods/BaseDBMaxwellApp.scala:48-81).

Spark-first: ``from_json`` with an explicit schema → ``filter`` →
``explode`` (Canal's array) → a dynamic ``topic`` column + ``to_json``
payload, which the Kafka sink fans out in a single write — the per-record
producer loop disappears into one declarative plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Maxwell routing rules (reference: ods/BaseDBMaxwellApp.scala:60-75).
FACT_TABLES_INSERT_ONLY = ("order_info", "order_detail")
DIM_TABLES_ANY_TYPE = (
    "base_province",
    "user_info",
    "sku_info",
    "base_trademark",
    "base_category3",
    "spu_info",
)

MAXWELL_SCHEMA = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("data", T.MapType(T.StringType(), T.StringType())),
    ]
)

CANAL_SCHEMA = T.StructType(
    [
        T.StructField("database", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("data", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
    ]
)


def parse_envelope(raw: DataFrame, value_col: str, schema: T.StructType) -> DataFrame:
    """``from_json`` the envelope with an explicit schema — schema-on-read
    with validation, unlike the reference's unchecked fastjson parse."""
    return raw.withColumn("_env", F.from_json(F.col(value_col), schema)).select(
        "*", "_env.*"
    ).drop("_env")


def parse_envelope_with_dead_letter(
    raw: DataFrame, value_col: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Parse + split: (parsed rows, dead letters).

    The reference's fastjson parse throws (or silently nulls) on bad
    binlog records and the batch dies with them
    (ods/BaseDBMaxwellApp.scala:48-58 has no error path). Production
    ingest needs the poison-pill rows OFF the hot path but KEPT: rows
    whose envelope fails to parse — or parses without the routing key —
    are returned as a second frame carrying the raw payload for a
    quarantine sink, so one malformed record can't stall the topic.
    Both frames derive from one ``from_json`` projection; Catalyst
    evaluates the parse once per branch of the same scan."""
    parsed = raw.withColumn("_env", F.from_json(F.col(value_col), schema))
    ok = (
        parsed.filter(
            F.col("_env").isNotNull() & F.col("_env.table").isNotNull()
        )
        .select("*", "_env.*")
        .drop("_env")
    )
    dead = parsed.filter(
        F.col("_env").isNull() | F.col("_env.table").isNull()
    ).select(F.col(value_col).alias("raw_value"))
    return ok, dead


def route_maxwell(env: DataFrame) -> DataFrame:
    """Apply the Maxwell allow-list/insert-only rules and emit
    (topic, value) rows for the dynamic-topic Kafka sink."""
    keep = (
        (F.col("table").isin(list(FACT_TABLES_INSERT_ONLY)) & (F.col("type") == "insert"))
        | (
            F.col("table").isin(list(DIM_TABLES_ANY_TYPE))
            & F.col("data").isNotNull()
            & (F.size(F.map_keys("data")) > 0)
        )
    )
    return env.filter(keep).select(
        F.concat(F.lit("ods_"), F.col("table")).alias("topic"),
        F.to_json(F.col("data")).alias("value"),
    )


def route_canal(env: DataFrame) -> DataFrame:
    """Canal: INSERT-only, one output record per element of the ``data``
    array — ``explode`` replaces the element loop at
    ods/BaseDBCanalApp.scala:72-75."""
    return (
        env.filter((F.col("type") == "INSERT") & (F.size("data") > 0))
        .select("table", F.explode("data").alias("row"))
        .select(
            F.concat(F.lit("ods_"), F.col("table")).alias("topic"),
            F.to_json(F.col("row")).alias("value"),
        )
    )


def route_by_rules(
    df: DataFrame,
    type_col: str,
    keep_any: tuple[str, ...],
    keep_when: tuple[tuple[str, Column], ...],
    payload: Column | None = None,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Generic router: rows whose ``type_col`` is in ``keep_any`` pass
    unconditionally; each ``(type, condition)`` in ``keep_when`` passes
    conditionally; everything else drops.

    With ``payload`` the output is the Kafka-sink shape (topic, value);
    with ``carry`` the named source columns ride along next to ``topic``
    (the inspectable/oracle-checkable shape — same filter, same topic
    derivation)."""
    cond = F.col(type_col).isin(list(keep_any))
    for t, extra in keep_when:
        cond = cond | ((F.col(type_col) == t) & extra)
    routed = df.filter(cond).withColumn(
        "topic", F.concat(F.lit("ods_"), F.col(type_col))
    )
    if payload is None:
        return routed.select("topic", *carry)
    return routed.select("topic", payload.alias("value"))
