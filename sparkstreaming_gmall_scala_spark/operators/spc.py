"""Shewhart / Western-Electric control-chart evaluation over a daily
series — the shared, FULLY-INTEGER rule engine behind the batch query
(plans/scale.py:spc_violations) and its live twin
(streaming/spc.py:spc_violations_live): both folds produce the same
(d, y) frame, so sharing the evaluator makes batch ≡ streaming true by
construction above the fold.

Rules (exact — no floating point anywhere):
- rule 1: |y − μ| > 3σ over the population moments, rewritten to
  (y·n − S)² > 9(nQ − S²) in DECIMAL(38,0) (y·n reaches ~2.5e16 and its
  square ~6e32, inside 38 digits at any sf);
- rule 2: 8+ consecutive days strictly the same side of the mean —
  side = exact integer sign of y·n − S, run lengths via
  gaps-and-islands windows over the calendar-bounded daily frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: Output schema of :func:`spc_eval` (the empty-input convention frame).
SPC_SCHEMA = (
    "day string, cents long, side int, run_len long,"
    " rule1 boolean, rule2 boolean"
)


def dow_factors(daily: DataFrame) -> DataFrame:
    """Detrended weekly seasonal factors over a ``(d date, y long)``
    daily frame — the shared evaluator behind dow_seasonal_factors and
    its live twin (both folds produce the same daily frame, so batch ≡
    streaming holds by construction above the fold). Fully integer:
    dev7 = y·7 − centered-7-row-sum (no rational mean), incomplete edge
    windows excluded, factor = exact floor division."""
    w = Window.orderBy("d").rowsBetween(-3, 3)
    ma = daily.select(
        "d",
        "y",
        F.sum("y").over(w).alias("sum7"),
        F.count(F.lit(1)).over(w).alias("n7"),
    )
    dev = ma.filter(F.col("n7") == 7).select(
        (F.dayofweek("d") - 1).cast("long").alias("dow"),
        (F.col("y") * 7 - F.col("sum7")).alias("dev7"),
    )
    return dev.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("dev7").alias("sum_dev7"),
        F.expr("sum(dev7) div (7 * count(1))").alias("mean_dev_cents"),
    )


def spc_eval(spark: SparkSession, daily: DataFrame) -> DataFrame:
    """Evaluate both rules over a ``(d date, y long)`` daily frame and
    return the violation days, driver-materialized (calendar-bounded).
    The input frame is persisted here (one fold feeds the moment scalar
    and the run walk) and released before return."""
    daily = daily.persist()
    daily.count()
    mom = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("s"),
        F.sum(
            (F.col("y").cast("decimal(38,0)") * F.col("y")).cast(
                "decimal(38,0)"
            )
        ).alias("q"),
    ).collect()[0]
    if not mom["n"]:
        daily.unpersist()
        return spark.createDataFrame([], SPC_SCHEMA)
    n, s, q = int(mom["n"]), int(mom["s"]), int(mom["q"])
    # scalars exceed a JVM long at scale — thread them as DECIMAL(38,0)
    # string literals, never F.lit(int)
    s_lit = F.expr(f"CAST('{s}' AS DECIMAL(38,0))")
    lim_lit = F.expr(f"CAST('{9 * (n * q - s * s)}' AS DECIMAL(38,0))")
    dev = F.col("y").cast("decimal(38,0)") * F.lit(n) - s_lit
    sided = daily.select(
        "d",
        "y",
        F.when(dev > 0, 1).when(dev < 0, -1).otherwise(0).alias("side"),
        ((dev * dev).cast("decimal(38,0)") > lim_lit).alias("rule1"),
    )
    w_all = Window.orderBy("d")
    w_side = Window.partitionBy("side").orderBy("d")
    runs = sided.withColumn(
        "grp", F.row_number().over(w_all) - F.row_number().over(w_side)
    )
    runlen = runs.withColumn(
        "run_len",
        F.count(F.lit(1)).over(
            Window.partitionBy("side", "grp").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    out = runlen.filter(
        F.col("rule1") | ((F.col("side") != 0) & (F.col("run_len") >= 8))
    ).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("y").alias("cents"),
        "side",
        F.col("run_len").cast("long").alias("run_len"),
        "rule1",
        ((F.col("side") != 0) & (F.col("run_len") >= 8)).alias("rule2"),
    )
    rows = out.collect()  # calendar-bounded; frees the daily cache
    daily.unpersist()
    return spark.createDataFrame(rows, schema=out.schema)
