"""Fixed-bin histograms: mergeable distribution summaries + quantile
estimates.

Complements the sketch family (bloom: membership, CMS: frequency, HLL
via approx_count_distinct: cardinality) with the DISTRIBUTION sketch:
``n_bins`` counters summarize any number of values, merge additively
(commutative monoid — the streaming ingest in streaming/histogram.py is
exact across micro-batches), and answer quantile/CDF queries with error
bounded by one bin width. This is the latency-dashboard structure
(percentiles over billions of rows without a global sort) — Spark's own
``percentile_approx`` answers one-shot queries; the explicit histogram
is what you PERSIST and merge across days/streams.

Determinism discipline: the binning expression is written with the
identical operation tree in Spark and the DuckDB oracle (same IEEE
double ops, same clamp order), so ``value_histogram`` carries a full
value-hash oracle; bounds come from one scalar agg broadcast into the
scan (the DSIR scalar-join pattern — a 1-row build side, not a
driver-side collect in the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bin_expr(col: str, n_bins: int) -> F.Column:
    """least(n-1, greatest(0, floor((v - lo) * n / span))) with
    span = hi - lo (1.0 when degenerate). Requires ``lo``/``hi``
    columns in scope; mirrored verbatim by histogram_oracle_sql."""
    span = F.when(F.col("hi") == F.col("lo"), F.lit(1.0)).otherwise(
        F.col("hi") - F.col("lo")
    )
    raw = F.floor(
        (F.col(col) - F.col("lo")) * F.lit(float(n_bins)) / span
    ).cast("long")
    return F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw))


def fixed_histogram(
    df: DataFrame,
    col: str,
    n_bins: int = 32,
    lo: float | None = None,
    hi: float | None = None,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """(keys..., bin, lo_edge, hi_edge, cnt) — one scalar-bounds agg
    (skipped when the caller pins bounds, the streaming case) + one
    map-side-combined groupBy; output bounded by n_keys * n_bins rows.

    ``keys`` adds grouping columns (per-type latency dashboards): every
    key shares the SAME bounds — global in-query bounds or pinned ones —
    so per-key histograms stay cross-key comparable and cell-wise
    mergeable with the identical edge doubles (per-key bounds would put
    every key on its own grid and break histogram_merge additivity)."""
    # null values are excluded, matching the min/max bounds' own
    # null-skipping — without the filter Spark's null-skipping greatest()
    # would silently count null rows into bin 0 (and DuckDB's
    # null-propagating greatest() into a NULL bin: an engine divergence)
    df = df.filter(F.col(col).isNotNull())
    if lo is None or hi is None:
        bounds = df.agg(
            F.min(col).cast("double").alias("lo"),
            F.max(col).cast("double").alias("hi"),
        )
        src = df.crossJoin(F.broadcast(bounds))
    else:
        src = df.withColumn("lo", F.lit(float(lo))).withColumn(
            "hi", F.lit(float(hi))
        )
    span = F.when(F.col("hi") == F.col("lo"), F.lit(1.0)).otherwise(
        F.col("hi") - F.col("lo")
    )
    return (
        src.withColumn("bin", _bin_expr(col, n_bins))
        .groupBy(*keys, "bin")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
        )
        .select(
            *keys,
            "bin",
            (
                F.col("lo")
                + F.col("bin").cast("double") * span / F.lit(float(n_bins))
            ).alias("lo_edge"),
            (
                F.col("lo")
                + (F.col("bin") + 1).cast("double") * span / F.lit(float(n_bins))
            ).alias("hi_edge"),
            "cnt",
        )
    )


def histogram_merge(*hists: DataFrame, keys: tuple[str, ...] = ()) -> DataFrame:
    """Cell-wise sum of histograms built with the same bins/bounds
    (and, when keyed, the same key columns)."""
    it = iter(hists)
    acc = next(it)
    for h in it:
        acc = acc.unionByName(h)
    return acc.groupBy(*keys, "bin", "lo_edge", "hi_edge").agg(
        F.sum("cnt").alias("cnt")
    )


def histogram_quantile(
    hist: DataFrame, qs: list[float], keys: tuple[str, ...] = ()
) -> DataFrame:
    """(keys..., q, estimate) per requested quantile: cumulative counts
    over the <= n_keys * n_bins rows, then ONE non-equi join against the
    (tiny, broadcast) quantile list picks each (key, q)'s covering bin
    and interpolates linearly inside it. |estimate - true| <= one bin
    width by construction (pinned against exact percentiles in tests);
    the estimate is 6-dp floored so the value is engine-portable (the
    oracle-determinism recipe). Single-pass on purpose: the previous
    per-q limit(1) union re-executed the histogram lineage — and
    therefore the SOURCE scan — once per quantile; the join form
    evaluates the histogram once however many quantiles are asked
    (round 9). Keyed, the windows partition by the keys, so every key
    answers every quantile off the same one-pass cumulative walk."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(*keys)
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(W.partitionBy(*keys))
    )
    qdf = hist.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    target = F.col("q") * F.col("total")
    wq = W.partitionBy(*keys, "q").orderBy("bin")
    return (
        cum.join(F.broadcast(qdf), F.col("cum") >= F.col("q") * F.col("total"))
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") == 1)
        .select(
            *keys,
            "q",
            (
                F.floor(
                    (
                        F.col("lo_edge")
                        + (F.col("hi_edge") - F.col("lo_edge"))
                        * (target - (F.col("cum") - F.col("cnt")))
                        / F.col("cnt")
                    )
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("estimate"),
        )
    )


def histogram_oracle_sql(
    table: str, col: str, n_bins: int
) -> str:
    """The DuckDB mirror of fixed_histogram with in-query bounds —
    identical double arithmetic and clamp order."""
    span = "(CASE WHEN b.hi = b.lo THEN 1.0 ELSE b.hi - b.lo END)"
    return f"""
    WITH b AS (
      SELECT CAST(min({col}) AS DOUBLE) AS lo,
             CAST(max({col}) AS DOUBLE) AS hi
      FROM {table}
    ), binned AS (
      SELECT least({n_bins - 1}, greatest(0,
               CAST(floor((e.{col} - b.lo) * {float(n_bins)} / {span})
                    AS BIGINT))) AS bin,
             b.lo, b.hi
      FROM {table} e CROSS JOIN b
      WHERE e.{col} IS NOT NULL
    )
    SELECT bin,
           lo + CAST(bin AS DOUBLE)
                * (CASE WHEN hi = lo THEN 1.0 ELSE hi - lo END)
                / {float(n_bins)} AS lo_edge,
           lo + CAST(bin + 1 AS DOUBLE)
                * (CASE WHEN hi = lo THEN 1.0 ELSE hi - lo END)
                / {float(n_bins)} AS hi_edge,
           count(*) AS cnt
    FROM binned GROUP BY bin, lo, hi
    """
