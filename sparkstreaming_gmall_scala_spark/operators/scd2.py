"""Slowly-changing-dimension type 2: validity-interval history from
observed states.

The reference's dim layer keeps ONLY the latest row per key (Phoenix
upserts, dim/BaseTrademarkApp.scala-style overwrite — SURVEY.md §2.1
S8); SCD2 is what a warehouse keeps when history matters: one row per
(key, consecutive-state run) with [effective_from, effective_to)
validity, a version number, and an is_current flag. Joining a fact to
the dim AS OF its event time becomes an interval lookup instead of
"whatever the dim said at load time".

Spark-first shape — everything happens inside ONE partitioning by key:
  1. lag() marks rows whose state differs from the previous observation
     (total order: ts, then a unique tiebreak),
  2. a running sum of change-marks numbers the runs (gaps-and-islands,
     the same discipline as dedup.py's span merge),
  3. one groupBy collapses each run to its first timestamp,
  4. lead() closes each interval with the next run's start.
Windows 1/2/4 and the groupBy all share the key partition, so Catalyst
plans a single exchange for the whole timeline.

``scd2_merge`` is the incremental form: only keys PRESENT IN THE BATCH
get their timeline rebuilt (semi-join), untouched keys pass through by
anti-join — at 100 TB a daily batch touches a sliver of the key space
and the merge cost is O(touched keys' history), not O(dim). A prior run
re-expands losslessly to one observation at its eff_from carrying its
n_observations as a weight, which is what makes the merge idempotent
and batch-order-insensitive (pinned in tests): the timeline is a pure
function of the observation set.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def _timeline_weighted(
    changes: DataFrame, key: str, ts: str, attrs: Sequence[str], tiebreak: str
) -> DataFrame:
    """Core gaps-and-islands collapse over observations carrying a
    ``_w`` multiplicity, so n_observations stays exact through
    incremental merges (a collapsed prior run counts its interior
    rows)."""
    attrs = list(attrs)
    obs = W.partitionBy(key).orderBy(ts, tiebreak)
    run = W.partitionBy(key).orderBy(ts, tiebreak).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    # eqNullSafe: a null attr value is a STATE (distinct from every
    # non-null state, identical to itself) — plain != would silently
    # swallow null-involved transitions
    same = F.lit(True)
    for a in attrs:
        same = same & F.lag(a).over(obs).eqNullSafe(F.col(a))
    mark = ((F.row_number().over(obs) == 1) | ~same).cast("long")
    grouped = (
        changes.withColumn("_mark", mark)
        .withColumn("_grp", F.sum("_mark").over(run))
        .groupBy(key, "_grp", *attrs)
        .agg(
            F.min(ts).alias("eff_from"),
            F.sum("_w").alias("n_observations"),
            # the run's FIRST observation's tiebreak (exactly one row per
            # run has _mark=1) — carried so scd2_merge can re-expand a
            # collapsed run at its ORIGINAL total-order position instead
            # of inventing one (two prior runs sharing eff_from would
            # otherwise have shuffle-order-dependent relative order)
            F.max(F.when(F.col("_mark") == 1, F.col(tiebreak))).alias(
                "first_tb"
            ),
        )
    )
    # segments order by _grp, not eff_from: two adjacent runs can share
    # a timestamp (same-instant state flip resolved by the tiebreak) and
    # _grp is the unique, time-monotone run id
    seg = W.partitionBy(key).orderBy("_grp")
    return grouped.select(
        key,
        *attrs,
        "eff_from",
        F.lead("eff_from").over(seg).alias("eff_to"),
        F.row_number().over(seg).cast("long").alias("version"),
        F.lead("eff_from").over(seg).isNull().alias("is_current"),
        "n_observations",
        "first_tb",
    )


def scd2_timeline(
    changes: DataFrame,
    key: str,
    ts: str,
    attrs: Sequence[str],
    tiebreak: str,
) -> DataFrame:
    """Collapse observed states into the SCD2 history.

    Returns one row per consecutive run of identical ``attrs`` per
    ``key``: the attrs, ``eff_from`` (first observation ts of the run),
    ``eff_to`` (start of the next run, null while current), ``version``
    (1-based per key, in time order), ``is_current``, and
    ``n_observations`` (rows collapsed into the run), and ``first_tb``
    (the tiebreak of the run's first observation — the run's original
    total-order position, which scd2_merge uses to re-expand collapsed
    runs exactly). ``tiebreak`` must make (ts, tiebreak) a total order
    per key."""
    obs = changes.select(key, ts, tiebreak, *attrs).withColumn(
        "_w", F.lit(1).cast("long")
    )
    return _timeline_weighted(obs, key, ts, attrs, tiebreak)


def scd2_merge(
    dim: DataFrame | None,
    batch: DataFrame,
    key: str,
    ts: str,
    attrs: Sequence[str],
    tiebreak: str,
) -> DataFrame:
    """Apply a batch of new observations to an existing SCD2 dim.

    Touched keys (present in the batch) have their timelines rebuilt
    from the union of their recovered prior observations and the batch;
    untouched keys pass through unchanged. Pass ``dim=None`` for the
    initial load.

    Contract (pinned in tests): a batch's observations for a key must be
    at-or-after that key's latest prior observation (the normal
    event-time-ordered ingestion; the engine's idempotent sinks already
    dedup replayed batches upstream). Under that contract the fold over
    batches is EXACTLY ``scd2_timeline`` over the union — including
    n_observations — because a run's collapse only discards interior
    observations, which monotone input can never need again. Genuinely
    late data that lands inside an already-collapsed run is the SCD2
    history-rewrite case: rebuild the affected keys from the fact log
    with ``scd2_timeline`` (the merge cannot resurrect collapsed
    interior observations and does not pretend to)."""
    if dim is None:
        return scd2_timeline(batch, key, ts, attrs, tiebreak)
    attrs = list(attrs)
    batch_keys = batch.select(key).distinct()
    untouched = dim.join(batch_keys, key, "left_anti")
    # a prior run re-expands at (eff_from, first_tb): its first
    # observation's ORIGINAL total-order position, same column type as
    # the batch tiebreak — so the rebuilt window order is identical to
    # the full rebuild's even when runs share an instant or a batch
    # observation lands exactly on a run boundary (a synthetic tiebreak
    # here was shuffle-order-nondeterministic for same-instant runs)
    prior_obs = dim.join(batch_keys, key, "semi").select(
        key,
        F.col("eff_from").alias(ts),
        F.col("first_tb").alias(tiebreak),
        *attrs,
        F.col("n_observations").alias("_w"),
    )
    new_obs = batch.select(
        key, ts, tiebreak, *attrs, F.lit(1).cast("long").alias("_w")
    )
    merged = _timeline_weighted(
        prior_obs.unionByName(new_obs), key, ts, attrs, tiebreak
    )
    return untouched.unionByName(merged)


def asof_dim_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str,
) -> DataFrame:
    """Join each fact row to the dim version valid AT its timestamp:
    eff_from <= fact_ts < eff_to (null eff_to = open interval). Small
    dims broadcast; large dims co-partition on the key with the facts —
    either way the interval predicate rides the join, and because
    versions never overlap each fact matches at most one row."""
    cond = (
        (facts[key] == dim[key])
        & (dim["eff_from"] <= facts[fact_ts])
        & (dim["eff_to"].isNull() | (facts[fact_ts] < dim["eff_to"]))
    )
    return facts.join(dim, cond, "left").drop(dim[key])
