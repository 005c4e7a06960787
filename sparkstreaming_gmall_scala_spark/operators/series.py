"""The ONE home for driver-side sequential-series evaluation.

Several statistics are sequential recurrences that SQL window functions
cannot express exactly cross-engine (fixed-point EWMA/Holt smoothing,
Kaplan-Meier survival products, PAVA pool merges, the Wald-Wolfowitz run
count): each folds the fact table DISTRIBUTED down to a calendar- or
dimension-bounded frame first, then walks that bounded series
driver-side in a deterministic order. Rounds 10-12 grew ~6 hand-rolled
copies of the collect → ordered walk → createDataFrame pattern; this
module consolidates them (round-12 verdict #8) so the three obligations
every copy carried by convention are now owned MECHANICALLY in one
place:

1. the deterministic ordering (``orderBy`` before the collect);
2. the bound assert — the collect is only sound because the input is
   dimension/calendar-bounded, so the helper FAILS LOUDLY if a caller
   ever hands it a fact-proportional frame instead of a folded one;
3. the ITERATIVE-note registration — every evaluator entry-point is
   recorded in :data:`SERIES_EVALUATORS`, and the round-13 guard test
   (tests/test_round13_properties.py) requires every catalog builder
   that references a registered entry-point to carry an ITERATIVE note
   in tools/gen_plans.py, so a 0-scan PLANS.md row can never appear
   unexplained.

The walks themselves stay exact-integer (the repo's determinism
discipline); nothing here touches floats except where the pre-existing
statistic already did (the runs-test z, a one-row double tree).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

#: entry-point name -> one-line bound statement; populated by
#: :func:`series_entry`. The guard test keys off these names.
SERIES_EVALUATORS: dict[str, str] = {}


def series_entry(bound_doc: str) -> Callable:
    """Register a function as a sequential-series evaluator entry-point.

    ``bound_doc`` states WHY the collected frame is bounded (e.g.
    "|nations| x |days| daily fold"). Builders referencing a registered
    name must carry an ITERATIVE note (guard-tested)."""

    def deco(fn: Callable) -> Callable:
        SERIES_EVALUATORS[fn.__name__] = bound_doc
        return fn

    return deco


def tdiv(a: int, d: int) -> int:
    """Truncating integer division, matching DuckDB's ``//`` on
    negatives (Python's ``//`` floors — the repo's floor-vs-truncate
    discipline)."""
    return -((-a) // d) if a < 0 else a // d


def bounded_series_eval(
    df: DataFrame,
    order_cols: tuple[str, ...],
    walk: Callable[[list], list[tuple]],
    schema: str,
    bound: int,
    **ctx,
) -> DataFrame:
    """Collect ``df`` in ``order_cols`` order, fold it driver-side with
    ``walk(rows, **ctx)``, and materialize the result as a typed frame.

    ``bound`` is the caller's documented cardinality ceiling for the
    folded frame (calendar days, dimension x days, day-span durations —
    never fact-proportional). Exceeding it means the fold-before-collect
    contract broke upstream, so this raises instead of silently shipping
    a driver-side scan of fact data."""
    rows = df.orderBy(*order_cols).collect()
    if len(rows) > bound:
        raise AssertionError(
            f"bounded_series_eval({walk.__name__}): collected "
            f"{len(rows)} rows > documented bound {bound} — the input "
            "is no longer dimension/calendar-bounded; fold the facts "
            "distributed before handing the series to the driver"
        )
    return df.sparkSession.createDataFrame(walk(rows, **ctx), schema)


@series_entry("duration table bounded by the corpus day span")
def km_eval(tbl: DataFrame, n_users: int) -> DataFrame:
    """Kaplan-Meier survival fold over a (dur, n_all, d) duration table:
    s6 <- s6 * (n_risk - d) div n_risk, the exact INTEGER fixed-point
    recurrence (a windowed product() would hit cross-engine
    multiplication-association drift). Extracted verbatim from
    plans/temporal.py:user_survival (round-12 verdict #8)."""

    def km_walk(rows: list) -> list[tuple]:
        out, n_risk, s6 = [], n_users, 1_000_000
        for r in rows:
            s6 = s6 * (n_risk - r["d"]) // n_risk
            if r["d"] > 0:
                out.append((r["dur"], n_risk, r["d"], s6))
            n_risk -= r["n_all"]
        return out

    return bounded_series_eval(
        tbl,
        ("dur",),
        km_walk,
        "duration_days long, n_risk long, n_events long, surv6 long",
        bound=20_000,
    )


@series_entry("day-ordered sign series bounded by the calendar")
def runs_eval(signs: DataFrame) -> DataFrame:
    """Wald-Wolfowitz run-count fold over a (d, sg) sign series (sg in
    {-1, +1}), then the one-row z statistic through the same double tree
    as the oracle. Degenerate series (one sign only, or < 2 points)
    yield the empty frame — the decile_profile convention. Extracted
    verbatim from plans/scale.py:revenue_runs_test (round-12 verdict
    #8)."""

    def runs_walk(rows: list) -> list[tuple]:
        r, n1, n2, prev = 0, 0, 0, None
        for row in rows:
            if row["sg"] != prev:
                r += 1
            prev = row["sg"]
            if row["sg"] == 1:
                n1 += 1
            else:
                n2 += 1
        if n1 == 0 or n2 == 0 or n1 + n2 < 2:
            return []
        import math

        mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
        var = (
            2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
            / (float(n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
        )
        z6 = math.floor((float(r) - mu) / math.sqrt(var) * 1000000.0 + 0.5)
        return [(n1, n2, r, z6)]

    return bounded_series_eval(
        signs,
        ("d",),
        runs_walk,
        "n_above long, n_below long, n_runs long, z_ppm long",
        bound=20_000,
    )
