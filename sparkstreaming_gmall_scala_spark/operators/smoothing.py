"""Sequential smoothing evaluators over a (key, day, y) daily frame.

The integer fixed-point EWMA and Holt recurrences are shared verbatim
between the batch queries (plans/scale.py: revenue_ewma, holt_forecast)
and their live twins (plans/streaming_analog.py, fed by the nation-daily
mart in streaming/nationdaily.py) — batch ≡ live holds by construction
above the mart fold because both paths run THIS code on the folded
frame. Both folds walk the dimension-bounded |keys| × |days| daily frame
driver-side in (key, day) order, exactly what the oracles' recursive
CTEs do — routed through operators/series.py:bounded_series_eval, which
owns the ordering, the bound assert, and the ITERATIVE-note guard
(round-12 verdict #8)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from .series import bounded_series_eval, series_entry, tdiv  # noqa: F401
# tdiv re-exported: pre-round-13 callers import it from here.

#: |nations| x TPC-H calendar (~25 x ~2500) with 3x headroom; a
#: fact-proportional frame blows through this at any bench SF.
_DAILY_BOUND = 200_000


@series_entry("|keys| x |days| daily fold (nation-calendar bounded)")
def ewma_fold(daily: DataFrame) -> DataFrame:
    """Per-key EWMA (α = 0.2, s ← (2y + 8s) div 10) + one-step forecast
    MAE over a (n_name, day, y) frame. y ≥ 0 keeps every intermediate
    non-negative, so plain floor division is also truncation."""

    def ewma_walk(rows: list) -> list[tuple]:
        out, state = [], {}
        for r in rows:
            k, y = r["n_name"], r["y"]
            if k not in state:
                state[k] = [y, 0, 1]  # s, abserr, n
            else:
                s, err, n = state[k]
                state[k] = [(2 * y + 8 * s) // 10, err + abs(y - s), n + 1]
        for k in sorted(state):
            s, err, n = state[k]
            out.append((k, n, s, err // max(n - 1, 1)))
        return out

    return bounded_series_eval(
        daily,
        ("n_name", "day"),
        ewma_walk,
        "n_name string, n_days long, ewma_cents long, mae_cents long",
        bound=_DAILY_BOUND,
    )


@series_entry("|keys| x |days| daily fold (nation-calendar bounded)")
def holt_fold(daily: DataFrame) -> DataFrame:
    """Per-key Holt level+trend (α = β = 0.2) + one-step forecast MAE
    over a (n_name, day, y) frame; the trend term goes negative, hence
    :func:`tdiv` everywhere."""

    def holt_walk(rows: list) -> list[tuple]:
        out, state = [], {}
        for r in rows:
            k, y = r["n_name"], r["y"]
            if k not in state:
                state[k] = [y, 0, 0, 1]  # l, b, abserr, n
            else:
                l, b, err, n = state[k]
                l_new = tdiv(2 * y + 8 * (l + b), 10)
                b_new = tdiv(2 * (l_new - l) + 8 * b, 10)
                state[k] = [l_new, b_new, err + abs(y - (l + b)), n + 1]
        for k in sorted(state):
            l, b, err, n = state[k]
            out.append((k, n, l, b, l + b, err // max(n - 1, 1)))
        return out

    return bounded_series_eval(
        daily,
        ("n_name", "day"),
        holt_walk,
        "n_name string, n_days long, level_cents long, trend_cents long,"
        " forecast_cents long, mae_cents long",
        bound=_DAILY_BOUND,
    )
