"""Sequential smoothing evaluators over a (key, day, y) daily frame.

The integer fixed-point EWMA and Holt recurrences are shared verbatim
between the batch queries (plans/scale.py: revenue_ewma, holt_forecast)
and their live twins (plans/streaming_analog.py, fed by the nation-daily
mart in streaming/nationdaily.py) — batch ≡ live holds by construction
above the mart fold because both paths run THIS code on the folded
frame. Both folds walk the dimension-bounded |keys| × |days| daily frame
driver-side in (key, day) order, exactly what the oracles' recursive
CTEs do."""

from __future__ import annotations

from pyspark.sql import DataFrame


def tdiv(a: int, d: int) -> int:
    """Truncating integer division, matching DuckDB's ``//`` on
    negatives (Python's ``//`` floors — the repo's floor-vs-truncate
    discipline)."""
    return -((-a) // d) if a < 0 else a // d


def ewma_fold(daily: DataFrame) -> DataFrame:
    """Per-key EWMA (α = 0.2, s ← (2y + 8s) div 10) + one-step forecast
    MAE over a (n_name, day, y) frame. y ≥ 0 keeps every intermediate
    non-negative, so plain floor division is also truncation."""
    rows = daily.orderBy("n_name", "day").collect()
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
    return daily.sparkSession.createDataFrame(
        out, "n_name string, n_days long, ewma_cents long, mae_cents long"
    )


def holt_fold(daily: DataFrame) -> DataFrame:
    """Per-key Holt level+trend (α = β = 0.2) + one-step forecast MAE
    over a (n_name, day, y) frame; the trend term goes negative, hence
    :func:`tdiv` everywhere."""
    rows = daily.orderBy("n_name", "day").collect()
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
    return daily.sparkSession.createDataFrame(
        out,
        "n_name string, n_days long, level_cents long, trend_cents long,"
        " forecast_cents long, mae_cents long",
    )
