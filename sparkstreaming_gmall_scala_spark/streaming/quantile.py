"""Streaming quantiles: the percentile dashboard answered from the
histogram index (round-9 verdict #7).

No new state machinery — the mergeable fixed-bin histogram the
sketch-mart stream already maintains (streaming/histogram.py: additive
<= n_bins partials per micro-batch, frozen bounds) IS the quantile
sketch; this module is the report side, folding the index and walking
the cumulative counts (operators/histogram.py:histogram_quantile). The
estimate is within one bin width of the exact percentile and, because
every step is deterministic double arithmetic over exact integer
counts, the streamed report EQUALS the batch twin computed from one
histogram over the union of batches — the same batch≡streaming pin the
other sketches carry.

At 100 TB: the stream touches each event once (O(batch) bin counts);
p50/p95/p99 at dashboard time read <= n_bins × generations index rows,
never the firehose — Spark's percentile_approx answers one-shot
queries, this is the PERSISTED, cross-day-mergeable form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.histogram import histogram_quantile
from .histogram import histogram_report


def quantile_report(
    spark: SparkSession,
    hist_index_dir: str,
    qs: Sequence[float] = (0.5, 0.95, 0.99),
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """(keys..., q, estimate) from the streaming histogram index: fold
    the partials (replay-deduped), cumulative-walk once per key,
    interpolate each requested quantile inside its covering bin. Pass
    ``keys`` when the index was built keyed (per-type dashboards)."""
    return histogram_quantile(
        histogram_report(spark, hist_index_dir, keys=keys), list(qs), keys=keys
    )
