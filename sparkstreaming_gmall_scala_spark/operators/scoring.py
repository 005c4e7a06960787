"""Model-based document scoring: the classifier-filter stage of an LLM
data pipeline (the GPT-3 LR quality classifier / LLaMA fastText
Wikipedia-reference filter) as Arrow-batched ``mapInPandas`` plumbing.

No classifier library ships in this container, so the model itself is a
clearly-marked deterministic fake (md5-derived pseudo-logit — exactly
reproducible in the DuckDB oracle, the ``operators/multimodal.py`` stub
discipline). The Spark-side shape is the real one and is what matters at
100 TB:

- ``mapInPandas`` over an iterator of Arrow batches: the model loads
  ONCE per partition (inside the generator, before the batch loop) —
  never per row, never per batch — then scores each batch vectorized;
- output schema is declared up front; the scan stays column-pruned to
  (id, text);
- scoring is a pure per-row map: zero shuffle, so the filter composes
  scan-side with the rest of the cleaning recipe.

Swap ``_load_model``'s body for a real ``fasttext.load_model`` (the
file distributed via ``SparkFiles``) and the operator is production
code unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _load_model():
    """Per-partition model initialization. The real path would be e.g.
    ``fasttext.load_model(SparkFiles.get("quality.bin"))``; here it
    returns the deterministic fake scorer so the pipeline is testable
    and oracle-checkable without the library."""

    def score_batch(texts: pd.Series) -> pd.Series:
        # pseudo-logit in [0, 1): first 8 md5 hex chars as an integer,
        # scaled — integer math end-to-end, so DuckDB reproduces it
        # bit-for-bit (a real model's float logits would be rows-only).
        # NULL text scores NULL (na_action keeps NaN as NaN), matching
        # the oracle where md5(NULL) is NULL — not md5('').
        return texts.map(
            lambda t: (int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 1_000_000)
            / 1e6,
            na_action="ignore",
        )

    return score_batch


def model_score(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Score every doc with the (fake) quality classifier: returns
    (id, score) with score in [0, 1). Keep-policy filtering is the
    caller's ``filter(score >= τ)``."""
    out_schema = f"{id_col} long, score double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _load_model()  # once per partition, NOT per batch/row
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "score": model(pdf[text_col]),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema=out_schema)
