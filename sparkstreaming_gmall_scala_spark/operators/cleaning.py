"""Corpus-cleaning operators: PII masking and cross-document line-level
dedup (the RefinedWeb/CCNet line filter).

No reference counterpart (the reference cleans CDC envelopes, not text;
SURVEY.md §7 north-star ops) — these are the standard text-scrubbing
steps a training-data pipeline runs between ingestion and packing.

Scale notes:
- ``pii_mask`` is a pure Column-expression rewrite: zero shuffle, runs
  inside whole-stage codegen at scan speed next to the quality features.
- ``line_dedup`` uses the same de-skewed shape as
  textstats.boilerplate_stats: line document-frequency is a
  partial-aggregated ``groupBy(line)`` joined back to the exploded line
  rows (hot boilerplate lines compress map-side; the skewed probe join
  is AQE-splittable — never a count window over ``partitionBy(line)``),
  then each doc's surviving lines re-assemble by position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deliberately simple patterns shared verbatim with the DuckDB oracles
# (Java regex and RE2 agree on these constructs). Production would use a
# vetted PII library; the masking *pipeline shape* is what matters here.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}[- ]\d{3,4}[- ]\d{4}"


def pii_mask(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact emails and phone-shaped digit groups, reporting per-doc hit
    counts: (id, n_emails, n_phones, masked_text). Emails are masked
    first so a phone pattern can't match inside an already-masked span.

    Zero shuffle — two regexp_replace + two regexp_extract_all over the
    scan; at 100 TB this is a scan-bound rewrite.
    """
    text = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0)))
    masked1 = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    n_phones = F.size(F.regexp_extract_all(masked1, F.lit(PHONE_RE), F.lit(0)))
    masked = F.regexp_replace(masked1, PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col),
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        masked.alias("masked_text"),
    )


def line_dedup(
    docs: DataFrame, id_col: str, text_col: str, min_df: int = 3
) -> DataFrame:
    """Cross-document line dedup (RefinedWeb/CCNet): a non-empty line
    whose trimmed form appears in ≥ ``min_df`` docs is boilerplate
    (cookie banners, nav chrome, licence footers) and is dropped from
    every doc; surviving lines re-join in their original order.

    Line document-frequency counts DISTINCT docs per line (a doc
    repeating its own line doesn't promote it). Output per doc:
    (id, n_lines, n_dropped, clean_text) — every input doc appears, even
    if all its lines drop (clean_text = '').
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode_outer(F.split(F.col(text_col), r"\n")).alias(
            "pos", "line"
        ),
    ).withColumn("key", F.trim(F.col("line")))
    # distinct doc count per line — partial-agg'd groupBy, join back
    # (window-over-line would funnel hot boilerplate lines to one task)
    dfreq = (
        lines.filter(F.col("key") != "")
        .select("key", id_col)
        .distinct()
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    flagged = lines.join(dfreq, "key", "left").withColumn(
        "_drop",
        F.coalesce(
            (F.col("key") != "") & (F.coalesce("_df", F.lit(0)) >= min_df),
            F.lit(False),  # null text ⇒ null key ⇒ keep, not silent-drop
        ),
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("_drop").cast("long")).alias("n_dropped"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("_drop"),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s.getField("line"),
                ),
            ).alias("clean_text"),
        )
        .select(
            id_col,
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("n_dropped").cast("long").alias("n_dropped"),
            "clean_text",
        )
    )
