"""Declarative data-expectations: rule evaluation, audit counts, and
quarantine routing.

The Deequ/Great-Expectations-style gate a pipeline runs before letting a
batch into the lakehouse (and before any training job reads it): rules
are (name, violation-predicate) pairs; `expectation_counts` folds every
rule into ONE aggregation over one scan; `quarantine_split` routes each
row to the clean or quarantine side with the list of rules it broke —
the dead-letter discipline of operators/cdc.py applied to quality
instead of schema.

Both shapes are additive/row-local by construction, so the streaming
gate (streaming/quality.py) reuses them per micro-batch and merges
bounded partials — except table-level rules (key uniqueness), which are
not additive across batches; the streaming gate ENFORCES uniqueness via
its dedupe-by-id step rather than measuring it.

NULL semantics (SQL three-valued logic, identical in both engines and
pinned in tests/test_quality.py): a rule predicate that evaluates to
NULL on a row — e.g. ``o_totalprice < 0`` on a NULL price — is NOT a
violation: the audit's conditional sum skips it and the router sends the
row to the CLEAN side. A rule that must reject NULLs says so explicitly
(``col.isNull() | (col < 0)``); silently promoting NULL→violation here
would make the one-scan audit disagree with its spelled-out SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Rule = tuple[str, Column]


def orders_rules() -> list[Rule]:
    """The orders table's row-local expectations (violation predicates):
    non-negative money, status domain, date sanity range, priority
    format. Key uniqueness is table-level and registered separately
    (see plans/scale.py:expectations_check)."""
    return [
        ("totalprice_nonneg", F.col("o_totalprice") < 0),
        ("status_in_domain", ~F.col("o_orderstatus").isin("F", "O", "P")),
        (
            "orderdate_in_range",
            (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit("2005-01-01").cast("timestamp")),
        ),
        ("priority_format", ~F.col("o_orderpriority").rlike("^[1-5]-")),
    ]


def expectation_counts(
    df: DataFrame,
    rules: list[Rule],
    table_rules: list[tuple[str, Column]] | None = None,
) -> DataFrame:
    """One row per rule: (rule, n_rows, n_violations) — every rule a
    conditional sum folded into a single aggregation over one scan
    (plan-guarded), then a stack unpivot. `table_rules` are whole-table
    aggregate expressions (e.g. count − count_distinct for uniqueness)
    that join the same pass; they are NOT additive across micro-batches,
    so the streaming gate passes only row-local `rules`."""
    names: list[str] = []
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, agg in table_rules or []:
        aggs.append(agg.alias(name))
        names.append(name)
    for name, cond in rules:
        aggs.append(F.sum(cond.cast("long")).alias(name))
        names.append(name)
    one_row = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', n_rows, {n}" for n in names)
    return one_row.select(
        F.expr(
            f"stack({len(names)}, {stack_args}) AS (rule, n_rows, n_violations)"
        )
    )


def quarantine_split(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame]:
    """Route rows: (clean, quarantined). Quarantined rows carry
    ``failed_rules`` — the comma-joined names of every rule they broke,
    in rule order (deterministic, string-typed so the quarantine table
    stays oracle-hashable). One projection, zero shuffles: the split is
    two filters over the same tagged frame, and Catalyst pushes each
    side's predicate into its own scan when the frame comes straight
    off files."""
    failed = F.concat_ws(
        ",",
        F.array_compact(
            F.array(*[F.when(cond, F.lit(name)) for name, cond in rules])
        ),
    )
    tagged = df.withColumn("failed_rules", failed)
    clean = tagged.filter(F.col("failed_rules") == "").drop("failed_rules")
    bad = tagged.filter(F.col("failed_rules") != "")
    return clean, bad


def collect_moments(
    df: DataFrame, type_col: str, value_col: str
) -> dict[str, tuple[float, float]]:
    """Per-type (mean, sample_sd) from EXACT decimal moments — the
    bootstrap step for the streaming z-score rule. One aggregation, one
    bounded collect (a row per TYPE — dozens, the domain_mix precedent).
    Mean/variance derive in the identical IEEE order the batch
    `value_outliers` query uses in-engine (decimal→double cast, then
    s1/n and (s2 − s1²/n)/(n−1)), so frozen-moment scoring reproduces
    its outlier set exactly. Degenerate types (n ≤ 1 or zero variance)
    are omitted — no row of theirs can be an outlier."""
    vdec = F.col(value_col).cast("decimal(18,2)")
    rows = (
        df.groupBy(type_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(vdec).alias("s1"),
            F.sum(vdec * vdec).alias("s2"),
        )
        .collect()
    )
    out: dict[str, tuple[float, float]] = {}
    for r in rows:
        n, s1, s2 = r["n"], float(r["s1"]), float(r["s2"])
        if n <= 1:
            continue
        var_num = s2 - s1 * s1 / n
        if not var_num > 0:
            continue
        out[r[type_col]] = (s1 / n, (var_num / (n - 1)) ** 0.5)
    return out


def zscore_rule(
    moments: dict[str, tuple[float, float]],
    type_col: str,
    value_col: str,
    threshold: float = 3.0,
    name: str = "zscore_outlier",
) -> Rule:
    """A quality Rule flagging per-type n-sigma outliers against FROZEN
    moments (the frozen-quantizer discipline: per-batch moments would
    make a row's verdict depend on what it arrived with). The violation
    predicate is a literal CASE chain over the bounded type set —
    scan-side, zero state, composable with the row-local rules in
    `quality_gate_batch`. Types absent from ``moments`` never flag
    (unknown or degenerate strata pass through, matching
    `value_outliers`' n>1/var>0 guards)."""
    z: Column = F.lit(None).cast("double")
    for t, (mean, sd) in moments.items():
        z = F.when(
            F.col(type_col) == t,
            (F.col(value_col).cast("double") - F.lit(mean)) / F.lit(sd),
        ).otherwise(z)
    return (name, F.abs(z) > threshold)
