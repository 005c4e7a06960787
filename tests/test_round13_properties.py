"""Round-13 property pins.

Covers the round-12 ADVICE fixes and verdict tasks:
- bm25_score_per_doc empty-corpus branch preserves the caller's id type
  (a string-id caller must see the same schema on both paths).
- The consolidated sequential-series evaluator (operators/series.py,
  r12 verdict #8): the bound assert fires mechanically, and every
  catalog builder referencing a registered series entry-point carries
  an ITERATIVE note in tools/gen_plans.py.
"""
import inspect
import re
import textwrap

import pyspark.sql.functions as F
import pytest

from sparkstreaming_gmall_scala_spark.operators.textstats import (
    bm25_score_per_doc,
)


def _per_doc(spark, rows, id_type):
    return spark.createDataFrame(
        rows, f"doc {id_type}, dl long, _tf0 long, _tf1 long"
    )


def test_bm25_empty_corpus_preserves_string_id_type(spark):
    empty = bm25_score_per_doc(
        _per_doc(spark, [], "string"), "doc", ("a", "b")
    )
    nonempty = bm25_score_per_doc(
        _per_doc(spark, [("d1", 5, 2, 1), ("d2", 3, 0, 1)], "string"),
        "doc",
        ("a", "b"),
    )
    assert empty.count() == 0
    assert [(f.name, f.dataType) for f in empty.schema.fields] == [
        (f.name, f.dataType) for f in nonempty.schema.fields
    ]


def test_bm25_empty_corpus_long_id_unchanged(spark):
    empty = bm25_score_per_doc(_per_doc(spark, [], "long"), "doc", ("a",))
    assert empty.count() == 0
    assert dict(empty.dtypes) == {
        "doc": "bigint",
        "dl": "bigint",
        "score6": "bigint",
        "rank": "int",
    }


def test_bounded_series_eval_raises_on_fact_proportional_input(spark):
    """The bound assert is the mechanical enforcement of the
    fold-before-collect contract: handing the evaluator an unfolded
    frame must raise, not silently scan fact data driver-side."""
    from sparkstreaming_gmall_scala_spark.operators.series import (
        bounded_series_eval,
    )

    df = spark.range(100).select(F.col("id").alias("d"))
    with pytest.raises(AssertionError, match="documented bound"):
        bounded_series_eval(
            df, ("d",), lambda rows: [], "d long", bound=10
        )
    # at-or-under the bound goes through
    out = bounded_series_eval(
        df, ("d",), lambda rows: [(len(rows),)], "n long", bound=100
    )
    assert out.collect()[0]["n"] == 100


def test_series_entry_builders_have_iterative_notes():
    """Every catalog builder that references a registered series
    evaluator entry-point (ewma_fold, holt_fold, isotonic_eval, km_eval,
    runs_eval, ...) is driver-materialized by construction, so its
    PLANS.md row reads 0-scan — it must carry an ITERATIVE note. This
    replaces the per-query-comment convention with a mechanical check
    keyed off SERIES_EVALUATORS (r12 verdict #8)."""
    import sparkstreaming_gmall_scala_spark.operators.smoothing  # noqa: F401
    from sparkstreaming_gmall_scala_spark.operators.series import (
        SERIES_EVALUATORS,
    )
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
    from tools.gen_plans import ITERATIVE

    registry = load_all()  # imports plans.* -> registers their entries
    assert {
        "ewma_fold",
        "holt_fold",
        "isotonic_eval",
        "km_eval",
        "runs_eval",
    } <= set(SERIES_EVALUATORS)

    pat = re.compile(
        r"\b(" + "|".join(map(re.escape, SERIES_EVALUATORS)) + r")\b"
    )
    missing, routed = [], []
    for name, q in registry.items():
        try:
            src = textwrap.dedent(inspect.getsource(q.builder))
        except (OSError, TypeError):
            continue
        if pat.search(src):
            routed.append(name)
            if name not in ITERATIVE:
                missing.append(name)
    assert not missing, (
        "builders routed through a series evaluator without an "
        f"ITERATIVE note in tools/gen_plans.py: {sorted(missing)}"
    )
    # the six families the consolidation covers are actually routed
    for name in (
        "revenue_ewma",
        "holt_forecast",
        "isotonic_revenue",
        "user_survival",
        "revenue_runs_test",
    ):
        assert name in routed, name
