"""Round-12 property pins.

1. The ITERATIVE/PLANS audit discipline is now GUARDED (r11 verdict #5):
   any registered builder whose returned frame is driver-materialized
   (collect + a final ``return spark.createDataFrame(...)``) would render
   a misleading 0-scan row in PLANS.md unless tools/gen_plans.py carries
   an ITERATIVE note for it. The r10 ADVICE found three such rows fixed
   by hand; this test makes the next one a test failure, not an audit
   read-through.
"""

from __future__ import annotations

import ast
import inspect
import textwrap


def _returns_materialized_frame(builder) -> bool:
    """True when the builder collects AND its final return statement is a
    ``*.createDataFrame(...)`` call — the materialize convention every
    driver-folded query uses (bounded rows collected, typed frame
    returned). Scalar-only collects (corpus max day, quantile bounds)
    that return a distributed frame don't match: their PLANS rows are
    real executed plans, not LocalTableScans."""
    try:
        src = textwrap.dedent(inspect.getsource(builder))
    except (OSError, TypeError):
        return False
    if ".collect()" not in src:
        return False
    tree = ast.parse(src)
    fn = next(
        n
        for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    )
    rets = [n for n in ast.walk(fn) if isinstance(n, ast.Return)]
    if not rets:
        return False
    last = max(rets, key=lambda r: r.lineno)
    v = last.value
    return (
        isinstance(v, ast.Call)
        and isinstance(v.func, ast.Attribute)
        and v.func.attr == "createDataFrame"
    )


def test_every_materialized_builder_has_an_iterative_plans_note():
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
    from tools.gen_plans import ITERATIVE

    registry = load_all()

    missing = sorted(
        name
        for name, q in registry.items()
        if _returns_materialized_frame(q.builder) and name not in ITERATIVE
    )
    assert not missing, (
        "driver-materialized builders without an ITERATIVE note in "
        f"tools/gen_plans.py (their PLANS.md rows would read 0-scan): "
        f"{missing}"
    )


def test_detector_sees_the_known_materialized_builders():
    """Self-test: the detector must flag the canonical materialized
    builders and must NOT flag scalar-collect queries that return
    distributed frames."""
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    flagged = {
        name
        for name, q in load_all().items()
        if _returns_materialized_frame(q.builder)
    }
    # canonical materialized queries (bounded driver folds).
    # revenue_runs_test left this list at round 13: it now routes
    # through operators/series.py:runs_eval, whose own guard
    # (tests/test_round13_properties.py) enforces the ITERATIVE note.
    for name in ("theil_sen_trend", "cohort_ltv", "brand_affinity"):
        assert name in flagged, name
    # scalar-collect but distributed result — must stay unflagged
    for name in ("rfm_segments", "knn_ivf_pq", "knn_ivf_pq_persisted"):
        assert name not in flagged, name


def test_quartile_queries_window_only_over_histograms(spark, sf_dir):
    """r12 scale pin: the exact-quartile queries' windows (cumulative
    count walks) must sit ABOVE an aggregate — i.e. run over the bounded
    (group, value) count histogram, never over a fact-proportional
    frame. In the ANALYZED logical plan every Window node's direct
    subtree must contain an Aggregate before any relation scan."""
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    reg = load_all()
    n_unpartitioned = 0
    for name in (
        "ship_lag_quantiles",
        "dow_revenue_quartiles",
        "interorder_gap_quantiles",
        "vocab_coverage_curve",
        "basket_size_dist",
    ):
        df = reg[name].builder(spark, sf_dir)
        plan = df._jdf.queryExecution().analyzed().toString()
        lines = plan.split("\n")

        def depth(ln):
            i = 0
            while i < len(ln) and ln[i] in " :+-":
                i += 1
            return i, ln[i:]

        import re

        nodes = [depth(ln) for ln in lines]

        def has_unpartitioned_spec(txt):
            # windowspecdefinition(<partition cols,> <col ASC|DESC ...>,
            # specifiedwindowframe(...)) — unpartitioned iff the FIRST
            # argument already carries a sort direction
            return bool(
                re.search(r"windowspecdefinition\(\S+ (ASC|DESC)", txt)
            )

        for i, (d, txt) in enumerate(nodes):
            if not txt.startswith("Window"):
                continue
            if not has_unpartitioned_spec(txt):
                continue  # partitioned windows may run over facts
            n_unpartitioned += 1
            # walk the subtree: an Aggregate must appear before any
            # Relation at deeper level
            j = i + 1
            ok = False
            while j < len(nodes) and nodes[j][0] > d:
                if nodes[j][1].startswith("Aggregate"):
                    ok = True
                    break
                if nodes[j][1].startswith("Relation"):
                    break
                j += 1
            assert ok, (name, txt, plan[:3000])
    # the guard must not be vacuous: these queries DO carry
    # unpartitioned cumulative walks (over histograms)
    assert n_unpartitioned >= 3, n_unpartitioned
