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
    # canonical materialized queries (bounded driver folds)
    for name in ("theil_sen_trend", "cohort_ltv", "revenue_runs_test"):
        assert name in flagged, name
    # scalar-collect but distributed result — must stay unflagged
    for name in ("rfm_segments", "knn_ivf_pq", "knn_ivf_pq_persisted"):
        assert name not in flagged, name
