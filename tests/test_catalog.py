"""Catalog contract: every registered query builds and returns rows with a
stable schema at sf0.001; entry() smoke-runs; oracle SQL strings exist for
every SQL-expressible query."""

from __future__ import annotations

import pytest

from sparkstreaming_gmall_scala_spark.plans.catalog import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_registry_nonempty_and_documented(registry):
    assert len(registry) >= 20
    for name, q in registry.items():
        assert q.doc, f"{name} has no docstring"


def test_oracle_coverage(registry):
    """Queries without an oracle must be the documented non-SQL ones only."""
    no_oracle = {n for n, q in registry.items() if q.oracle is None}
    assert no_oracle <= {
        "simhash", "knn_lsh", "knn_lsh_persisted", "knn_ivf",
        "knn_ivf_persisted", "embed_near_dup_lsh", "embed_near_dup_vec",
        "dau_approx",
    }, no_oracle


@pytest.mark.parametrize(
    "name", sorted(load_all().keys())
)
def test_query_builds_and_runs(spark, sf_dir, registry, name):
    df = registry[name].builder(spark, sf_dir)
    # schema is stable (non-empty, named columns) and the plan executes
    assert df.columns
    assert df.count() >= 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())
