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
    assert no_oracle == {
        # k-means seeds order by Spark's Murmur3 hash — not reproducible
        # in DuckDB SQL, so the IVF family stays rows-only + recall tests
        "knn_ivf",
        "knn_ivf_persisted",
        # float64-matmul summation order differs from the fold in the
        # last ulp — pair-set equality is tested instead
        "embed_near_dup_vec",
        # HLL estimates are engine-specific; pytest bounds the error
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
