"""DuckDB oracle parity for UNGATED catalog entries at sf0.001.

The driver's correctness gate only runs the 50 gated queries; the ungated
entries (in-memory twins, gate-budget rotations, and the extension
families past the budget) carry full oracles too — this test runs that
same row-count + columns + exact-value comparison inside the suite so an
ungated regression can't hide until a manual verify_local run.
"""

from __future__ import annotations

import pandas as pd
import pytest

from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
from sparkstreaming_gmall_scala_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"

_UNGATED_WITH_ORACLE = sorted(
    n for n, q in load_all().items() if not q.gated and q.oracle is not None
)


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("object"):
            df[c] = df[c].map(repr)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", _UNGATED_WITH_ORACLE)
def test_ungated_query_matches_oracle(spark, duck, name):
    q = load_all()[name]
    sdf = q.builder(spark, SF_DIR).toPandas()
    odf = duck.execute(q.oracle).fetchdf()
    assert len(sdf) == len(odf), (len(sdf), len(odf))
    assert sorted(sdf.columns) == sorted(odf.columns)
    a, b = _canon(sdf.copy()), _canon(odf.copy())
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
