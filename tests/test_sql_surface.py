"""Raw-SQL entry surface (sources.register_views / run_sql): users can
query every table with spark.sql and get the catalog's exact results and
the same pushdown behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
from sparkstreaming_gmall_scala_spark.sources import (
    TABLES,
    load_table,
    run_sql,
)


def test_every_table_queryable(spark, sf_dir):
    run_sql(spark, sf_dir, "SELECT 1")  # registers views
    for t in TABLES:
        n_sql = spark.sql(f"SELECT count(*) AS n FROM {t}").collect()[0]["n"]
        assert n_sql == load_table(spark, sf_dir, t).count()


def test_sql_q1_equals_catalog_pricing_summary(spark, sf_dir):
    """The TPC-H-Q1 shape written as raw Spark SQL must reproduce the
    catalog's pricing_summary row for row (same rounding, same grouping)."""
    got = run_sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_base_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """,
    )
    want = (
        load_all()["pricing_summary"]
        .builder(spark, sf_dir)
        .select(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "count_order",
        )
    )
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in want.collect())
    assert a == b


def test_view_scan_pushes_filters(spark, sf_dir):
    """A temp view is not an optimization barrier: a filtered projection
    through the view must reach the parquet scan (PushedFilters +
    pruned ReadSchema) exactly like the DataFrame path."""
    run_sql(spark, sf_dir, "SELECT 1")
    df = spark.sql(
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan.split(
        "PushedFilters:"
    )[1][:200], plan[:2000]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_custkey" in read_schema and "o_totalprice" not in read_schema


def test_sql_joins_views_and_catalog_agree_on_enrichment(spark, sf_dir):
    """A three-way SQL join over the views equals the catalog's
    order_enrich for the shared columns."""
    got = run_sql(
        spark,
        sf_dir,
        """
        SELECT o.o_orderkey, c.c_name, n.n_name AS nation_name
        FROM orders o
        LEFT JOIN customer c ON c.c_custkey = o.o_custkey
        LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
        """,
    )
    want = (
        load_all()["order_enrich"]
        .builder(spark, sf_dir)
        .select("o_orderkey", "c_name", "nation_name")
    )
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in want.collect())
    assert a == b
