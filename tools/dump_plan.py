"""Dump .explain('formatted') for catalog queries to plans/r15/<name>_<tag>.txt.

Usage: python tools/dump_plan.py <before|after> <query> [query ...]

For iterative/collect-driver queries the final frame's plan may be a
LocalTableScan or an unrolled lineage monster; the file still records it
(the lineage depth IS the evidence for the round-15 checkpointing fix),
truncated to a sane size.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkstreaming_gmall_scala_spark.plans.catalog import load_all  # noqa: E402
from sparkstreaming_gmall_scala_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
)
MAX_CHARS = 120_000


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("dump_plan")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = registry[name].builder(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if len(plan) > MAX_CHARS:
            plan = (
                plan[:MAX_CHARS]
                + f"\n... [truncated: {len(plan)} chars total — the "
                "unrolled-iteration lineage; see OPTIMIZATION_r15.md]\n"
            )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
