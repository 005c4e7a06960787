"""Round-15 optimization profiling harness (guide §1).

Times isolated pipeline fragments with the noop sink so we measure the
computation, not the sink, and labels jobs for UI-free triage. Not part
of the bench contract — a measurement tool only.

Usage:  python tools/profile_r15.py [fragment ...]
Env:    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparkstreaming_gmall_scala_spark.session import get_spark  # noqa: E402
from sparkstreaming_gmall_scala_spark.sources import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, runs=3):
    spark.sparkContext.setJobDescription(name)
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)
    print(f"## {name}: min={min(samples):.3f}s runs={samples}", flush=True)
    return min(samples)


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("profile_r15")
    spark.sparkContext.setLogLevel("ERROR")

    def want(name):
        return not only or any(o in name for o in only)

    d = load_table(spark, SF_DIR, "documents")
    from sparkstreaming_gmall_scala_spark.operators.dedup import (
        _pair_candidates,
        jaccard_pairs,
        minhash_signatures,
        shingle_rows,
    )

    if want("docs_scan"):
        timed(spark, "docs_scan", lambda: noop(d.select("doc_id", "text")))
    if want("tokenize"):
        toks = d.select(
            "doc_id",
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit("")
            ).alias("_toks"),
        )
        timed(spark, "tokenize_only", lambda: noop(toks))
    if want("shingle"):
        timed(
            spark,
            "shingle_rows",
            lambda: noop(shingle_rows(d, "doc_id", "text", n=3)),
        )
    if want("minhash"):
        timed(
            spark,
            "shingle+minhash8",
            lambda: noop(
                minhash_signatures(
                    shingle_rows(d, "doc_id", "text", n=3), "doc_id", 8
                )
            ),
        )
    if want("paircand"):

        def run_pc():
            sh = shingle_rows(d, "doc_id", "text", n=3)
            joined, release = _pair_candidates(sh, "doc_id", 20)
            noop(joined)
            release()

        timed(spark, "pair_candidates", run_pc)
    if want("jaccard"):
        timed(
            spark,
            "jaccard_pairs_full",
            lambda: jaccard_pairs(
                shingle_rows(d, "doc_id", "text", n=3), "doc_id", 20, 0.5
            ).unpersist(),
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
