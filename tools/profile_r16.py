"""Round-16 optimization profiling harness (guide §1).

For each named catalog query: run builder+count ``runs`` times in one
warm session, record per-run wall seconds AND the exact Spark job count
(statusTracker job-id delta — host-independent evidence; on this sandbox
a trivial warm job costs ~150-290 ms, so Σjobs×floor ≈ the bench total).
Not part of the bench contract — a measurement tool only.

Usage:  python tools/profile_r16.py <query> [query ...]
        python tools/profile_r16.py --headline        (whole bench set)
Env:    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkstreaming_gmall_scala_spark.plans.catalog import load_all  # noqa: E402
from sparkstreaming_gmall_scala_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("PROFILE_RUNS", "3"))


def group_jobs(spark, group: str) -> int:
    st = spark.sparkContext.statusTracker()
    return len(st.getJobIdsForGroup(group) or [])


def main() -> int:
    names = sys.argv[1:]
    spark = get_spark("profile_r16")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    if names and names[0] == "--headline":
        import bench

        names = list(bench.HEADLINE) + names[1:]
    # warm codegen/classloading once so run 1 isn't pure JIT ramp
    registry["trademark_stat"].builder(spark, SF_DIR).count()
    out = {}
    for name in names:
        q = registry[name]
        samples, jobs = [], []
        for i in range(RUNS):
            grp = f"prof:{name}:{i}"
            spark.sparkContext.setJobGroup(grp, name)
            t0 = time.perf_counter()
            q.builder(spark, SF_DIR).count()
            samples.append(round(time.perf_counter() - t0, 3))
            jobs.append(group_jobs(spark, grp))
            spark.sparkContext._jsc.clearJobGroup()
            spark.catalog.clearCache()
        out[name] = {"min": min(samples), "runs": samples, "jobs": jobs}
        print(
            f"## {name}: min={min(samples):.3f}s jobs={jobs} runs={samples}",
            flush=True,
        )
    path = os.environ.get("PROFILE_OUT")
    if path:
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
        print(f"-> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
