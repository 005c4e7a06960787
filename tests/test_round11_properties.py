"""Property-based pins for the round-11 operators: Hypothesis inputs vs
trivially-correct local references — bucket boundaries vs a sorted list,
KS vs direct CDF comparison, Kendall vs the O(n²) definition, the runs
test vs a literal scan, Simpson diversity vs fractions arithmetic."""

from __future__ import annotations

import math
from fractions import Fraction

from hypothesis import given, settings, strategies as st

_SETTINGS = dict(max_examples=12, deadline=None, derandomize=True)
# r16 (driver pytest budget): heavy-per-example pipelines run 6 fixed
# (derandomized) examples; cheap properties keep 12.
_SETTINGS_HEAVY = dict(max_examples=6, deadline=None, derandomize=True)


# --- value_bucket_bounds vs sorted reference --------------------------------
@settings(**_SETTINGS_HEAVY)
@given(
    vals=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=60),
    k=st.integers(min_value=2, max_value=8),
)
def test_value_bucket_bounds_match_sorted_ranks(spark, vals, k):
    from sparkstreaming_gmall_scala_spark.operators.analytics import (
        bucket_score,
        value_bucket_bounds,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    bounds = value_bucket_bounds(df, "v", k)
    srt = sorted(vals)
    n = len(vals)
    want = [srt[(j * n + k - 1) // k - 1] for j in range(1, k)]
    assert bounds == want
    # and the score column reproduces the local smallest-covering-bucket
    from pyspark.sql import functions as F

    got = {
        r["v"]: r["s"]
        for r in df.select(
            "v", bucket_score(F.col("v"), bounds).alias("s")
        ).distinct().collect()
    }
    for v in set(vals):
        assert got[v] == 1 + sum(1 for b in bounds if b < v)


# --- value_bucket_bounds_multi == per-column value_bucket_bounds ------------
@settings(**_SETTINGS_HEAVY)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=40),
            st.integers(min_value=1, max_value=9),
            st.integers(min_value=1, max_value=2000),
        ),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(min_value=2, max_value=6),
)
def test_value_bucket_bounds_multi_matches_single(spark, rows, k):
    """The one-job melted form must be bit-identical to three separate
    value_bucket_bounds calls (rfm_segments' correctness hinges on it)."""
    from sparkstreaming_gmall_scala_spark.operators.analytics import (
        value_bucket_bounds,
        value_bucket_bounds_multi,
    )

    df = spark.createDataFrame(rows, "rec long, freq long, mon long")
    multi = value_bucket_bounds_multi(df, ["rec", "freq", "mon"], k)
    for c in ("rec", "freq", "mon"):
        assert multi[c] == value_bucket_bounds(df, c, k)


# --- KS statistic vs direct CDF comparison ----------------------------------
@settings(**_SETTINGS)
@given(
    g1=st.lists(st.integers(min_value=1, max_value=20), min_size=1, max_size=40),
    g2=st.lists(st.integers(min_value=1, max_value=20), min_size=1, max_size=40),
)
def test_ks_cross_multiplied_max_equals_cdf_sup(spark, g1, g2):
    """The integer form max|cum1·n2 − cum2·n1| over the merged histogram
    equals n1·n2·sup|F1−F2| computed the textbook way."""
    from pyspark.sql import functions as F

    from sparkstreaming_gmall_scala_spark.operators.skew import (
        size_histogram_cum,
    )

    rows = [(v, 1, 0) for v in g1] + [(v, 0, 1) for v in g2]
    v = (
        spark.createDataFrame(rows, "s long, is1 long, is2 long")
        .groupBy("s")
        .agg(F.sum("is1").alias("c1"), F.sum("is2").alias("c2"))
        .persist()
    )
    v.count()
    cum1 = size_histogram_cum(v.select("s", F.col("c1").alias("cnt"))).select(
        "s", F.col("cum").alias("cum1")
    )
    cum2 = size_histogram_cum(v.select("s", F.col("c2").alias("cnt"))).select(
        "s", F.col("cum").alias("cum2")
    )
    n1, n2 = len(g1), len(g2)
    d_num = (
        cum1.join(cum2, "s")
        .agg(F.max(F.abs(F.col("cum1") * n2 - F.col("cum2") * n1)).alias("d"))
        .collect()[0]["d"]
    )
    v.unpersist()
    values = sorted(set(g1) | set(g2))
    want = max(
        abs(
            sum(1 for x in g1 if x <= t) * n2
            - sum(1 for x in g2 if x <= t) * n1
        )
        for t in values
    )
    assert d_num == want


# --- Kendall tau-b counts vs the O(n²) definition ----------------------------
@settings(**_SETTINGS_HEAVY)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=3,
        max_size=25,
    )
)
def test_kendall_counts_match_definition(spark, pts):
    from pyspark.sql import functions as F

    daily = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "d long, x long, y long"
    )
    a = daily.select(F.col("d").alias("d1"), F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = daily.select(F.col("d").alias("d2"), F.col("x").alias("x2"), F.col("y").alias("y2"))
    prod = (F.col("x1") - F.col("x2")) * (F.col("y1") - F.col("y2"))
    row = (
        a.crossJoin(b)
        .filter(F.col("d1") < F.col("d2"))
        .agg(
            F.sum((prod > 0).cast("long")).alias("c"),
            F.sum((prod < 0).cast("long")).alias("d"),
        )
        .collect()[0]
    )
    c = d = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            p = (pts[i][0] - pts[j][0]) * (pts[i][1] - pts[j][1])
            c += p > 0
            d += p < 0
    assert (row["c"], row["d"]) == (c, d)


# --- runs fold vs a literal scan ---------------------------------------------
@settings(**_SETTINGS)
@given(
    signs=st.lists(st.sampled_from([1, -1]), min_size=2, max_size=50)
)
def test_runs_fold_matches_scan(signs):
    # the driver-side fold used by revenue_runs_test, isolated
    r, prev = 0, None
    for sg in signs:
        if sg != prev:
            r += 1
        prev = sg
    want = 1 + sum(1 for i in range(1, len(signs)) if signs[i] != signs[i - 1])
    assert r == want


# --- Simpson diversity vs exact fractions ------------------------------------
@settings(**_SETTINGS)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.sampled_from(["a", "b", "c", "d"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_simpson_ppm_matches_fractions(spark, evs):
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(evs, "user_id long, event_type string")
    ct = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    per = ct.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("sumc2"),
    )
    got = {
        r["user_id"]: r["p"]
        for r in per.select(
            "user_id",
            F.expr("(n * n - sumc2) * 1000000L div (n * n)").alias("p"),
        ).collect()
    }
    from collections import Counter

    by_user: dict[int, Counter] = {}
    for u, t in evs:
        by_user.setdefault(u, Counter())[t] += 1
    for u, cnt in by_user.items():
        n = sum(cnt.values())
        simpson = 1 - sum(Fraction(c, n) ** 2 for c in cnt.values())
        assert got[u] == math.floor(simpson * 1000000)


# --- RFM segment CASE is total and deterministic -----------------------------
def test_rfm_segment_case_total():
    """Every (r, f, m) in 1..5³ lands in exactly one segment under the
    fixed CASE order (mirrors both the Spark when-chain and the SQL)."""
    def segment(r, f, m):
        if r >= 4 and f >= 4 and m >= 4:
            return "champion"
        if f >= 4:
            return "loyal"
        if m >= 4:
            return "big_spender"
        if r <= 2 and f >= 3:
            return "at_risk"
        if r <= 2:
            return "hibernating"
        return "regular"

    seen = set()
    for r in range(1, 6):
        for f in range(1, 6):
            for m in range(1, 6):
                seen.add(segment(r, f, m))
    assert seen == {
        "champion", "loyal", "big_spender", "at_risk", "hibernating",
        "regular",
    }
