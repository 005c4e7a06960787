"""Round-14 composition pins.

corpus_curate_calibrated is REGISTERED as one fused single-scan plan;
these pins hold it to its contract: the selected set is exactly the
composition of the two queries it fuses (corpus_curate_fast ∩
calibrated_quality_scores thresholded on cal_keep_ppm), so neither the
shared-base rewiring nor the broadcast step-function application can
drift from the standalone operators' semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.plans.catalog import load_all
from sparkstreaming_gmall_scala_spark.plans.llm import CAL_KEEP_MIN_PPM


def test_curate_calibrated_equals_composition(spark, sf_dir):
    reg = load_all()
    got = {
        tuple(r)
        for r in reg["corpus_curate_calibrated"].builder(spark, sf_dir)
        .select("doc_id", "source", "cal_keep_ppm")
        .collect()
    }
    fast = reg["corpus_curate_fast"].builder(spark, sf_dir)
    cal = (
        reg["calibrated_quality_scores"].builder(spark, sf_dir)
        .filter(F.col("cal_keep_ppm") >= F.lit(CAL_KEEP_MIN_PPM))
        .select("doc_id", "cal_keep_ppm")
    )
    expect = {
        tuple(r)
        for r in fast.join(cal, "doc_id")
        .select("doc_id", "source", "cal_keep_ppm")
        .collect()
    }
    assert got == expect and got


def test_calibrated_threshold_actually_cuts(spark):
    """The floor is not vacuous: on a corpus where low-quality bins DO
    lose the dedup race, the fused gate drops those docs while the raw
    curation stages would keep them. Synthetic corpus: short docs (low
    quality bin) are all exact duplicates of each other, long docs are
    unique — so PAVA maps the low bins to a small P(keep) and the
    threshold removes the short-doc survivors the raw filter keeps."""
    from sparkstreaming_gmall_scala_spark.plans.llm import (
        _calibrate_per_fp,
    )
    from sparkstreaming_gmall_scala_spark.streaming.calibration import (
        calib_per_doc,
    )

    rows = []
    # 40 short duplicate docs (one survivor per text), 2 distinct texts
    for i in range(40):
        rows.append((i, "dup text " + ("a" if i % 2 else "b")))
    # 20 long unique docs
    for i in range(40, 60):
        rows.append(
            (i, " ".join(f"the quick brown fox {i} token{j}" for j in range(30)))
        )
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    cal = _calibrate_per_fp(calib_per_doc(d, "doc_id", "text"))
    by_bin = {
        r["bin"]: r["cal_keep_ppm"]
        for r in cal.select("bin", "cal_keep_ppm").distinct().collect()
    }
    # monotone non-decreasing in bin, and the duplicate-heavy low bins
    # sit strictly under the threshold while unique docs sit at 1.0
    bins = sorted(by_bin)
    assert all(
        by_bin[a] <= by_bin[b] for a, b in zip(bins, bins[1:])
    ), by_bin
    assert min(by_bin.values()) < CAL_KEEP_MIN_PPM <= max(by_bin.values())
    kept = cal.filter(F.col("cal_keep_ppm") >= F.lit(CAL_KEEP_MIN_PPM))
    # every kept doc is from a high-P(keep) bin; at least the unique
    # long docs survive and at least one short-dup survivor is cut
    assert kept.count() >= 20
    cut = cal.filter(
        (F.col("cal_keep_ppm") < F.lit(CAL_KEEP_MIN_PPM))
        & (F.col("keep") == 1)
    )
    assert cut.count() >= 1


def test_skyline_tie_and_strictness_semantics(spark):
    """doc_skyline's dominance semantics on a hand graph: equal-(x,y)
    docs tie onto the frontier together; a doc equal on one axis and
    beaten on the other is dominated; interior docs drop."""
    from pyspark.sql import Window

    # (x=q6 stand-in, y=n_tokens stand-in) — drive the same plan shape
    # through a local frame by re-deriving the filter inline
    rows = [
        (1, 10, 100),  # frontier (best y at x=10)
        (2, 10, 100),  # exact tie with 1 -> both survive
        (3, 10, 90),   # same x, smaller y -> dominated by 1
        (4, 20, 80),   # frontier (higher x, smaller y)
        (5, 15, 80),   # dominated by 4 (x 15<20, y equal)
        (6, 5, 50),    # dominated by everything above
        (7, 25, 10),   # frontier (max x)
    ]
    per = spark.createDataFrame(rows, ["doc_id", "q6", "n_tokens"])
    byx = per.groupBy("q6").agg(F.max("n_tokens").alias("_max_n"))
    w = (
        Window.orderBy(F.col("q6").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = byx.withColumn("_m_above", F.max("_max_n").over(w))
    got = {
        r["doc_id"]
        for r in per.join(F.broadcast(m), "q6")
        .filter(
            (F.col("n_tokens") == F.col("_max_n"))
            & (
                F.col("_m_above").isNull()
                | (F.col("n_tokens") > F.col("_m_above"))
            )
        )
        .collect()
    }
    # brute-force dominance reference
    expect = set()
    for d, x, y in rows:
        if not any(
            od != d and ox >= x and oy >= y and (ox > x or oy > y)
            for od, ox, oy in rows
        ):
            expect.add(d)
    assert got == expect == {1, 2, 4, 7}
