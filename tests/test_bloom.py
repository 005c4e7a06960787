"""Bloom-filter decontamination: one-sided-error and plan properties.

Cross-engine value parity (the bloom flag is deterministic, so DuckDB
reproduces it exactly) lives in tests/test_oracle_parity.py; here we pin
the semantics that make a bloom filter a bloom filter: no false
negatives at ANY size, false positives appearing as the filter
saturates, agreement between the production bitset-UDF path and the
join-semantics reference, and the zero-shuffle probe plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.bloom import (
    _positions,
    bloom_build,
    bloom_contaminated,
)
from sparkstreaming_gmall_scala_spark.operators.dedup import shingle_rows
from sparkstreaming_gmall_scala_spark.operators.textstats import (
    ngram_overlap_flags,
)
from sparkstreaming_gmall_scala_spark.sources import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _eval(d):
    return d.filter(F.col("doc_id") < 10)


def _bloom_flags(spark, d, m, k):
    bits = bloom_build(_eval(d), "doc_id", "text", n=3, m=m, k=k)
    return {
        r["doc_id"]: r["contaminated"]
        for r in bloom_contaminated(
            d, "doc_id", "text", bits, n=3, m=m, k=k
        ).collect()
    }


def _join_reference_flags(d, m, k):
    """The oracle's definition computed in-Spark: a doc is flagged iff
    some distinct shingle has ALL k positions in the eval position set."""
    doc_sh = shingle_rows(d, "doc_id", "text", n=3)
    ev_pos = (
        shingle_rows(_eval(d), "doc_id", "text", n=3)
        .select(F.explode(_positions(F.col("shingle"), m, k)).alias("p"))
        .distinct()
    )
    pset = {r["p"] for r in ev_pos.collect()}
    flagged = set()
    for r in doc_sh.select(
        "doc_id", _positions(F.col("shingle"), m, k).alias("ps")
    ).collect():
        if all(p in pset for p in r["ps"]):
            flagged.add(r["doc_id"])
    return {
        r["doc_id"]: r["doc_id"] in flagged for r in d.select("doc_id").collect()
    }


def test_no_false_negatives_at_default_size(spark, sf_dir):
    """Exact-contaminated docs must all be bloom-flagged (the one-sided
    error guarantee) at the registered query's m=2^20."""
    d = _docs(spark, sf_dir)
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in ngram_overlap_flags(d, _eval(d), "doc_id", "text", n=3).collect()
    }
    bloom = _bloom_flags(spark, d, m=1 << 20, k=4)
    for doc, is_cont in exact.items():
        if is_cont:
            assert bloom[doc], f"false negative on doc {doc}"


def test_small_filter_saturates_but_never_misses(spark, sf_dir):
    """Shrinking m forces false positives (that's the bloom tradeoff) yet
    can never introduce a false negative; and the bitset path must still
    agree exactly with the join-semantics reference — FPs are
    deterministic, not noise."""
    d = _docs(spark, sf_dir).limit(200)
    m, k = 1 << 10, 2
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in ngram_overlap_flags(d, _eval(d), "doc_id", "text", n=3).collect()
    }
    bloom = _bloom_flags(spark, d, m=m, k=k)
    ref = _join_reference_flags(d, m=m, k=k)
    assert bloom == ref
    fn = [doc for doc, c in exact.items() if c and not bloom[doc]]
    assert fn == []
    fp = [doc for doc, c in exact.items() if not c and bloom[doc]]
    assert len(fp) > 0, "1024-bit filter over ~4k eval shingles must collide"


def test_probe_plan_has_no_exchange(spark, sf_dir):
    """The probe is scan → project → Arrow UDF: flagging must not
    shuffle (that's the whole point vs the broadcast-join exact check,
    whose build side grows with the benchmark suite)."""
    d = _docs(spark, sf_dir)
    bits = bloom_build(_eval(d), "doc_id", "text", n=3)
    flags = bloom_contaminated(d, "doc_id", "text", bits, n=3)
    plan = flags._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_ngram_count_matches_shingle_rows(spark, sf_dir):
    """n_ngrams is the distinct-shingle count — same unit set the exact
    decontaminate path uses."""
    d = _docs(spark, sf_dir)
    bits = bloom_build(_eval(d), "doc_id", "text", n=3)
    got = {
        r["doc_id"]: r["n_ngrams"]
        for r in bloom_contaminated(d, "doc_id", "text", bits, n=3).collect()
    }
    want = {
        r["doc_id"]: r["n"]
        for r in shingle_rows(d, "doc_id", "text", n=3)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
