"""Prefix-filtering exact set-similarity join (operators/dedup.py:
jaccard_pairs_prefix): LOSSLESS candidate pruning — the pair set equals
the co-occurrence-candidate jaccard_pairs row-for-row, on the corpus
fixture and on adversarial constructions."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.dedup import (
    jaccard_pairs,
    jaccard_pairs_prefix,
    shingle_rows,
)
from sparkstreaming_gmall_scala_spark.sources import load_table


def _pairs(df):
    return {tuple(r) for r in df.collect()}


def test_prefix_equals_cooccurrence_on_corpus(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(d, "doc_id", "text", n=3)
    base = _pairs(jaccard_pairs(sh, "doc_id", max_df=20, threshold=0.5))
    pref = _pairs(
        jaccard_pairs_prefix(sh, "doc_id", max_df=20, threshold=0.5)
    )
    assert pref == base and base  # identical, and non-vacuous


def test_prefix_lossless_on_adversarial_overlaps(spark):
    """Crafted so the only shared shingles are MID-frequency (present in
    several docs — the tokens naive frequency-pruning would be tempted to
    drop) and set sizes straddle the t·|X| size-ratio boundary; the
    prefix join must still find exactly the brute-force pair set at
    every threshold."""
    docs = []
    # family A: 6 docs sharing a long common core with small unique tails
    core = " ".join(f"core{i}" for i in range(20))
    for k in range(6):
        docs.append((k, core + f" tail{k}a tail{k}b"))
    # family B: near-identical pair
    docs.append((100, "alpha beta gamma delta epsilon zeta eta theta"))
    docs.append((101, "alpha beta gamma delta epsilon zeta eta iota"))
    # singleton noise docs (no qualifying partner)
    for k in range(200, 210):
        docs.append((k, f"noise{k} " + " ".join(f"w{k}_{j}" for j in range(5))))
    d = spark.createDataFrame(docs, ["doc_id", "text"])
    sh = shingle_rows(d, "doc_id", "text", n=3)
    for t in (0.3, 0.5, 0.8):
        base = _pairs(jaccard_pairs(sh, "doc_id", max_df=50, threshold=t))
        pref = _pairs(
            jaccard_pairs_prefix(sh, "doc_id", max_df=50, threshold=t)
        )
        assert pref == base, (t, pref ^ base)
    # the t=0.5 family-A clique must actually be there (non-vacuous)
    base = _pairs(jaccard_pairs(sh, "doc_id", max_df=50, threshold=0.5))
    assert {(a, b) for a, b, _ in base} >= {
        (a, b) for a in range(6) for b in range(a + 1, 6)
    }


def test_prefix_candidate_space_is_smaller(spark, sf_dir):
    """The point of the rewrite: on the corpus fixture the prefix join
    examines strictly fewer candidate pairs than the all-co-occurrence
    join (counted by re-deriving both candidate sets)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(d, "doc_id", "text", n=3).persist()
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    kept = sh.join(
        F.broadcast(dfreq.filter(F.col("_df") > 20).select("shingle")),
        "shingle",
        "left_anti",
    ).persist()
    # co-occurrence candidates
    a, b = kept.alias("a"), kept.alias("b")
    n_cooc = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    # prefix candidates (t = 0.5)
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        kept.join(dfreq, "shingle")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("_df", "shingle")
            ),
        )
        .join(sizes, "doc_id")
    )
    prefix = ranked.filter(
        F.col("_rn") <= F.col("n") - F.ceil(F.lit(0.5) * F.col("n")) + 1
    )
    pa, pb = prefix.alias("a"), prefix.alias("b")
    n_pref = (
        pa.join(
            pb,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    sh.unpersist()
    kept.unpersist()
    assert n_pref < n_cooc, (n_pref, n_cooc)
