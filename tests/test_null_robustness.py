"""Degenerate-input robustness: null / empty / whitespace-only / CJK+
emoji text through the text-operator families — no crashes, documented
graceful behavior (nulls drop out of explodes, fractions go null, empty
docs emit nothing). Real corpora contain all of these; the synthetic
test tables contain none, so this file is the only coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

DOCS = [
    (1, None),
    (2, ""),
    (3, "   "),
    (4, "normal text here okay"),
    (5, "émoji 🙂 中文 test"),
]
SCHEMA = "doc_id long, text string"


def _docs(spark):
    return spark.createDataFrame(DOCS, SCHEMA)


def test_bpe_family_survives_degenerate_docs(spark):
    from sparkstreaming_gmall_scala_spark.operators.bpe import (
        bpe_learn,
        merge_candidates,
    )

    d = _docs(spark)
    rows = merge_candidates(d, "doc_id", "text", 10).collect()
    # only doc 4 and 5 contribute pairs; all counts 1, lexicographic rank
    assert all(r["cnt"] == 1 for r in rows)
    merges = bpe_learn(d, "doc_id", "text", 2)
    assert merges == [("here", "okay", 1), ("normal", "text", 1)]


def test_winnowing_emits_nothing_for_short_or_null_docs(spark):
    from sparkstreaming_gmall_scala_spark.operators.dedup import (
        winnow_fingerprints,
    )

    assert winnow_fingerprints(_docs(spark), "doc_id", "text").count() == 0


def test_script_mix_null_text_yields_null_fractions(spark, sf_dir):
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    # run the registered builder against a temp view shim is overkill —
    # exercise the same expressions directly on degenerate rows
    d = _docs(spark)
    n = F.length("text")
    out = d.select(
        "doc_id",
        (n - F.length(F.regexp_replace("text", "[A-Za-z]", ""))).alias(
            "n_alpha"
        ),
    ).collect()
    by_id = {r["doc_id"]: r["n_alpha"] for r in out}
    assert by_id[1] is None  # null propagates, never throws
    assert by_id[2] == 0 and by_id[3] == 0
    assert by_id[5] == 8  # ASCII letters only; CJK/emoji fall to 'other'
    # the registered query itself still builds and runs (schema intact)
    assert load_all()["script_mix"].builder(spark, sf_dir).columns == [
        "doc_id", "n_chars", "alpha_frac", "digit_frac", "space_frac",
        "other_frac",
    ]


def test_pagerank_empty_edges(spark):
    from sparkstreaming_gmall_scala_spark.operators.pagerank import pagerank

    out = pagerank(
        spark.createDataFrame([], "src long, dst long"), iters=2
    )
    assert out.count() == 0


def _empty_sf_dir(spark, tmp_path):
    """Write empty (schema-preserving) copies of the tables the guarded
    builders read, so the empty-corpus path runs end to end."""
    import os

    src = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    d = str(tmp_path / "sf_empty")
    for t in ("orders", "customer", "nation"):
        spark.read.parquet(f"{src}/{t}.parquet").limit(0).write.mode(
            "overwrite"
        ).parquet(f"{d}/{t}.parquet")
    return d


def test_empty_orders_builders_return_typed_empty_frames(spark, tmp_path):
    """r11 ADVICE: theil_sen_trend / revenue_runs_test / rfm_segments must
    early-return a typed empty frame on an empty orders table (the
    decile_profile convention), not raise IndexError/TypeError off the
    scalar collect."""
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    d = _empty_sf_dir(spark, tmp_path)
    reg = load_all()
    for name, cols in [
        ("theil_sen_trend", ["n_name", "n_pairs", "median_slope6"]),
        (
            "revenue_runs_test",
            ["n_above", "n_below", "n_runs", "z_ppm"],
        ),
        (
            "rfm_segments",
            ["custkey", "r_score", "f_score", "m_score", "segment"],
        ),
    ]:
        out = reg[name].builder(spark, d)
        assert out.columns == cols, (name, out.columns)
        assert out.count() == 0, name
