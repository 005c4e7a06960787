"""Behavior tests for the corpus-cleaning operators (the synthetic corpus
contains no newlines, emails, digits, bullets, or ellipses, so the oracle
rows only pin the identity paths — these tests exercise the real
branches)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.cleaning import (
    line_dedup,
    pii_mask,
)
from sparkstreaming_gmall_scala_spark.operators.textstats import (
    gopher_quality,
    token_entropy,
)


def test_pii_mask_redacts_emails_and_phones(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact alice@example.com or bob.smith@mail.co today"),
            (2, "call 555-123-4567 or 555 1234 9999 now"),
            (3, "mixed a@b.io and 123-456-7890 here"),
            (4, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_mask(docs, "doc_id", "text").collect()}
    assert got[1]["n_emails"] == 2 and got[1]["n_phones"] == 0
    assert got[1]["masked_text"] == "contact <EMAIL> or <EMAIL> today"
    assert got[2]["n_emails"] == 0 and got[2]["n_phones"] == 2
    assert got[2]["masked_text"] == "call <PHONE> or <PHONE> now"
    assert got[3]["masked_text"] == "mixed <EMAIL> and <PHONE> here"
    assert got[4]["masked_text"] == "clean text with no pii at all"


def test_pii_mask_emails_masked_before_phones(spark):
    # digits inside an email local part must not surface as a phone match
    # after the email is masked
    docs = spark.createDataFrame(
        [(1, "reach me at 555-123-4567x@corp.example.org ok")],
        "doc_id long, text string",
    )
    row = pii_mask(docs, "doc_id", "text").collect()[0]
    assert row["n_emails"] == 1
    assert row["n_phones"] == 0
    assert row["masked_text"] == "reach me at <EMAIL> ok"


def test_line_dedup_drops_cross_doc_boilerplate(spark):
    banner = "Accept all cookies to continue"
    docs = spark.createDataFrame(
        [
            (1, f"{banner}\nunique first doc line\nanother one"),
            (2, f"{banner}\nsecond doc body"),
            (3, f"intro line\n{banner}\noutro line"),
            (4, banner),  # all lines drop
            (5, "totally unrelated\n\nwith an empty line kept"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in line_dedup(docs, "doc_id", "text", min_df=3).collect()
    }
    assert got[1]["n_lines"] == 3 and got[1]["n_dropped"] == 1
    assert got[1]["clean_text"] == "unique first doc line\nanother one"
    # order preserved around the dropped middle line
    assert got[3]["clean_text"] == "intro line\noutro line"
    # every doc appears, even fully-dropped ones
    assert got[4]["n_dropped"] == 1 and got[4]["clean_text"] == ""
    # empty lines never count toward df and are kept
    assert got[5]["n_dropped"] == 0
    assert got[5]["clean_text"] == "totally unrelated\n\nwith an empty line kept"


def test_line_dedup_df_counts_distinct_docs(spark):
    # one doc repeating a line 5 times must not promote it to boilerplate
    docs = spark.createDataFrame(
        [
            (1, "spam\nspam\nspam\nspam\nspam"),
            (2, "other text"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in line_dedup(docs, "doc_id", "text", min_df=3).collect()
    }
    assert got[1]["n_dropped"] == 0
    assert got[1]["clean_text"] == "spam\nspam\nspam\nspam\nspam"


def test_line_dedup_plan_has_no_window(spark):
    docs = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nc")], "doc_id long, text string"
    )
    plan = (
        line_dedup(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan[:2000]
    assert "partial_count" in plan, plan[:2000]


def test_gopher_quality_features(spark):
    docs = spark.createDataFrame(
        [
            (1, "plain sensible words flowing along nicely here today"),
            (2, "# # # # spam"),  # symbol-heavy
            (3, "* one\n* two\n* three"),  # all bullets
            (4, "and so it goes...\nmore trailing…\nplain end"),
            (5, "1 2 3 4 5 6 7 8"),  # no alphabetic words, short words
            (6, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in gopher_quality(docs, "doc_id", "text").collect()
    }
    assert got[1]["keep"] is True
    assert got[1]["alpha_frac"] == 1.0 and got[1]["symbol_ratio"] == 0.0
    # 4 '#' over 5 words = 0.8 > 0.1 → rejected
    assert got[2]["symbol_ratio"] == 0.8 and got[2]["keep"] is False
    assert got[3]["bullet_frac"] == 1.0 and got[3]["keep"] is False
    # 2 of 3 lines end with an ellipsis → 0.666667 > 0.3 → rejected
    assert got[4]["ellipsis_frac"] == 0.666667 and got[4]["keep"] is False
    assert got[5]["alpha_frac"] == 0.0 and got[5]["keep"] is False
    assert got[6]["n_words"] == 0 and got[6]["keep"] is False


def test_token_entropy_known_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),  # uniform over 4 → ln(4)
            (2, "x x x x x"),  # degenerate → 0
            (3, ""),  # empty → 0 tokens, 0 entropy
            (4, "a a b b"),  # uniform over 2 → ln(2)
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in token_entropy(docs, "doc_id", "text").collect()
    }
    assert got[1]["n_tokens"] == 4
    assert abs(got[1]["entropy"] - math.log(4)) < 1e-6
    assert got[2]["entropy"] == 0.0
    assert got[3]["n_tokens"] == 0 and got[3]["entropy"] == 0.0
    assert abs(got[4]["entropy"] - math.log(2)) < 1e-6


def test_gopher_and_pii_plans_are_shuffle_free(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], "doc_id long, text string"
    )
    for df in (
        gopher_quality(docs, "doc_id", "text"),
        pii_mask(docs, "doc_id", "text"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]


def test_model_score_plumbing(spark):
    """Classifier scoring: deterministic scores in [0,1), every doc
    scored exactly once (including empty/odd texts), zero shuffle."""
    import hashlib

    from sparkstreaming_gmall_scala_spark.operators.scoring import (
        model_score,
    )

    rows = [(1, "hello world"), (2, ""), (3, "hello world"), (4, "ünïcödé")]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(3)
    out = model_score(docs, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan.split("MapInPandas")[-1]
    got = {r["doc_id"]: r["score"] for r in out.collect()}
    assert len(got) == 4
    for doc_id, text in rows:
        want = (int(hashlib.md5(text.encode()).hexdigest()[:8], 16) % 1_000_000) / 1e6
        assert got[doc_id] == want, (doc_id, got[doc_id], want)
    assert got[1] == got[3]  # identical text ⇒ identical score
    assert all(0.0 <= s < 1.0 for s in got.values())

    # NULL text scores NULL — matching the oracle's md5(NULL) = NULL,
    # not md5('') (round-5 advice): NULL and empty must score differently
    with_null = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    got_null = {
        r["doc_id"]: r["score"] for r in model_score(with_null, "doc_id", "text").collect()
    }
    assert got_null[1] is None
    assert got_null[2] is not None


def test_lm_doc_logprob_matches_hand_computation(spark):
    """Bigram-LM scoring on a toy corpus where the MLE probabilities are
    computable by hand; docs with <2 tokens score 0.0 with n_bigrams=0."""
    import math

    from sparkstreaming_gmall_scala_spark.operators.textstats import (
        lm_doc_logprob,
    )

    rows = [
        (1, "a b a b"),   # bigrams: (a,b) (b,a) (a,b)
        (2, "a b c"),     # bigrams: (a,b) (b,c)
        (3, "x"),         # no bigrams
        (4, ""),          # no tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in lm_doc_logprob(docs, "doc_id", "text").collect()
    }
    # corpus counts: c(a,b)=3 c(b,a)=1 c(b,c)=1; prefixes: c(a,·)=3 c(b,·)=2
    p_ab, p_ba, p_bc = 3 / 3, 1 / 2, 1 / 2

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    want1 = r6((math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3)
    want2 = r6((math.log(p_ab) + math.log(p_bc)) / 2)
    assert got[1] == (3, want1)
    assert got[2] == (2, want2)
    assert got[3] == (0, 0.0)
    assert got[4] == (0, 0.0)
    # repetitive doc 1 is MORE probable (closer to 0) than varied doc 2
    assert got[1][1] > got[2][1]
