"""Text-analysis functions and multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.functions.text import (
    fingerprint,
    shingles,
    token_count,
)
from sparkstreaming_gmall_scala_spark.operators.multimodal import (
    decode_media,
    extract_features,
    to_binary_payload,
)
from sparkstreaming_gmall_scala_spark.operators.textstats import lang_id, quality_score


def test_token_count_and_shingles(spark):
    df = spark.createDataFrame(
        [(1, "a  b\tc\nd e"), (2, "one"), (3, "")], "id long, t string"
    )
    out = {
        r["id"]: (r["n"], r["sh"])
        for r in df.select(
            "id",
            token_count(F.col("t")).alias("n"),
            shingles(F.col("t"), 3).alias("sh"),
        ).collect()
    }
    assert out[1][0] == 5
    assert out[1][1] == ["a b c", "b c d", "c d e"]
    assert out[2][0] == 1
    assert out[2][1] == ["one"]  # short doc → its full token join
    assert out[3][0] == 0


def test_fingerprint_normalizes_ws_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "hello worlds")],
        "id long, t string",
    )
    fps = {r["id"]: r["fp"] for r in df.select("id", fingerprint(F.col("t")).alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat of the house and the dog"),
            (2, "el perro de la casa que ladra el dia"),
            (3, "xyzzy plugh qwerty"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["pred_lang"] for r in lang_id(df, "doc_id", "text").collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "und"


def test_quality_score_bounds_and_ordering(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house went to a park and the end"),
            (2, "@#$% ^&*! ~~~ ###"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in quality_score(df, "doc_id", "text").collect()}
    for r in out.values():
        assert 0.0 <= r["quality"] <= 1.0
        assert 0.0 <= r["stop_ratio"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0
    assert out[1]["quality"] > out[2]["quality"]


def test_multimodal_features_deterministic_fake(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "")], "doc_id long, text string")
    media = to_binary_payload(df, "doc_id", "text")
    # schema contract: (id, payload binary, meta struct)
    assert dict(media.dtypes)["payload"] == "binary"
    out = {r["doc_id"]: r for r in extract_features(media, "doc_id").collect()}
    assert out[1]["n_bytes"] == 3
    assert out[1]["first_byte"] == ord("a")
    assert out[1]["byte_sum"] == ord("a") + ord("b") + ord("c")
    assert out[2]["n_bytes"] == 0 and out[2]["first_byte"] == -1


def test_decode_media_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00", "image/png")


def test_repetition_stats_known_values(spark):
    from sparkstreaming_gmall_scala_spark.operators.textstats import (
        repetition_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),   # 1 distinct / 4 → dup .75; top 2-gram "spam spam" 3/3
            (2, "all words are unique here"),  # dup 0; each 2-gram once → 1/4
            (3, "one"),                   # no 2-grams → frac 0
            (4, ""),                      # empty → all 0
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs, "doc_id", "text").collect()}
    assert got[1]["dup_token_frac"] == 0.75 and got[1]["top_2gram_frac"] == 1.0
    assert got[2]["dup_token_frac"] == 0.0 and got[2]["top_2gram_frac"] == 0.25
    assert got[3]["n_tokens"] == 1 and got[3]["top_2gram_frac"] == 0.0
    assert got[4]["n_tokens"] == 0 and got[4]["dup_token_frac"] == 0.0


def test_ngram_overlap_flags_contamination(spark):
    from sparkstreaming_gmall_scala_spark.operators.textstats import (
        ngram_overlap_flags,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),       # eval doc
            (2, "a quick brown fox appears here today"), # shares "quick brown fox"
            (3, "completely unrelated text with nothing shared"),
        ],
        "doc_id long, text string",
    )
    out = ngram_overlap_flags(
        docs, docs.filter("doc_id = 1"), "doc_id", "text", n=3
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["contaminated"]  # eval doc trivially overlaps itself
    assert got[2]["contaminated"] and got[2]["n_shared_ngrams"] == 1
    assert not got[3]["contaminated"] and got[3]["n_shared_ngrams"] == 0
    assert len(got) == 3  # every input doc present (left semantics)
