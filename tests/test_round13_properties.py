"""Round-13 property pins.

Covers the round-12 ADVICE fixes:
- bm25_score_per_doc empty-corpus branch preserves the caller's id type
  (a string-id caller must see the same schema on both paths).
"""
import pyspark.sql.functions as F

from sparkstreaming_gmall_scala_spark.operators.textstats import (
    bm25_score_per_doc,
)


def _per_doc(spark, rows, id_type):
    return spark.createDataFrame(
        rows, f"doc {id_type}, dl long, _tf0 long, _tf1 long"
    )


def test_bm25_empty_corpus_preserves_string_id_type(spark):
    empty = bm25_score_per_doc(
        _per_doc(spark, [], "string"), "doc", ("a", "b")
    )
    nonempty = bm25_score_per_doc(
        _per_doc(spark, [("d1", 5, 2, 1), ("d2", 3, 0, 1)], "string"),
        "doc",
        ("a", "b"),
    )
    assert empty.count() == 0
    assert [(f.name, f.dataType) for f in empty.schema.fields] == [
        (f.name, f.dataType) for f in nonempty.schema.fields
    ]


def test_bm25_empty_corpus_long_id_unchanged(spark):
    empty = bm25_score_per_doc(_per_doc(spark, [], "long"), "doc", ("a",))
    assert empty.count() == 0
    assert dict(empty.dtypes) == {
        "doc": "bigint",
        "dl": "bigint",
        "score6": "bigint",
        "rank": "int",
    }
