"""BPE merge learning (operators/bpe.py): the distributed loop must
reproduce a pure local BPE trainer exactly (same tie rule), the merge
rewrite must be the greedy non-overlapping scan, and apply_merges must
re-encode to the trainer's final state."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.bpe import (
    apply_merges,
    bpe_learn,
    merge_candidates,
)
from sparkstreaming_gmall_scala_spark.sources import load_table

DOC_SCHEMA = "doc_id long, text string"


def _py_tokens(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def _py_merge(ts: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for t in ts:
        if out and out[-1] == a and t == b:
            out[-1] = a + b
        else:
            out.append(t)
    return out


def _py_bpe(texts: list[str], n: int):
    toks = [_py_tokens(t) for t in texts]
    merges = []
    for _ in range(n):
        c: Counter = Counter()
        for ts in toks:
            for a, b in zip(ts, ts[1:]):
                c[(a, b)] += 1
        if not c:
            break
        (a, b), cnt = min(
            c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, cnt))
        toks = [_py_merge(ts, a, b) for ts in toks]
    return merges, toks


def test_bpe_learn_matches_local_reference(spark):
    rows = [
        (1, "the cat sat on the mat the cat sat"),
        (2, "the cat ran and the dog sat on the cat"),
        (3, "a cat a cat a cat sat sat sat"),
        (4, "dog dog dog dog"),  # self-pair greedy case
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    want_merges, want_toks = _py_bpe([t for _, t in rows], 5)
    got = bpe_learn(docs, "doc_id", "text", 5)
    assert got == want_merges

    encoded = {
        r["doc_id"]: list(r["toks"])
        for r in apply_merges(docs, "doc_id", "text", got).collect()
    }
    assert encoded == {i + 1: ts for i, ts in enumerate(want_toks)}


def test_bpe_greedy_self_pair_non_overlapping(spark):
    """'a a a a' merging (a, a) must yield ['aa', 'aa'] — left-to-right
    non-overlapping, and the merged token never re-merges in-pass."""
    docs = spark.createDataFrame([(1, "a a a a"), (2, "a a a")], DOC_SCHEMA)
    merges = bpe_learn(docs, "doc_id", "text", 1)
    assert merges == [("a", "a", 5)]
    enc = {
        r["doc_id"]: list(r["toks"])
        for r in apply_merges(docs, "doc_id", "text", merges).collect()
    }
    assert enc == {1: ["aa", "aa"], 2: ["aa", "a"]}


def test_bpe_oracle_islands_equals_fold_on_runs(spark):
    """The bpe_train_merges oracle's gaps-and-islands occurrence
    selection must equal the engine's greedy fold on the adversarial
    case it exists for: long runs of one token, where occurrences
    OVERLAP and the even-offset-within-run rule is doing real work —
    run the actual DuckDB oracle against bpe_learn on the fixture."""
    import duckdb
    import pandas as pd

    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    rows = [
        (1, "a a a a a a a"),   # 7-run: merges (a,a)x3 then (aa,aa)...
        (2, "b a a a b a a"),
        (3, "a a b b b b a"),
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    want = bpe_learn(docs, "doc_id", "text", 3)

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    oracle = load_all()["bpe_train_merges"].oracle
    got = [
        (r[1], r[2], r[3])
        for r in sorted(con.execute(oracle).fetchall())
    ]
    assert got == want


def test_bpe_learn_on_corpus_matches_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 40
    ).select("doc_id", "text")
    local = [
        (r["doc_id"], r["text"])
        for r in docs.orderBy("doc_id").collect()
    ]
    want, _ = _py_bpe([t for _, t in local], 3)
    assert bpe_learn(docs, "doc_id", "text", 3) == want


def test_merge_candidates_rank_contract(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    rows = merge_candidates(d, "doc_id", "text", top_n=20).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    keys = [(-r["cnt"], r["left_tok"], r["right_tok"]) for r in rows]
    assert keys == sorted(keys)
