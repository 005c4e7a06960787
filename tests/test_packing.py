"""Invariants for the corpus-assembly operators (operators/packing.py):
chunks tile the token stream with the declared overlap; packing offsets
are contiguous per shard and seq_first/seq_last agree with seq_len."""

from __future__ import annotations

import pytest

from sparkstreaming_gmall_scala_spark.operators.packing import (
    chunk_tokens,
    pack_sequences,
)

DOCS = [
    (0, "a b c d e f g h i j"),  # 10 tokens
    (1, ""),  # empty doc
    (2, "one"),  # single token
    (3, " ".join(f"t{i}" for i in range(23))),  # 23 tokens
    (4, "x y z"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_chunks_tile_the_token_stream(spark, docs):
    """Every token lands in ≥1 chunk; consecutive chunks overlap by
    exactly ``overlap`` tokens (except a short final chunk); chunk ids
    are dense from 0."""
    chunk_size, overlap = 4, 1
    stride = chunk_size - overlap
    out = chunk_tokens(
        docs, "doc_id", "text", chunk_size=chunk_size, overlap=overlap
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = dict(DOCS)
    for doc_id, rows in by_doc.items():
        toks = texts[doc_id].split()
        rows.sort(key=lambda r: r["chunk_id"])
        # dense ids from 0, starts at multiples of stride
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        for r in rows:
            assert r["tok_start"] == r["chunk_id"] * stride
            want = toks[r["tok_start"] : r["tok_start"] + chunk_size]
            assert r["chunk_text"].split() == want
            assert r["n_chunk_tokens"] == len(want)
        # coverage: last chunk reaches the final token
        if toks:
            last = rows[-1]
            assert last["tok_start"] + last["n_chunk_tokens"] == len(toks)
    # empty doc still appears, with one empty chunk
    assert by_doc[1][0]["n_chunk_tokens"] == 0
    assert by_doc[1][0]["chunk_text"] == ""


def test_chunk_rejects_overlap_ge_chunk_size(spark, docs):
    with pytest.raises(ValueError):
        chunk_tokens(docs, "doc_id", "text", chunk_size=4, overlap=4)


def test_pack_offsets_contiguous_per_shard(spark, docs):
    seq_len, n_shards = 5, 2
    out = pack_sequences(
        docs, "doc_id", "text", seq_len=seq_len, n_shards=n_shards
    ).collect()
    texts = dict(DOCS)
    by_shard: dict[int, list] = {}
    for r in out:
        assert r["shard"] == r["doc_id"] % n_shards
        assert r["n_tokens"] == len(texts[r["doc_id"]].split())
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        expect_offset = 0
        for r in rows:
            # contiguous: each doc starts where the previous one ended
            assert r["tok_offset"] == expect_offset
            expect_offset += r["n_tokens"]
            if r["n_tokens"] == 0:
                assert r["seq_first"] is None and r["seq_last"] is None
            else:
                assert r["seq_first"] == r["tok_offset"] // seq_len
                assert (
                    r["seq_last"]
                    == (r["tok_offset"] + r["n_tokens"] - 1) // seq_len
                )
                assert r["seq_first"] <= r["seq_last"]


def test_pack_derives_n_shards_from_token_count(spark, docs):
    """With n_shards unset, sharding is derived as
    ceil(total_tokens / (seq_len · seqs_per_shard)) — the scale-safe
    default (round-5 verdict #6) — and the manifest matches an explicit
    call with that value."""
    total = sum(len(t.split()) for _, t in DOCS)  # 37 tokens
    seq_len, per_shard = 5, 4  # → ceil(37 / 20) = 2 shards
    expect_shards = -(-total // (seq_len * per_shard))
    assert expect_shards == 2
    derived = pack_sequences(
        docs, "doc_id", "text", seq_len=seq_len, seqs_per_shard=per_shard
    ).collect()
    explicit = pack_sequences(
        docs, "doc_id", "text", seq_len=seq_len, n_shards=expect_shards
    ).collect()
    assert sorted(map(tuple, derived)) == sorted(map(tuple, explicit))
    assert {r["shard"] for r in derived} <= set(range(expect_shards))
    # an all-empty corpus degrades to one shard, not a crash
    empty = spark.createDataFrame(
        [(0, ""), (1, "")], "doc_id long, text string"
    )
    rows = pack_sequences(empty, "doc_id", "text", seq_len=seq_len).collect()
    assert {r["shard"] for r in rows} == {0}


def test_chunker_plan_is_shuffle_free(spark, docs):
    plan = (
        chunk_tokens(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan[:2000]


def test_operator_surface_exports_resolve():
    """The curated operators.__all__ is the advertised package surface:
    every name must resolve, and the corpus-assembly + round-3 text ops
    must be on it."""
    import sparkstreaming_gmall_scala_spark.operators as O

    missing = [n for n in O.__all__ if not hasattr(O, n)]
    assert not missing, missing
    for required in (
        "chunk_tokens",
        "pack_sequences",
        "repetition_stats",
        "boilerplate_stats",
        "ngram_overlap_flags",
        "domain_mix",
        "mixture_thresholds",
    ):
        assert required in O.__all__, required


def test_chunk_and_pack_invariants_hold_on_random_corpora(spark):
    """Property test: for random corpora (varied token counts, empty docs,
    whitespace runs), chunking tiles every doc and packing is contiguous
    per shard with globally consistent sequence indices."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcxyz", min_size=1, max_size=5)
    doc = st.lists(word, min_size=0, max_size=40).map(" ".join)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(texts=st.lists(doc, min_size=1, max_size=12))
    def run(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        chunk_size, overlap, stride = 5, 2, 3
        chunks = chunk_tokens(
            docs, "doc_id", "text", chunk_size=chunk_size, overlap=overlap
        ).collect()
        by_doc = {}
        for r in chunks:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for i, t in rows:
            toks = t.split()
            rs = sorted(by_doc[i], key=lambda r: r["chunk_id"])
            covered = set()
            for r in rs:
                assert r["chunk_text"].split() == toks[
                    r["tok_start"] : r["tok_start"] + chunk_size
                ]
                covered.update(
                    range(r["tok_start"], r["tok_start"] + r["n_chunk_tokens"])
                )
            assert covered == set(range(len(toks)))

        seq_len, n_shards = 4, 3
        packed = pack_sequences(
            docs, "doc_id", "text", seq_len=seq_len, n_shards=n_shards
        ).collect()
        by_shard = {}
        for r in packed:
            by_shard.setdefault(r["shard"], []).append(r)
        for rs in by_shard.values():
            rs.sort(key=lambda r: r["doc_id"])
            off = 0
            for r in rs:
                assert r["tok_offset"] == off
                off += r["n_tokens"]
                if r["n_tokens"]:
                    assert r["seq_first"] == r["tok_offset"] // seq_len
                    assert (
                        r["seq_last"]
                        == (r["tok_offset"] + r["n_tokens"] - 1) // seq_len
                    )

    run()


def test_corpus_to_shards_composes_curate_then_pack(spark, sf_dir):
    """The end-to-end entry must be exactly pack_sequences over the
    curated keep set: same doc set as corpus_curate_fast, per-shard
    offsets contiguous (each doc starts where the previous one ended)."""
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    reg = load_all()
    shards = reg["corpus_to_shards"].builder(spark, sf_dir).collect()
    keeps = {
        r["doc_id"]
        for r in reg["corpus_curate_fast"].builder(spark, sf_dir).collect()
    }
    assert {r["doc_id"] for r in shards} == keeps
    by_shard: dict[int, list] = {}
    for r in shards:
        by_shard.setdefault(r["shard"], []).append(r)
    for sh, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rs:
            assert r["tok_offset"] == off, (sh, r)
            off += r["n_tokens"]


def test_corpus_to_shards_post_feature_plan_scans_once(spark, sf_dir):
    """After the feature table materializes (its own single-scan property
    is guarded in test_curation), the EXECUTED read path of the pipeline
    plan must touch the documents file exactly once more — the
    keep-filtered, pruned (doc_id, text) read feeding token counting.
    The walker stops at InMemoryTableScan: a formatted explain unrolls
    the cache-build subtree (already materialized, never re-executed),
    which would miscount."""
    from sparkstreaming_gmall_scala_spark.plans.catalog import load_all

    df = load_all()["corpus_to_shards"].builder(spark, sf_dir)

    def walk(node):
        name = node.nodeName()
        yield name
        if name.startswith("InMemoryTableScan"):
            return  # cache boundary: build plan below is not re-executed
        if name == "AdaptiveSparkPlan":
            yield from walk(node.executedPlan())
            return
        if name.endswith("QueryStage"):
            yield from walk(node.plan())
            return
        if name.startswith("ReusedExchange"):
            yield from walk(node.child())
            return
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    names = list(walk(df._jdf.queryExecution().sparkPlan()))
    file_scans = [n for n in names if n.startswith("Scan parquet")]
    cache_scans = [n for n in names if n.startswith("InMemoryTableScan")]
    assert len(file_scans) == 1, names
    assert cache_scans, names


def test_training_shards_land_in_manifest_order(spark, sf_dir, tmp_path):
    """write_training_shards must land one directory per shard whose
    read-back row order equals the manifest's shard_pos order — the
    loader contract (round-robin shard files, zero loader-side sorting).
    A second write overwrites byte-identically (idempotent retry)."""
    from sparkstreaming_gmall_scala_spark.operators.packing import (
        shuffle_shards,
    )
    from sparkstreaming_gmall_scala_spark.sinks import (
        read_training_shard,
        write_training_shards,
    )
    from sparkstreaming_gmall_scala_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    manifest = shuffle_shards(d, "doc_id", n_shards=4)
    out = str(tmp_path / "shards")
    write_training_shards(d, manifest, "doc_id", out)

    want = {}
    for r in manifest.collect():
        want.setdefault(r["shard"], []).append((r["shard_pos"], r["doc_id"]))
    for shard, pairs in want.items():
        pairs.sort()
        got = [
            r["doc_id"] for r in read_training_shard(spark, out, shard).collect()
        ]
        assert got == [doc for _, doc in pairs], shard

    # retry idempotence: same bytes after a second write
    import hashlib
    import os as _os

    def tree_hash(root):
        h = hashlib.md5()
        for dirpath, _dirs, files in sorted(_os.walk(root)):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    h.update(open(_os.path.join(dirpath, f), "rb").read())
        return h.hexdigest()

    h1 = tree_hash(out)
    write_training_shards(d, manifest, "doc_id", out)
    assert tree_hash(out) == h1


def test_training_shards_tie_break_on_zero_token_docs(spark, tmp_path):
    """Round-7 advice regression: when the manifest position is
    tok_offset, a zero-token doc shares its offset with the following doc
    (the running sum adds 0), so (shard, _pos) alone is not a total order
    and tied rows could land in either order after the repartition
    shuffle. The writer must tie-break on the id column: read-back order
    is deterministic (ties sorted by id) and a retry is byte-identical
    even with many same-offset rows."""
    import hashlib
    import os as _os

    from sparkstreaming_gmall_scala_spark.sinks import (
        read_training_shard,
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, "" if i % 2 else f"text {i}") for i in range(20)],
        "doc_id long, text string",
    )
    # hand-built tok_offset manifest with deliberate collisions: five
    # docs per shard, every adjacent pair sharing an offset
    manifest = spark.createDataFrame(
        [(i, i // 5, (i // 2) * 7) for i in range(20)],
        "doc_id long, shard int, tok_offset long",
    )
    out = str(tmp_path / "tied_shards")
    write_training_shards(docs, manifest, "doc_id", out)

    for shard in range(4):
        got = [
            r["doc_id"]
            for r in read_training_shard(spark, out, shard).collect()
        ]
        want = sorted(
            (r["tok_offset"], r["doc_id"])
            for r in manifest.filter(f"shard = {shard}").collect()
        )
        assert got == [d for _, d in want], shard

    def tree_hash(root):
        h = hashlib.md5()
        for dirpath, _dirs, files in sorted(_os.walk(root)):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    h.update(open(_os.path.join(dirpath, f), "rb").read())
        return h.hexdigest()

    h1 = tree_hash(out)
    write_training_shards(docs, manifest, "doc_id", out)
    assert tree_hash(out) == h1
