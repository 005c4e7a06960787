"""Dedup operator semantics: exact, MinHash-LSH, Jaccard, SimHash."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_rows,
    simhash64,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "The  quick brown fox jumps over the lazy dog"),  # ws/case variant → exact dup
    (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
    (4, "completely different content about spark engines and data"),
    (5, "completely different content about spark engines and data"),  # exact dup of 4
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_groups_normalized_duplicates(spark):
    out = exact_dedup(_docs(spark), "doc_id", "text").collect()
    groups = {r["kept_doc_id"]: r["n_dups"] for r in out}
    # 1+2 collapse (whitespace+case normalize), 4+5 collapse, 3 alone
    assert groups == {1: 2, 3: 1, 4: 2}


def test_minhash_identical_docs_identical_signatures(spark):
    sh = shingle_rows(_docs(spark), "doc_id", "text", n=3)
    sigs = {r["doc_id"]: [r[f"mh{j}"] for j in range(8)] for r in
            minhash_signatures(sh, "doc_id", num_hashes=8).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[4] == sigs[5]
    assert sigs[1] != sigs[4]


def test_lsh_finds_exact_and_near_dups(spark):
    sh = shingle_rows(_docs(spark), "doc_id", "text", n=3)
    sigs = minhash_signatures(sh, "doc_id", num_hashes=8)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs, "doc_id", 8, 2).collect()
    }
    assert (1, 2) in pairs  # identical signature → all bands collide
    assert (4, 5) in pairs
    # doc 3 shares 7 of 9 shingles with 1 — high jaccard, likely banded:
    # don't assert (probabilistic); but unrelated docs must NOT pair.
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_jaccard_pairs_scores(spark):
    sh = shingle_rows(_docs(spark), "doc_id", "text", n=3)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(sh, "doc_id", max_df=20, threshold=0.5).collect()
    }
    assert got[(1, 2)] == 1.0
    assert got[(4, 5)] == 1.0
    # near-dup 1↔3: 6 shared of 9 distinct 3-gram shingles (7 each side)
    assert 0.5 <= got[(1, 3)] < 1.0
    assert (1, 4) not in got


def test_simhash_dup_docs_equal_limbs_diff_docs_differ(spark):
    sh = shingle_rows(_docs(spark), "doc_id", "text", n=3)
    limbs = {
        r["doc_id"]: tuple(r[f"simhash_limb{i}"] for i in range(4))
        for r in simhash64(sh, "doc_id").collect()
    }
    assert limbs[1] == limbs[2]
    assert limbs[4] == limbs[5]
    assert limbs[1] != limbs[4]
    # limbs are 16-bit
    for v in limbs.values():
        assert all(0 <= x < 65536 for x in v)


def _hamming(a, b):
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def test_simhash_near_dups_closer_than_unrelated(spark):
    sh = shingle_rows(_docs(spark), "doc_id", "text", n=3)
    limbs = {
        r["doc_id"]: tuple(r[f"simhash_limb{i}"] for i in range(4))
        for r in simhash64(sh, "doc_id").collect()
    }
    assert _hamming(limbs[1], limbs[3]) < _hamming(limbs[1], limbs[4])


def test_minhash_xxhash64_fast_path_same_lsh_semantics(spark):
    """The xxhash64 production family must behave like the md5 family for
    LSH purposes: identical docs → identical signatures → banded pairs
    still surface the duplicate, near-identical docs still collide."""
    from sparkstreaming_gmall_scala_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_rows,
    )

    sh = shingle_rows(_docs(spark), "doc_id", "text", n=3)
    sigs = minhash_signatures(sh, "doc_id", num_hashes=8, hash_fn="xxhash64")
    rows = {r["doc_id"]: [r[f"mh{j}"] for j in range(8)] for r in sigs.collect()}
    assert rows[1] == rows[2]  # exact dups (ws/case) → same signature
    assert all(isinstance(v, int) for v in rows[1])  # longs, not hex strings
    pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs, "doc_id", num_hashes=8, band_size=2).collect()
    }
    assert (1, 2) in pairs and (4, 5) in pairs


def test_minhash_rejects_unknown_hash_fn(spark):
    import pytest

    from sparkstreaming_gmall_scala_spark.operators.dedup import (
        minhash_signatures,
        shingle_rows,
    )

    sh = shingle_rows(_docs(spark), "doc_id", "text", n=3)
    with pytest.raises(ValueError, match="hash_fn"):
        minhash_signatures(sh, "doc_id", hash_fn="sha1")


def test_containment_catches_subdocument_jaccard_misses(spark):
    """A short doc embedded verbatim in a much longer one: containment
    ≈ 1.0 (every short-doc shingle is shared) while Jaccard stays low
    (the union is dominated by the long doc) — the asymmetric case the
    containment filter exists for."""
    from sparkstreaming_gmall_scala_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
        shingle_rows,
    )

    short = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, f"{filler} {short} {filler}")],
        "doc_id long, text string",
    )
    sh = shingle_rows(docs, "doc_id", "text", n=3)
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(sh, "doc_id", max_df=50, threshold=0.8).collect()
    }
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(sh, "doc_id", max_df=50, threshold=0.5).collect()
    }
    assert cont[(1, 2)] >= 0.8  # short doc fully contained
    assert (1, 2) not in jac  # union-dominated Jaccard misses it


def test_substring_dedup_invariants_hold_on_random_corpora(spark):
    """Property test over random corpora (repeated phrases, empty docs,
    shared fragments): (1) dup_spans marks exactly the token positions
    covered by >=window-token substrings occurring >=2 times — verified
    against a brute-force Python reference; (2) cut_spans' cleaned text
    equals a brute-force replay of the keep-first cut; (3) the sound
    post-cut invariant: per window-gram, at most ONE surviving occurrence
    is contiguous in the original text — single-pass span removal splices
    neighbors together and CAN create new (splice-crossing) duplicates
    (hypothesis originally falsified the naive "re-detection is empty"
    claim; see cut_spans' docstring), but it can never leave two
    original-contiguous copies."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from sparkstreaming_gmall_scala_spark.operators.dedup import (
        cut_spans,
        dup_spans,
    )

    WINDOW = 4
    word = st.sampled_from(["aa", "bb", "cc", "dd"])
    doc = st.lists(word, min_size=0, max_size=18).map(" ".join)

    def brute(texts):
        """Replays the operator contract in plain Python: returns
        (marked positions per doc, cleaned tokens per doc, surviving
        original positions per doc)."""
        from collections import Counter

        toks = {i: t.split() for i, t in enumerate(texts)}
        grams = Counter()
        for ts in toks.values():
            for s0 in range(len(ts) - WINDOW + 1):
                grams[tuple(ts[s0 : s0 + WINDOW])] += 1
        marked = {}
        for i, ts in toks.items():
            cov = set()
            for s0 in range(len(ts) - WINDOW + 1):
                if grams[tuple(ts[s0 : s0 + WINDOW])] >= 2:
                    cov.update(range(s0, s0 + WINDOW))
            marked[i] = cov
        # keep-first cut: min (doc, start) occurrence of each dup gram
        # survives; every other occurrence's window is deleted
        keep_pk = {}
        for i in sorted(toks):
            ts = toks[i]
            for s0 in range(len(ts) - WINDOW + 1):
                g = tuple(ts[s0 : s0 + WINDOW])
                if grams[g] >= 2 and g not in keep_pk:
                    keep_pk[g] = (i, s0)
        cut = {}
        for i, ts in toks.items():
            dead = set()
            for s0 in range(len(ts) - WINDOW + 1):
                g = tuple(ts[s0 : s0 + WINDOW])
                if grams[g] >= 2 and keep_pk[g] != (i, s0):
                    dead.update(range(s0, s0 + WINDOW))
            cut[i] = dead
        cleaned = {
            i: [t for p0, t in enumerate(ts) if p0 not in cut[i]]
            for i, ts in toks.items()
        }
        surv_pos = {
            i: [p0 for p0 in range(len(ts)) if p0 not in cut[i]]
            for i, ts in toks.items()
        }
        return marked, cleaned, surv_pos

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(texts=st.lists(doc, min_size=2, max_size=8))
    def run(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        marked, cleaned, surv_pos = brute(texts)

        spans = dup_spans(
            docs, "doc_id", "text", window=WINDOW, min_count=2
        ).collect()
        got = {}
        for r in spans:
            got.setdefault(r["doc_id"], set()).update(
                range(r["tok_start"] - 1, r["tok_end"])  # spans are 1-based
            )
        for i in marked:
            assert got.get(i, set()) == marked[i], (i, texts)

        out = {
            r["doc_id"]: r["cleaned_text"]
            for r in cut_spans(
                docs, "doc_id", "text", window=WINDOW, min_count=2
            ).collect()
        }
        for i, toks_clean in cleaned.items():
            assert out[i] == " ".join(toks_clean), (i, texts)

        # sound invariant: per gram, <=1 original-contiguous survivor
        from collections import Counter

        contiguous = Counter()
        for i, toks_clean in cleaned.items():
            pos = surv_pos[i]
            for s0 in range(len(toks_clean) - WINDOW + 1):
                if pos[s0 + WINDOW - 1] - pos[s0] == WINDOW - 1:
                    contiguous[tuple(toks_clean[s0 : s0 + WINDOW])] += 1
        for g, n in contiguous.items():
            assert n <= 1, (g, texts)

    run()


def test_cut_splice_can_create_new_duplicates_known_case(spark):
    """The exact hypothesis counterexample, pinned: cutting doc 7's copy
    of 'cc dd bb aa' splices 'bb cc dd' against the trailing 'bb',
    creating a NEW 4-gram that matches doc 2 — re-detection is non-empty
    by design (single-pass cut), while the sound invariant (at most one
    original-contiguous survivor per gram) holds. Guards the documented
    semantics against an accidental 'fix' that silently iterates."""
    from sparkstreaming_gmall_scala_spark.operators.dedup import (
        cut_spans,
        dup_spans,
    )

    texts = [
        "aa bb cc dd bb aa aa aa aa",
        "aa cc cc dd bb cc dd cc dd bb aa bb",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["cleaned_text"]
        for r in cut_spans(
            docs, "doc_id", "text", window=4, min_count=2
        ).collect()
    }
    assert out[0] == texts[0]  # kept occurrence: first in (doc, start)
    assert out[1] == "aa cc cc dd bb cc dd bb"
    docs2 = spark.createDataFrame(
        list(out.items()), "doc_id long, text string"
    )
    again = dup_spans(docs2, "doc_id", "text", window=4, min_count=2)
    assert again.count() > 0  # the splice-created collision


def test_winnowing_guarantee_and_density(spark):
    """The winnowing contract (SIGMOD 2003): two docs sharing a run of
    ≥ k + w − 1 tokens MUST share a fingerprint; unrelated docs with no
    k-gram in common share none; density lands near 2/(w+1)."""
    from sparkstreaming_gmall_scala_spark.operators.dedup import (
        winnow_fingerprints,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo"  # 11 tokens = k+w-1
    rows = [
        (1, "unique one two three four five six seven " + shared),
        (2, shared + " tail words that differ from the first entirely"),
        (3, "completely disjoint vocabulary nothing matches here at all "
            "more filler so windows exist okay fine done truly"),
    ]
    fps = winnow_fingerprints(
        spark.createDataFrame(rows, "doc_id long, text string"),
        "doc_id", "text", k=8, w=4,
    ).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])

    # density on a longer doc: ~2/(w+1) of k-grams, generous margins
    long = (1, " ".join(f"tok{i % 37}x{i % 11}" for i in range(400)))
    sel = winnow_fingerprints(
        spark.createDataFrame([long], "doc_id long, text string"),
        "doc_id", "text", k=8, w=4,
    ).count()
    n_grams = 400 - 8 + 1
    assert 0.2 * n_grams <= sel <= 0.6 * n_grams, sel / n_grams
