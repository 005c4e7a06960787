"""Unit tests for round-2 operators: hash-stratified sampling, connected
components, TF-IDF ranking, multimodal resize/frame-sample edge cases."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sparkstreaming_gmall_scala_spark.operators.dedup import connected_components
from sparkstreaming_gmall_scala_spark.operators.sampling import (
    hash_stratified_sample,
)


def test_stratified_sample_deterministic_and_rule_exact(spark):
    rows = [(i, "click" if i % 2 else "view") for i in range(2000)]
    df = spark.createDataFrame(rows, "event_id long, event_type string")
    got = {
        r["event_id"]
        for r in hash_stratified_sample(
            df, "event_id", "event_type",
            thresholds={"click": "3fff"}, default_threshold="0fff",
        ).collect()
    }
    # the keep rule is bit-for-bit reproducible in pure python
    expect = {
        i
        for i, t in rows
        if hashlib.md5(str(i).encode()).hexdigest()[:4]
        <= ("3fff" if t == "click" else "0fff")
    }
    assert got == expect
    # and the realized rates sit near the configured ones
    n_click = sum(1 for i in got if i % 2)
    n_view = len(got) - n_click
    assert abs(n_click / 1000 - 0.25) < 0.05
    assert abs(n_view / 1000 - 0.0625) < 0.03


def test_stratified_sample_rejects_bad_threshold(spark):
    df = spark.createDataFrame([(1, "a")], "event_id long, event_type string")
    with pytest.raises(ValueError, match="lowercase hex"):
        hash_stratified_sample(df, "event_id", "event_type", {"a": "FFFF"})


def test_connected_components_chain_and_singleton_edge(spark):
    # a 5-node path (diameter 4 → several propagation rounds), a triangle,
    # and an isolated pair
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    labels = {
        r["node"]: r["label"] for r in connected_components(edges).collect()
    }
    assert {n: labels[n] for n in (1, 2, 3, 4, 5)} == {n: 1 for n in (1, 2, 3, 4, 5)}
    assert {labels[10], labels[11], labels[12]} == {10}
    assert labels[20] == labels[21] == 20


def test_connected_components_label_is_component_min(spark):
    # edge order / direction must not matter
    edges = spark.createDataFrame(
        [(9, 3), (3, 7), (7, 5)], "id_a long, id_b long"
    )
    labels = {r["node"]: r["label"] for r in connected_components(edges).collect()}
    assert set(labels.values()) == {3}


def test_tfidf_ranks_rare_terms_over_common(spark):
    from sparkstreaming_gmall_scala_spark.operators.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common common common rare"),
            (2, "common other words here"),
            (3, "common some more words"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, "doc_id", "text", k=2)
    rows = {(r["doc_id"], r["rank"]): r for r in out.collect()}
    # 'rare' (df=1) outranks 'common' (df=3) for doc 1 despite tf 1 vs 3
    assert rows[(1, 1)]["term"] == "rare"
    assert rows[(1, 1)]["df"] == 1
    assert all(r["rank"] <= 2 for r in rows.values())
    assert len([k for k in rows if k[0] == 1]) == 2


def test_multimodal_resize_and_frames_handle_empty_payload(spark):
    from sparkstreaming_gmall_scala_spark.operators.multimodal import (
        frame_sample,
        resize_payload,
        to_binary_payload,
    )

    docs = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, "x" * 100)], "doc_id long, text string"
    )
    media = to_binary_payload(docs, "doc_id", "text")
    resized = {r["doc_id"]: r for r in resize_payload(media, "doc_id", 8).collect()}
    assert all(r["n_bytes"] == 8 for r in resized.values())
    assert bytes(resized[1]["payload"]) == b"abcabcab"  # cycle-pad
    assert bytes(resized[2]["payload"]) == bytes(8)  # empty → zero-fill
    assert bytes(resized[3]["payload"]) == b"x" * 8  # truncate
    assert resized[2]["checksum"] == 0

    frames = {r["doc_id"]: r for r in frame_sample(media, "doc_id", 2).collect()}
    assert frames[1]["n_frames"] == 2 and frames[1]["first_frame"] == ord("a")
    assert frames[1]["frame_sum"] == ord("a") + ord("c")
    assert frames[2]["n_frames"] == 0 and frames[2]["first_frame"] == -1
    assert frames[3]["n_frames"] == 50


def test_connected_components_raises_on_non_convergence(spark):
    """The strict propagation form must raise mid-collapse, not return
    partial (wrong) labels: a 5-node path needs >1 propagation round."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iters=1, method="propagation")


def test_connected_components_long_path_falls_back_to_star(spark):
    """auto: a path whose diameter exceeds the propagation budget must
    still converge (large-star/small-star contraction, O(log n) rounds)."""
    n = 40  # diameter 39 >> max_iters=3
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    labels = {
        r["node"]: r["label"]
        for r in connected_components(edges, max_iters=3).collect()
    }
    assert labels == {i: 0 for i in range(n + 1)}


def test_connected_components_plateau_bails_before_budget_exhaustion(spark):
    """auto: a long path collapses one hop per propagation round (near-
    constant label-sum delta), and the plateau heuristic must hand off to
    star contraction well before the 25-round default budget burns —
    correctness unchanged."""
    from sparkstreaming_gmall_scala_spark.operators.dedup import CC_STATS

    n = 60  # diameter 59 >> default max_iters=25
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    labels = {
        r["node"]: r["label"] for r in connected_components(edges).collect()
    }
    assert labels == {i: 0 for i in range(n + 1)}
    assert CC_STATS["fell_back"] is True
    # The plateau signature is observable by round ~5, but the heuristic
    # deliberately waits out half the budget first (round-5 advice: many
    # equal-length chains converging together fake the same signature on
    # a nearly-done graph), so the bail lands AT max_iters//2 — still
    # well before the 25-round budget exhaustion.
    assert CC_STATS["prop_rounds"] == 25 // 2, CC_STATS


def test_connected_components_short_graphs_do_not_fall_back(spark):
    """The plateau heuristic must not fire on ordinary dedup graphs
    (short chains converge before three plateaued deltas can appear)."""
    from sparkstreaming_gmall_scala_spark.operators.dedup import CC_STATS

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)],
        "id_a long, id_b long",
    )
    labels = {
        r["node"]: r["label"] for r in connected_components(edges).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    assert CC_STATS["fell_back"] is False


def test_connected_components_star_matches_propagation_on_random_graph(spark):
    """Both forms agree with a driver-side union-find on a seeded random
    graph (many components, varied shapes)."""
    import random

    rng = random.Random(7)
    pairs = sorted(
        {
            tuple(sorted(rng.sample(range(120), 2)))
            for _ in range(90)
        }
    )
    parent = list(range(120))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        parent[find(u)] = find(v)
    want = {}
    for u, v in pairs:
        for x in (u, v):
            want[x] = None
    for x in want:
        root = find(x)
        members = [y for y in want if find(y) == root]
        want[x] = min(members)

    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    for method in ("star", "propagation"):
        got = {
            r["node"]: r["label"]
            for r in connected_components(edges, method=method).collect()
        }
        assert got == want, method


def test_connected_components_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir switches lineage cuts to reliable checkpoints (the
    cluster-safe mode): same labels, checkpoint files actually written."""
    import os

    ckpt = str(tmp_path / "ckpt")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    labels = {
        r["node"]: r["label"]
        for r in connected_components(edges, checkpoint_dir=ckpt).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert any(files for _, _, files in os.walk(ckpt)), "no checkpoint files"


def test_mixture_thresholds_exact_math():
    from sparkstreaming_gmall_scala_spark.operators.sampling import (
        mixture_thresholds,
    )

    # total=1000, budget=500; a: want 250, cnt 100 -> keep 100 -> 'ffff';
    # b: want 125, cnt 500 -> keep 125 -> floor(65536*125/500)-1 = 16383;
    # c: weight 0 -> keep 0 -> floor(0)-1 = -1 (drop stratum entirely)
    thr = mixture_thresholds(
        {"a": 100, "b": 500, "c": 400},
        {"a": 0.5, "b": 0.25},
        budget_frac=0.5,
        default_weight=0.0,
    )
    assert thr == {"a": 65535, "b": 16383, "c": -1}
    # empty stratum can't divide by zero
    assert mixture_thresholds({"z": 0}, {}, 0.5)["z"] == -1


def test_domain_mix_hits_target_mixture_and_drops_zero_weight(spark):
    import hashlib

    from sparkstreaming_gmall_scala_spark.operators.sampling import domain_mix

    rows = [(i, f"s{i % 4}") for i in range(4000)]  # 1000 per source
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_mix(
        df, "doc_id", "source",
        weights={"s0": 0.5, "s1": 0.25},
        budget_frac=0.5, default_weight=0.0,
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    # zero-weight strata are dropped entirely, not sampled at 1/65536
    assert "s2" not in by_src and "s3" not in by_src
    # s0 wants 1000 of 1000 -> keep all; s1 wants 500 of 1000 -> ~half
    assert len(by_src["s0"]) == 1000
    assert abs(len(by_src["s1"]) - 500) < 60
    # keep set is the exact md5 rule (reproducible in pure python)
    thr_hex = format(
        min(65535, (65536 * 500) // 1000 - 1), "04x"
    )  # keep=500, cnt=1000 -> exact division, int math == float math
    expect = {
        i for i, s in rows
        if s == "s1"
        and hashlib.md5(str(i).encode()).hexdigest()[:4] <= thr_hex
    }
    assert by_src["s1"] == expect


def test_boilerplate_stats_counts_cross_doc_ngrams(spark):
    from sparkstreaming_gmall_scala_spark.operators.textstats import (
        boilerplate_stats,
    )

    # "a b c" appears in every doc (df=4 >= min_df=3) -> boilerplate;
    # each doc's tail shingles are unique to it
    docs = spark.createDataFrame(
        [(i, f"a b c tail{i} x{i} y{i}") for i in range(4)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_boiler"], r["boiler_frac"])
        for r in boilerplate_stats(
            docs, "doc_id", "text", n=3, min_df=3
        ).collect()
    }
    # 6 tokens -> 4 shingles; only the shared leading "a b c" is boiler
    for i in range(4):
        n_sh, n_b, frac = got[i]
        assert n_sh == 4 and n_b == 1
        assert frac == 0.25


def test_boilerplate_stats_pathological_hot_shingle(spark):
    """One shingle present in EVERY doc (the worst-case boilerplate skew:
    a df-sized window partition would funnel all n_docs rows into one
    task). The groupBy+join formulation must stay correct — and the df
    side must compress hot shingles map-side (partial agg below its
    exchange) so no task ever holds the full occurrence list."""
    from sparkstreaming_gmall_scala_spark.operators.textstats import (
        boilerplate_stats,
    )

    n_docs = 2000
    docs = spark.createDataFrame(
        [(i, f"hot hot hot u{i} v{i} w{i}") for i in range(n_docs)],
        "doc_id long, text string",
    ).repartition(16)
    out = boilerplate_stats(docs, "doc_id", "text", n=3, min_df=n_docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, plan[:3000]
    assert "Window" not in plan, plan[:3000]
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == n_docs
    # 6 tokens -> 4 shingles: "hot hot hot" (df = n_docs, boiler) plus
    # three doc-unique tails
    for i in (0, 1234, n_docs - 1):
        assert got[i]["n_shingles"] == 4
        assert got[i]["n_boiler"] == 1
        assert got[i]["boiler_frac"] == 0.25


def test_dup_spans_merging_and_granularity(spark):
    """Substring dedup: cross-doc duplicated passages surface as merged
    maximal spans with 1-based inclusive positions; within-doc repeats
    count toward min_count; unique docs and sub-window duplicates emit
    nothing."""
    from sparkstreaming_gmall_scala_spark.operators.dedup import dup_spans

    passage = " ".join(f"w{i}" for i in range(6))  # 6 shared tokens
    rows = [
        # docs 1/2 share the 6-token passage at different offsets
        (1, passage + " unique tail one two"),
        (2, "lead in tokens here " + passage),
        # doc 3 repeats a 6-token run of ITSELF twice (within-doc dup)
        (3, "r0 r1 r2 r3 r4 r5 mid r0 r1 r2 r3 r4 r5"),
        # doc 4 shares only 3 tokens with the passage — below window
        (4, "w0 w1 w2 entirely different everything else here"),
        (5, "wholly unique text with no duplicated windows at all ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dup_spans(docs, "doc_id", "text", window=4, min_count=2)
    got = {
        (r["doc_id"], r["tok_start"], r["tok_end"]) for r in out.collect()
    }
    # doc 1: passage at tokens 1..6 → windows 1..3 merge to span (1, 6)
    # doc 2: passage at tokens 5..10 → span (5, 10)
    # doc 3: "r0..r5" at 1..6 and 8..13 → two spans (gap 'mid' at 7)
    assert got == {
        (1, 1, 6),
        (2, 5, 10),
        (3, 1, 6),
        (3, 8, 13),
    }, got


def test_cut_spans_keep_first_and_reconstruction(spark):
    """cut_spans keeps exactly the lowest-(doc_id, start) occurrence of
    every duplicated run, cuts all others, and reconstructs the
    normalized survivor text with exact cut counts."""
    from sparkstreaming_gmall_scala_spark.operators.dedup import cut_spans

    passage = " ".join(f"w{i}" for i in range(6))
    rows = [
        (1, passage + " unique tail one two"),
        (2, "lead in tokens here " + passage),
        # within-doc repeat: first occurrence kept, second cut
        (3, "r0 r1 r2 r3 r4 r5 mid r0 r1 r2 r3 r4 r5"),
        (4, "wholly unique text with no duplicated windows at all"),
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["cleaned_text"], r["n_tokens_cut"])
        for r in cut_spans(docs, "doc_id", "text", window=4).collect()
    }
    # doc 1 holds the globally-first occurrence of the passage → intact
    assert got[1] == (passage + " unique tail one two", 0)
    # doc 2's copy (span 5..10) is cut; survivors re-join on spaces
    assert got[2] == ("lead in tokens here", 6)
    # doc 3: first r-run kept, second (tokens 8..13) cut, 'mid' survives
    assert got[3] == ("r0 r1 r2 r3 r4 r5 mid", 6)
    assert got[4] == ("wholly unique text with no duplicated windows at all", 0)
    assert got[5] == ("", 0)


def test_cut_spans_roundtrip_no_residual_dups(spark, sf_dir):
    """The Lee-et-al contract: after cutting, every original window hash
    occurs at most once, so dup_spans over the cleaned corpus is empty —
    on the real test corpus, not just crafted rows (splice artifacts
    would surface here)."""
    from pyspark.sql import functions as F

    from sparkstreaming_gmall_scala_spark.operators.dedup import (
        cut_spans,
        dup_spans,
    )
    from sparkstreaming_gmall_scala_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    cleaned = cut_spans(d, "doc_id", "text", window=20).select(
        "doc_id", F.col("cleaned_text").alias("text")
    )
    # sanity: the corpus genuinely had duplicated substrings to cut
    assert cleaned.filter(F.col("text") == "").count() >= 0
    assert dup_spans(cleaned, "doc_id", "text", window=20).count() == 0


def test_weighted_sample_k_matches_local_aes_reference(spark):
    """weighted_sample_k selects EXACTLY the rows a pure-local A-ES
    implementation selects (same md5-hash uniform, same ln(u)/w
    priority) — the full selection set, not just counts."""
    import math

    from sparkstreaming_gmall_scala_spark.operators.sampling import (
        weighted_sample_k,
    )

    rows = [(i, (i * 37) % 100 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k bigint, w bigint")

    def pri(key: int, w: int) -> float:
        v = int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)
        u = (v + 0.5) / 4294967296.0
        return math.log(u) / max(1, w)

    want = set(
        sorted(rows, key=lambda r: (-pri(r[0], r[1]), r[0]))[:40]
    )
    got = {
        (r["k"], r["w"])
        for r in weighted_sample_k(df, "k", "w", 40).collect()
    }
    assert got == {(k, w) for k, w in want}


def test_weighted_sample_k_per_stratum_counts_and_determinism(spark, sf_dir):
    from sparkstreaming_gmall_scala_spark.operators.sampling import (
        weighted_sample_k,
    )
    from sparkstreaming_gmall_scala_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    s1 = weighted_sample_k(docs, "doc_id", "n_chars", 50, strata_col="lang")
    per = {r["lang"]: r["n"] for r in
           s1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    avail = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {lang: min(50, n) for lang, n in avail.items()}
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    s2 = weighted_sample_k(docs, "doc_id", "n_chars", 50, strata_col="lang")
    assert sorted(r["doc_id"] for r in s2.collect()) == ids1


def test_weighted_sample_prefers_heavy_rows(spark):
    """A row with overwhelming weight has priority ln(u)/w ~ 0 — above
    every unit-weight row for any hash draw — so it must be selected;
    and zero/negative weights clamp to 1 instead of dividing by zero."""
    from sparkstreaming_gmall_scala_spark.operators.sampling import (
        weighted_sample_k,
    )

    rows = [(i, 1) for i in range(200)] + [(999, 10**12), (998, 0)]
    df = spark.createDataFrame(rows, "k bigint, w bigint")
    got = {r["k"] for r in weighted_sample_k(df, "k", "w", 5).collect()}
    assert 999 in got
    assert len(got) == 5


def test_weighted_sample_k_runs_as_window_group_limit(spark, sf_dir):
    """Plan guard: rank <= k pushes a partial per-partition top-k
    (WindowGroupLimit) below the stratum exchange — the 100 TB corpus
    never fully sorts."""
    from sparkstreaming_gmall_scala_spark.operators.sampling import (
        weighted_sample_k,
    )
    from sparkstreaming_gmall_scala_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    plan = (
        weighted_sample_k(docs, "doc_id", "n_chars", 50, strata_col="lang")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_hash_split_partitions_every_row_and_hits_fractions(spark, sf_dir):
    """hash_split: labels partition the table exactly (no null/missing),
    realized fractions are within a few points of the targets on the
    16-bit bucket space, re-assignment is stable, and growing the corpus
    never moves an existing row's split (the anti-randomSplit
    property)."""
    from sparkstreaming_gmall_scala_spark.operators.sampling import hash_split
    from sparkstreaming_gmall_scala_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    s = hash_split(docs, "doc_id", splits)
    n = docs.count()
    got = {r["split"]: r["n"] for r in
           s.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(got.values()) == n
    assert set(got) == {"train", "val", "test"}
    for label, frac in splits:
        assert abs(got[label] / n - frac) < 0.05, (label, got[label], n)
    # growth stability: assignment on a half-corpus equals the full
    # corpus's assignment restricted to those rows
    half = docs.filter(F.col("doc_id") % 2 == 0)
    a = {r["doc_id"]: r["split"]
         for r in hash_split(half, "doc_id", splits).collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(docs, "doc_id", splits).collect()
         if r["doc_id"] % 2 == 0}
    assert a == b


def test_split_thresholds_math_and_degenerate_cases():
    import pytest

    from sparkstreaming_gmall_scala_spark.operators.sampling import (
        split_thresholds,
    )

    t = split_thresholds([("train", 0.9), ("val", 0.05), ("test", 0.05)])
    assert t == [("train", 58982), ("val", 62259), ("test", 0x10000)]
    # fractions normalize: 9/0.5/0.5 is the same contract
    assert split_thresholds([("a", 9.0), ("b", 0.5), ("c", 0.5)]) == [
        ("a", 58982), ("b", 62259), ("c", 0x10000)
    ]
    # single split takes everything via the always-true bound
    assert split_thresholds([("all", 1.0)]) == [("all", 0x10000)]
    with pytest.raises(ValueError):
        split_thresholds([])
    with pytest.raises(ValueError):
        split_thresholds([("a", -0.1), ("b", 1.1)])
    with pytest.raises(ValueError):
        split_thresholds([("a", 0.0)])


def test_hash_split_zero_fraction_label_gets_no_rows(spark):
    from sparkstreaming_gmall_scala_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(i,) for i in range(2000)], "k bigint")
    got = {
        r["split"]
        for r in hash_split(
            df, "k", [("a", 0.5), ("empty", 0.0), ("b", 0.5)]
        ).collect()
    }
    assert "empty" not in got and got == {"a", "b"}


# ---------------------------------------------------------------------------
# bm25_rank (round 9)
# ---------------------------------------------------------------------------


def test_bm25_matches_pure_python(spark):
    import math

    from sparkstreaming_gmall_scala_spark.operators.textstats import bm25_rank

    corpus = [
        (1, "spark stream spark join"),
        (2, "dup spark table"),
        (3, "sort merge window agg key"),
        (4, "stream stream stream stream stream stream"),
        (5, "dup dup stream spark"),
    ]
    q = ("dup", "spark", "stream")
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["dl"], r["score6"], r["rank"])
        for r in bm25_rank(docs, "doc_id", "text", q, top_n=3).collect()
    }

    toks = {d: t.split() for d, t in corpus}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfs = {t: sum(1 for ts in toks.values() if t in ts) for t in q}

    def score(ts):
        s = 0.0
        for t in q:
            tf = float(ts.count(t))
            idf = math.log(1.0 + (float(n - dfs[t]) + 0.5) / (dfs[t] + 0.5))
            s += idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (len(ts) / avgdl))))
        return s

    exp = sorted(
        (
            (d, len(ts), math.floor(score(ts) * 1e6 + 0.5))
            for d, ts in toks.items()
            if score(ts) > 0
        ),
        key=lambda x: (-x[2], x[0]),
    )[:3]
    assert got == {d: (dl, s6, i + 1) for i, (d, dl, s6) in enumerate(exp)}
    # doc 5 (both rare-term hits) must beat the spammy doc 4
    assert got[5][2] == 1


def test_bm25_rejects_duplicate_terms_and_skips_zero_scores(spark):
    import pytest

    from sparkstreaming_gmall_scala_spark.operators.textstats import bm25_rank

    docs = spark.createDataFrame(
        [(1, "spark join"), (2, "sort merge")], ["doc_id", "text"]
    )
    with pytest.raises(ValueError, match="distinct"):
        bm25_rank(docs, "doc_id", "text", ("a", "a"))
    out = bm25_rank(docs, "doc_id", "text", ("spark",), top_n=5).collect()
    # doc 2 contains no query term: never emitted
    assert [r["doc_id"] for r in out] == [1]


def test_bm25_plan_is_top_k_not_global_sort(spark):
    from sparkstreaming_gmall_scala_spark.operators.textstats import bm25_rank

    docs = spark.createDataFrame(
        [(i, "spark stream " * (i % 3 + 1)) for i in range(50)],
        ["doc_id", "text"],
    )
    # materialize=False exposes the lazy plan (the public path runs the
    # same plan in one action, then unpersists the per-doc cache)
    df = bm25_rank(docs, "doc_id", "text", ("spark",), top_n=5,
                   materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bigram_stats_counts_and_integer_probs(spark):
    from sparkstreaming_gmall_scala_spark.operators.textstats import bigram_stats

    docs = spark.createDataFrame(
        [
            (1, "a b a b c"),   # bigrams: ab, ba, ab, bc
            (2, "b c"),         # bc
            (3, "solo"),        # 1 token -> no bigrams
        ],
        ["doc_id", "text"],
    )
    got = {
        (r["w1"], r["w2"]): (r["c12"], r["p6"], r["pcont6"])
        for r in bigram_stats(docs, "doc_id", "text", top_n=10).collect()
    }
    # types: ab(2), ba(1), bc(2) -> 3 bigram types
    # c1: a->2, b->3 (ba? no: w1 'b' covers ba? b starts 'bc'x2? recount:
    #   pairs: (a,b),(b,a),(a,b),(b,c),(b,c) -> c1[a]=2, c1[b]=3
    # cont (distinct left contexts): b<-{a}, a<-{b}, c<-{b}
    assert got[("a", "b")] == (2, 1_000_000, 333_333)        # P(b|a)=2/2
    assert got[("b", "a")] == (1, 333_333, 333_333)          # P(a|b)=1/3
    assert got[("b", "c")] == (2, 666_666, 333_333)          # P(c|b)=2/3
    assert len(got) == 3  # the solo doc contributes nothing


def test_key_size_profile_exact_order_statistics(spark):
    from sparkstreaming_gmall_scala_spark.operators.skew import key_size_profile

    # 10 keys with sizes 1..10 -> ranks are the sizes themselves:
    # p50 = rank ceil(5) = 5, p90 = rank 9, p99 = rank ceil(9.9) = 10
    rows = [(k, i) for k in range(1, 11) for i in range(k)]
    df = spark.createDataFrame(rows, ["k", "i"])
    [r] = key_size_profile(df, "k").collect()
    assert (r["n_keys"], r["n_rows"]) == (10, 55)
    assert (r["p50"], r["p90"], r["p99"], r["max_sz"]) == (5, 9, 10, 10)
    assert r["top1_share6"] == 10 * 1_000_000 // 55
    assert r["p99_over_p50_6"] == 2_000_000


def test_key_size_profile_histogram_matches_bruteforce_rank(spark):
    # r10 (r9 verdict #1): the histogram-based path must equal the naive
    # global rank walk on a skewed, tie-heavy size distribution — many
    # keys share sizes, so every percentile lands inside a tie run
    import math
    import random

    from sparkstreaming_gmall_scala_spark.operators.skew import key_size_profile

    rng = random.Random(42)
    rows = []
    for k in range(200):
        # zipf-ish: most keys tiny, a few huge — sizes collide heavily
        sz = min(int(1 / max(rng.random(), 1e-3) ** 1.2), 500)
        rows.extend((k, i) for i in range(max(sz, 1)))
    df = spark.createDataFrame(rows, ["k", "i"])
    [r] = key_size_profile(df, "k").collect()
    from collections import Counter

    sizes = sorted(Counter(k for k, _ in rows).values())
    n_keys, n_rows = len(sizes), len(rows)

    def at(q):
        return sizes[math.ceil(q * n_keys) - 1]

    assert (r["n_keys"], r["n_rows"]) == (n_keys, n_rows)
    assert (r["p50"], r["p90"], r["p99"]) == (at(0.5), at(0.9), at(0.99))
    assert r["max_sz"] == sizes[-1]
    assert r["top1_share6"] == sizes[-1] * 1_000_000 // n_rows
    assert r["p99_over_p50_6"] == at(0.99) * 1_000_000 // at(0.5)


def test_key_size_profile_empty_input(spark):
    from sparkstreaming_gmall_scala_spark.operators.skew import key_size_profile

    df = spark.createDataFrame([], "k long, i long")
    assert key_size_profile(df, "k").count() == 0


def test_postings_heads_sorted_and_capped(spark):
    from sparkstreaming_gmall_scala_spark.operators.textstats import postings

    docs = spark.createDataFrame(
        [(9, "apple"), (3, "apple apple"), (5, "apple banana")],
        ["doc_id", "text"],
    )
    got = {
        r["term"]: (r["df"], r["tf_total"], r["head_postings"])
        for r in postings(docs, "doc_id", "text", head_n=2).collect()
    }
    # head capped at 2 of the 3 apple docs, ascending by doc id
    assert got["apple"] == (3, 4, "3,5")
    assert got["banana"] == (1, 1, "5")
