"""Document deduplication operators for large-scale training-data pipelines.

No reference counterpart (the reference's dedup is per-key streaming
distinct, app/DauApp.scala:85-104); these are the batch/corpus-level ops a
100 TB text pipeline needs: exact dedup, MinHash+LSH candidate generation,
and n-gram Jaccard verification.

Scale notes:
- Exact dedup is a hash groupBy on a fingerprint — one shuffle on md5 keys,
  uniformly distributed, no skew.
- MinHash signatures are computed in ONE aggregation pass (k min-aggs over
  the exploded shingles), then banded; candidate pairs come from a
  self-join on (band_idx, band_hash) — only docs colliding in a band meet,
  which is the whole point of LSH at scale.
- "Stop shingles" (shingles appearing in more than ``max_df`` docs) are
  dropped before the pair join in the Jaccard path: on web-scale corpora
  boilerplate shingles would otherwise create quadratic blowup in a few
  hot buckets (classic LSH practice, and it's what AQE skew-join can't fix
  for you because the blowup is semantic, not storage skew).
- md5 is the hash everywhere: deterministic, engine-portable (the DuckDB
  oracle computes the identical signatures), and uniformly distributed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint


def exact_dedup(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: keeps the smallest
    id per group (deterministic representative), reports group size."""
    fp = docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    return fp.groupBy("fp").agg(
        F.min(id_col).alias("kept_" + id_col),
        F.count(F.lit(1)).alias("n_dups"),
    )


def shingle_rows(
    docs: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Explode each doc into its distinct word-n-gram shingles.

    Two projections, not one: the token array is materialized as a real
    column BEFORE the n-gram transform. Inlining the tokenizer inside the
    transform lambda re-evaluates the whitespace split once per shingle
    (interpreted HOFs do no common-subexpression elimination), which made
    shingling O(tokens²) per doc — measured 8× slower at sf0.1."""
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
        ).alias("_toks"),
    )
    idx = F.sequence(F.lit(0), F.greatest(F.size("_toks") - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, n))
    )
    return toks.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle")
    )


def minhash_signatures(
    sh: DataFrame, id_col: str, num_hashes: int = 8, hash_fn: str = "md5"
) -> DataFrame:
    """k MinHash values per doc in one aggregation pass.

    Hash families:
    - ``md5``: md5(j || '|' || shingle) hex, compared lexicographically —
      engine-portable (the DuckDB oracle computes identical signatures);
      the correctness-gate default.
    - ``xxhash64``: xxhash64(j || '|' || shingle) as a long — ~the same
      collision behavior at a fraction of the per-row cost (no hex
      string materialization, 8-byte compare); the production path for
      100 TB corpora where the oracle doesn't ride along.
    Same banding/LSH downstream either way (lsh_candidate_pairs only
    concatenates the mh columns).
    """
    if hash_fn == "md5":
        h = lambda j: F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))  # noqa: E731
    elif hash_fn == "xxhash64":
        h = lambda j: F.xxhash64(F.concat(F.lit(f"{j}|"), F.col("shingle")))  # noqa: E731
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    aggs = [F.min(h(j)).alias(f"mh{j}") for j in range(num_hashes)]
    return sh.groupBy(id_col).agg(*aggs)


def band_signatures(
    sigs: DataFrame, id_col: str, num_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """Explode a signature frame into (id, band_idx, band_hash) rows: the
    band hash concatenates ``band_size`` adjacent minhashes. This is the
    unit the LSH index persists — batch self-join (lsh_candidate_pairs)
    and the incremental streaming index (streaming/dedup.py) band docs
    identically, which is what makes their pair sets comparable."""
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "|", *[F.col(f"mh{b * band_size + i}") for i in range(band_size)]
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select(F.col(id_col), F.explode(bands).alias("band")).select(
        id_col, "band.band_idx", "band.band_hash"
    )


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, num_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """Band the signature and self-join on (band_idx, band_hash).

    Docs sharing ANY band become a candidate pair (id_a < id_b).
    """
    banded = band_signatures(sigs, id_col, num_hashes, band_size)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def _pair_candidates(sh: DataFrame, id_col: str, max_df: int):
    """Shared front half of the exact-similarity pair ops: stop-shingle
    removal, per-doc set sizes, and co-shingled pair intersection counts
    joined with both sizes. Returns (joined, release) where ``release()``
    unpersists the cached intermediates after the caller materializes."""
    # The exploded shingle frame feeds stops AND the kept frame below;
    # shingling is an interpreted higher-order-function expression (the
    # most expensive scan in this pipeline), so compute it once.
    sh = sh.persist()
    # Anti-join against the (small) stop-shingle list — broadcastable even
    # at corpus scale, unlike the full shingle-frequency table.
    stops = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("shingle")
    )
    # The kept-shingle frame feeds BOTH self-join sides; without a
    # persist each one re-executes the explode/agg/anti-join chain. At
    # cluster scale this would be a written-out intermediate (or
    # Dataset.persist(DISK_ONLY)) for the same reason. set_size attaches
    # as a count-over-doc window BEFORE the cache (r16, r15 verdict #4):
    # per-doc partitions are bounded by doc length (no skew), and both
    # self-join sides then already CARRY their sizes — the pair groupBy
    # keys on them (constant within a pair group) and the old
    # sizes-aggregate + two join-back exchanges disappear.
    kept = (
        sh.join(F.broadcast(stops), "shingle", "left_anti")
        .withColumn(
            "set_size", F.count(F.lit(1)).over(Window.partitionBy(id_col))
        )
        .persist()
    )
    a = kept.alias("a")
    b = kept.alias("b")
    joined = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )

    def release() -> None:
        sh.unpersist()
        kept.unpersist()

    return joined, release


def jaccard_pairs(
    sh: DataFrame,
    id_col: str,
    max_df: int = 20,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every doc pair sharing at least
    one (non-stop) shingle; emits pairs with similarity >= threshold.

    jaccard = |A∩B| / (|A| + |B| - |A∩B|), with sizes counted over the
    SAME stop-shingle-filtered sets so the measure is internally
    consistent.
    """
    joined, release = _pair_candidates(sh, id_col, max_df)
    jac = joined.withColumn(
        "jaccard",
        F.col("n_shared").cast("double")
        / (F.col("size_a") + F.col("size_b") - F.col("n_shared")).cast("double"),
    )
    out = jac.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", (F.floor(F.col("jaccard") * 1e6 + 0.5) / 1e6).alias("jaccard")
    )
    # Materialize the (small) pair result, then release the big cached
    # frames — long-lived sessions calling this repeatedly (bench, the
    # correctness driver) would otherwise accumulate shingle-scale blocks
    # until storage eviction. The persisted pair frame keeps its lineage,
    # so an executor loss just recomputes from source.
    out = out.persist()
    out.count()
    release()
    return out


def jaccard_pairs_prefix(
    sh: DataFrame,
    id_col: str,
    max_df: int = 20,
    threshold: float = 0.5,
) -> DataFrame:
    """``jaccard_pairs``' result through PREFIX FILTERING (AllPairs /
    PPJoin, Bayardo et al. WWW'07; Chaudhuri et al. SSJoin) — the exact
    set-similarity join's scale path: same contract, provably the same
    pair set (pinned row-for-row in tests/test_dedup_prefix.py), but the
    candidate space is bounded by RARE-token prefixes instead of every
    co-occurrence of every kept shingle.

    Under one GLOBAL token order (document frequency asc, shingle asc —
    rarest first), each doc emits only its first
    ``|X| − ceil(t·|X|) + 1`` shingles. Any pair with J ≥ t has
    ``|A∩B| ≥ ceil(t·max(|A|,|B|))``, so both prefixes must intersect —
    the prefix-prefix join loses nothing. Candidates then verify with
    the exact intersection count over the full kept sets. Why it scales:
    the join key distribution is re-shaped toward LOW-df shingles (a
    df-20 boilerplate shingle sits at the END of the global order and
    falls outside most prefixes), so candidate count tracks the number
    of truly-similar pairs instead of Σ df² over the shingle table. The
    measure is Jaccard over the SAME stop-filtered sets as
    ``jaccard_pairs`` — one oracle, two physical strategies (the
    corpus_curate / corpus_curate_fast discipline)."""
    # ceil(t·n) in EXACT integer arithmetic (r14 ADVICE): threshold as a
    # rational p/q (decimal thresholds with ≤6 places are represented
    # exactly), then ceil(t·n) = (n·p + q − 1) div q. Double-arithmetic
    # F.ceil(t*n) can overshoot by 1 when t·n is mathematically integral
    # but the double product rounds a hair above it — shortening the
    # prefix / tightening the size filter and silently dropping a
    # qualifying pair, which would break the lossless contract.
    from fractions import Fraction

    _frac = Fraction(str(threshold)).limit_denominator(1_000_000)
    _p, _q = _frac.numerator, _frac.denominator

    def _ceil_t(col: Column) -> Column:
        num = col.cast("long") * F.lit(_p) + F.lit(_q - 1)
        # num − num%q is exactly k·q in long arithmetic; k·q / q in
        # double is exact for k·q < 2^53, so no boundary rounding exists
        return ((num - num % F.lit(_q)) / F.lit(_q)).cast("long")

    sh = sh.persist()
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    stops = dfreq.filter(F.col("_df") > max_df).select("shingle")
    kept = sh.join(F.broadcast(stops), "shingle", "left_anti").persist()
    # global order (df asc, shingle asc) — total, identical for every
    # doc, so the prefix guarantee holds corpus-wide. set_size rides a
    # second window over the SAME per-doc partitioning (r16 — one
    # exchange serves both; was a separate sizes aggregate + join-back).
    wid = Window.partitionBy(id_col)
    ranked = (
        kept.join(dfreq, "shingle")
        .withColumn(
            "_rn",
            F.row_number().over(wid.orderBy("_df", "shingle")),
        )
        .withColumn("set_size", F.count(F.lit(1)).over(wid))
    )
    prefix = ranked.filter(
        F.col("_rn") <= F.col("set_size") - _ceil_t(F.col("set_size")) + 1
    ).select(id_col, "shingle", "set_size")
    a = prefix.alias("a")
    b = prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            # size filter rides the candidate join: J >= t forces
            # |B| >= t·|A| (and symmetrically), so wildly mismatched
            # set sizes never become candidates
            & (F.col("b.set_size") >= _ceil_t(F.col("a.set_size")))
            & (F.col("a.set_size") >= _ceil_t(F.col("b.set_size"))),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .distinct()
    )
    # exact verification: intersection count over the full kept sets —
    # expanding A's tokens then equi-joining B on (id_b, shingle) keeps
    # exactly the |A∩B| shared-token rows per candidate (two hash joins,
    # never an |A|×|B| expansion)
    ka = kept.select(F.col(id_col).alias("id_a"), "shingle")
    kb = kept.select(F.col(id_col).alias("id_b"), "shingle")
    shared = (
        cand.join(ka, "id_a")
        .join(kb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jac = shared.withColumn(
        "jaccard",
        F.col("n_shared").cast("double")
        / (
            F.col("size_a") + F.col("size_b") - F.col("n_shared")
        ).cast("double"),
    )
    out = jac.filter(F.col("jaccard") >= threshold).select(
        "id_a",
        "id_b",
        (F.floor(F.col("jaccard") * 1e6 + 0.5) / 1e6).alias("jaccard"),
    )
    out = out.persist()
    out.count()
    sh.unpersist()
    kept.unpersist()
    return out


def containment_pairs(
    sh: DataFrame,
    id_col: str,
    max_df: int = 20,
    threshold: float = 0.8,
) -> DataFrame:
    """Max-containment near-dup pairs: |A∩B| / min(|A|, |B|) ≥ threshold —
    the ASYMMETRIC complement to Jaccard that catches sub-document
    duplication (a short doc quoted or embedded inside a long one scores
    near 1.0 here but low on Jaccard, because the union in Jaccard's
    denominator is dominated by the long doc). Standard companion filter
    in LLM dedup pipelines; same stop-shingle-bounded candidate machinery
    as ``jaccard_pairs``, so the blowup guards are shared."""
    joined, release = _pair_candidates(sh, id_col, max_df)
    cont = joined.withColumn(
        "containment",
        F.col("n_shared").cast("double")
        / F.least("size_a", "size_b").cast("double"),
    )
    out = cont.filter(F.col("containment") >= threshold).select(
        "id_a",
        "id_b",
        (F.floor(F.col("containment") * 1e6 + 0.5) / 1e6).alias("containment"),
    )
    out = out.persist()
    out.count()
    release()
    return out


# Last connected_components run diagnostics (propagation round count,
# whether the star fallback fired) — read by tests and perf tuning only;
# not part of any result.
CC_STATS: dict[str, int | bool] = {}


def _star_contraction(
    sym: DataFrame, nodes: DataFrame, cut, max_rounds: int = 64
) -> DataFrame:
    """Large-star/small-star contraction (Kiveris et al., "Connected
    Components in MapReduce and Beyond") → (node, label=component min).

    Each round halves the height of every tree, so convergence is
    O(log n) rounds regardless of diameter — the scale-safe form for
    adversarial long-path graphs where min-label propagation's
    O(diameter) rounds would not terminate in any reasonable budget.
    """
    def chk(frame: DataFrame) -> tuple:
        """Fixed-point probe: one narrow aggregate instead of a pair of
        exceptAll shuffles — (count, Σu, Σv, Σxxhash64(u,v)) summed in
        DECIMAL(38,0) (no overflow, order-insensitive). Equal checksums on
        a monotone contraction ⇒ equal edge sets (hash-collision odds are
        ~2⁻⁶⁴ per round — the standard iterative-convergence trade)."""
        return tuple(
            frame.agg(
                F.count(F.lit(1)),
                F.sum(F.col("u").cast("decimal(38,0)")),
                F.sum(F.col("v").cast("decimal(38,0)")),
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            ).first()
        )

    e = cut(
        sym.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    prev = None
    for _ in range(max_rounds):
        # large-star: per node u, hook every strictly-larger neighbor to
        # m = min(N(u) ∪ {u})
        s = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            s.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", F.col("u")).alias("m"))
        )
        ls = (
            s.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star: orient large→small; hook every smaller neighbor
        # (and u itself) to m = min of u's smaller neighborhood
        d = ls.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        mins2 = d.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            d.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        ss = cut(ss)
        c = chk(ss)
        if c == prev:
            break
        prev, e = c, ss
    else:
        raise RuntimeError(
            f"star contraction did not reach a fixed point in {max_rounds} "
            "rounds — not expected for any graph (O(log n) bound)"
        )
    # fixed point = disjoint stars: every non-center node has one edge to
    # its component minimum; centers (and isolated nodes) label themselves
    parent = ss.select(F.col("u").alias("node"), F.col("v").alias("plabel"))
    return nodes.join(parent, "node", "left").select(
        "node", F.coalesce("plabel", F.col("node")).alias("label")
    )


def connected_components(
    edges: DataFrame,
    a: str = "id_a",
    b: str = "id_b",
    max_iters: int = 25,
    method: str = "auto",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components over an undirected pair list → (node, label)
    with label = the component's minimum node id (the canonical doc).

    Two forms behind one signature:
    - **Min-label propagation** (the fast path): each round every node
      takes the min of its own and its neighbors' labels; O(component
      diameter) rounds. Near-dup components are short chains
      (diameter << 25), so this is what actually runs on dedup graphs.
    - **Large-star/small-star contraction** (the scale-safe path):
      O(log n) rounds regardless of diameter.
    ``method="auto"`` (default) runs propagation and falls back to star
    contraction if the diameter exceeds ``max_iters`` — or EARLY, as soon
    as the label-sum deltas plateau: a long path collapses one hop per
    round, so three consecutive near-equal non-zero deltas are the
    diameter's signature, and burning the rest of the propagation budget
    before restarting would double the worst-case work. ``"propagation"``
    raises instead of falling back (strict form); ``"star"`` skips
    propagation entirely. ``CC_STATS`` records the last run's round
    count and fallback decision (diagnostics/tests only).

    Lineage is cut per round (iterative plans otherwise grow
    exponentially): ``localCheckpoint`` by default — executor-memory
    resident, fine for short local runs — or a RELIABLE checkpoint under
    ``checkpoint_dir`` for cluster runs where executor loss during a long
    iteration must not kill the job (Spark's documented localCheckpoint
    caveat). The convergence probe is a single post-agg scalar (sum of
    labels is strictly decreasing until fixed).
    """
    if method not in ("auto", "propagation", "star"):
        raise ValueError(f"unknown method {method!r}")
    # r15: LAZY checkpoints — the lineage is cut immediately (the plan
    # roots at a LogicalRDD either way), but the final result stage only
    # runs inside the round's convergence-probe action instead of as a
    # separate eager materialization job per cut (guide §1.2: one fewer
    # pass/job per round; identical data either way).
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        cut = lambda df: df.checkpoint(eager=False)  # noqa: E731
    else:
        cut = lambda df: df.localCheckpoint(eager=False)  # noqa: E731
    # Materialize the edge list ONCE — the symmetrization below reads it
    # twice, and every round reads sym; without checkpoints each of those
    # re-executes the (possibly expensive) upstream pair pipeline.
    edges = cut(edges)
    sym = cut(
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    CC_STATS.clear()
    if method == "star":
        CC_STATS["prop_rounds"] = 0
        CC_STATS["fell_back"] = True
        return _star_contraction(sym, nodes, cut)
    labels = cut(nodes.withColumn("label", F.col("node")))
    prev_sum = None
    converged = False
    deltas: list[int] = []
    for i in range(max_iters):
        # r15: min over {self} ∪ neighbor labels as ONE join + ONE
        # groupBy — the self rows ride into the same aggregate, so the
        # old groupBy + LEFT-join re-attachment (least/coalesce over a
        # second shuffle) collapses into the min. Identical labels.
        nbr = sym.join(labels, sym["dst"] == labels["node"]).select(
            F.col("src").alias("node"), "label"
        )
        labels = cut(
            nbr.unionByName(labels.select("node", "label"))
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        s = labels.agg(F.sum("label")).first()[0]
        CC_STATS["prop_rounds"] = i + 1
        if s == prev_sum:
            converged = True
            break
        if prev_sum is not None:
            deltas.append(prev_sum - s)
            # Diameter signature: propagation moves the min label ONE hop
            # per round along a path, so the label sum drops by a near-
            # constant amount each round. Three consecutive plateaued
            # deltas ⇒ hand off to the O(log n) contraction now instead
            # of propagating to budget exhaustion first. Only after half
            # the budget, though: early on, many equal-length chains
            # finishing together produce the same constant-rate signature
            # on a graph that is one or two rounds from converging, and
            # abandoning it would pay the full contraction restart for
            # nothing.
            if (
                method == "auto"
                and i + 1 >= max_iters // 2
                and len(deltas) >= 3
                and min(deltas[-3:]) > 0
                and max(deltas[-3:]) <= 1.25 * min(deltas[-3:])
            ):
                break
        prev_sum = s
    CC_STATS["fell_back"] = not converged
    if converged:
        return labels
    if method == "propagation":
        # partial labels are WRONG labels (a long path still mid-collapse)
        # — refuse to return them silently.
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds; "
            "raise max_iters (diameter exceeds it) or use method='star'"
        )
    # auto: the diameter beat the propagation budget (or the plateau
    # heuristic called it early) — restart with the O(log n) contraction.
    return _star_contraction(sym, nodes, cut)


def simhash64(sh: DataFrame, id_col: str) -> DataFrame:
    """64-bit SimHash per doc from its shingle set.

    Each shingle's md5 supplies 64 bits (first 16 hex chars); per bit the
    votes are +1/-1 over the doc's shingles and the sign forms the final
    bit. Expressed as: bit_b = (Σ_sh bit_b(sh)) * 2 > n_shingles.
    One explode + one groupBy — no UDFs.
    """
    # Extracting 64 bits from one decimal(20,0) via div/mod arithmetic is
    # heavy; instead hash per 16-bit limb: 4 limbs of 16 bits from the hex.
    limbs = sh.select(
        F.col(id_col),
        *[
            F.conv(F.substring(F.md5(F.col("shingle")), 1 + 4 * i, 4), 16, 10)
            .cast("long")
            .alias(f"limb{i}")
            for i in range(4)
        ],
    )
    aggs = []
    for i in range(4):
        for b in range(16):
            aggs.append(
                F.sum(
                    F.shiftright(F.col(f"limb{i}"), b).bitwiseAND(F.lit(1))
                ).alias(f"b_{i}_{b}")
            )
    counted = limbs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n"), *aggs
    )
    limb_cols = []
    for i in range(4):
        limb_val = F.lit(0).cast("long")
        for b in range(16):
            bit = (F.col(f"b_{i}_{b}") * 2 > F.col("n")).cast("long")
            limb_val = limb_val + F.shiftleft(bit, b)
        limb_cols.append(limb_val.alias(f"simhash_limb{i}"))
    return counted.select(F.col(id_col), *limb_cols)


def dup_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Exact substring-level duplication spans (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): find
    every maximal token range covered by ``window``-token substrings that
    occur at least ``min_count`` times in the corpus (cross-doc OR
    repeated within one doc), as (id, tok_start, tok_end) rows a cleaner
    can cut. This is the FOURTH dedup granularity next to exact-doc
    (fingerprint), near-doc (MinHash/SimHash/Jaccard), and line
    (line_dedup): a long passage quoted inside an otherwise unique doc is
    invisible to all three, but its windows collide here.

    The suffix-array machinery of the paper is replaced by the
    shuffle-friendly window-hash equivalent: every doc explodes into its
    L-token rolling windows (scan-side, one materialized token array —
    the shingle_rows discipline), window occurrence counts come from a
    partial-aggregated ``groupBy(hash)`` (a passage duplicated a million
    times compresses map-side; the join-back probe is the only skewed
    exchange and AQE can split it — the boilerplate_stats argument), and
    surviving window starts merge into maximal spans with a per-doc
    gaps-and-islands window (uniform doc keys; doc length bounds the
    partition). Detection is exact for duplicated runs of ≥ ``window``
    tokens; shorter duplicates are below the detection length by design
    (default 50 per the paper — the round-7 config alignment with
    ``cut_spans``; the catalog entries pass 20 to suit the test corpus).

    1-based token positions, end-inclusive — matching the SQL oracle's
    list-slice convention.
    """
    wins = _window_hashes(_tokenized(docs, id_col, text_col), id_col, window)
    dup_counts = (
        wins.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("_h")
    )
    dup = wins.join(dup_counts, "_h").select(
        id_col, "start", (F.col("start") + window - 1).alias("end")
    )
    return _merge_spans(dup, id_col)


def _tokenized(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, _toks): the lowercased whitespace token array — the shared
    scan-side tokenization of the window-hash dedup family."""
    return docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
        ).alias("_toks"),
    )


def _window_hashes(
    toked: DataFrame, id_col: str, window: int
) -> DataFrame:
    """(id, start, _h): every L-token rolling window's md5, 1-based
    starts; docs shorter than the window emit nothing."""
    return toked.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("_toks") >= window,
                F.sequence(F.lit(1), F.size("_toks") - window + 1),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("start"),
        "_toks",
    ).select(
        F.col(id_col),
        "start",
        F.md5(
            F.concat_ws(" ", F.slice("_toks", F.col("start"), window))
        ).alias("_h"),
    )


def _merge_spans(dup: DataFrame, id_col: str) -> DataFrame:
    """Merge (id, start, end) window rows into maximal spans per doc —
    the gaps-and-islands window (uniform doc keys; doc length bounds the
    partition). Overlapping AND adjacent windows fuse, so the output
    spans are pairwise disjoint and non-adjacent per doc."""
    from pyspark.sql import Window as W

    order = W.partitionBy(id_col).orderBy("start")
    prev_max_end = F.max("end").over(
        order.rowsBetween(W.unboundedPreceding, -1)
    )
    brk = F.when(
        F.col("start") <= F.coalesce(prev_max_end, F.lit(-1)) + 1, F.lit(0)
    ).otherwise(F.lit(1))
    grouped = dup.select(
        id_col, "start", "end", F.sum(brk).over(order).alias("_grp")
    )
    return (
        grouped.groupBy(id_col, "_grp")
        .agg(
            F.min("start").cast("long").alias("tok_start"),
            F.max("end").cast("long").alias("tok_end"),
        )
        .select(id_col, "tok_start", "tok_end")
    )


def cut_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Apply substring-level dedup: remove every duplicated ≥``window``-
    token run EXCEPT its first occurrence and emit the cleaned text —
    the actual "cut" step of the Lee et al. 2021 pipeline (``dup_spans``
    detects; this executes). Output: (id, cleaned_text, n_tokens_cut).

    Keep-first policy (deterministic, global): every duplicated window
    hash keeps exactly the occurrence with the lowest (doc_id, start) —
    packed as ``doc_id·10⁶ + start`` so the arg-min is a plain integer
    ``min`` under the partial-aggregated ``groupBy(hash)`` (no window
    function over the hot hash key; requires docs < 10⁶ tokens and
    doc_id < 2⁵³/10⁶ ≈ 9·10¹², documented bounds of the packed key).
    All other occurrences' windows merge into maximal cut spans per doc
    (gaps-and-islands) and their token ranges are deleted; survivors
    re-join with single spaces.

    Because the kept occurrence is first in (doc, start) order, each
    original window hash survives contiguously at most once in the
    cleaned corpus. That does NOT make the cut idempotent: deleting a
    span SPLICES its neighbors together, and a splice-created window can
    collide with text elsewhere (hypothesis found the minimal case —
    cutting "…bb [cc dd bb aa] bb" yields "…bb cc dd bb", a new 4-gram
    matching another doc). This is inherent to single-pass span removal
    (Lee et al.'s tool has the same property); production either accepts
    it (one pass removes the overwhelming mass) or iterates to fixpoint
    — each pass is this same operator. The sound invariant — per window
    hash, at most ONE original-contiguous survivor; any re-detected
    duplicate involves a splice — is property-tested on random corpora.

    ``cleaned_text`` is the NORMALIZED reconstruction (lowercased,
    whitespace-collapsed) — the same canonical token stream every other
    dedup granularity keys on. Default ``window=50`` per the paper; the
    catalog entry uses 20 to suit the small test corpus (the dup_spans
    default note).

    100 TB shape: identical exchanges to ``dup_spans`` (one explode →
    partial-agg groupBy(hash) → AQE-splittable join-back probe → per-doc
    islands) plus one uniform groupBy(doc) to assemble each doc's span
    array and an array-level filter — the reconstruction never explodes
    token positions into rows.
    """
    toked = _tokenized(docs, id_col, text_col)
    wins = _window_hashes(toked, id_col, window)
    packed = (F.col(id_col).cast("long") * F.lit(1_000_000) + F.col("start"))
    keyed = wins.select(id_col, "start", "_h", packed.alias("_pk"))
    dup_keep = (
        keyed.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_n"), F.min("_pk").alias("_keep_pk"))
        .filter(F.col("_n") >= min_count)
        .select("_h", "_keep_pk")
    )
    cuts = (
        keyed.join(dup_keep, "_h")
        .filter(F.col("_pk") != F.col("_keep_pk"))
        .select(
            id_col, "start", (F.col("start") + window - 1).alias("end")
        )
    )
    spans = _merge_spans(cuts, id_col)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("tok_start", "tok_end")).alias("_spans")
    )
    kept_pos = F.filter(
        F.when(
            F.size("_toks") > 0, F.sequence(F.lit(1), F.size("_toks"))
        ).otherwise(F.array().cast("array<int>")),
        lambda i: ~F.exists(
            F.col("_spans"),
            lambda sp: (i >= sp["tok_start"]) & (i <= sp["tok_end"]),
        ),
    )
    return (
        toked.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            "_toks",
            F.coalesce(
                "_spans",
                F.array().cast(
                    "array<struct<tok_start:bigint,tok_end:bigint>>"
                ),
            ).alias("_spans"),
        )
        .select(
            F.col(id_col),
            F.concat_ws(
                " ",
                F.transform(kept_pos, lambda i: F.element_at("_toks", i)),
            ).alias("cleaned_text"),
            (F.size("_toks") - F.size(kept_pos))
            .cast("long")
            .alias("n_tokens_cut"),
        )
    )


def keep_best_per_cluster(
    scored: DataFrame,
    components: DataFrame,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Canonical-document selection: turn near-dup CLUSTERS into a keep
    decision that keeps the BEST copy, not an arbitrary one.

    ``connected_components``' default keep rule (min id per component) is
    what dedup papers use for determinism, but production pipelines keep
    the highest-quality copy of a duplicated doc (RefinedWeb keeps the
    longest, Dolma the first by collection priority). ``scored`` is
    (id, ..., score_col); ``components`` is connected_components' output
    (node, label) covering only clustered docs — unclustered docs form
    their own singleton cluster and always keep.

    keep = argmax score per cluster, ties to the lowest id — a total
    order, so the flag is deterministic and cross-engine exact when the
    score is (like quality_score's 6-dp output). The per-cluster window
    partitions on cluster_id: near-dup clusters are small by nature
    (pathological mega-clusters are exactly what the boilerplate/df caps
    upstream prevent), so no single window partition can dominate.
    """
    from pyspark.sql import Window as W

    lab = (
        scored.join(
            components.withColumnRenamed("node", id_col), id_col, "left"
        )
        .withColumn("cluster_id", F.coalesce("label", F.col(id_col)))
        .drop("label")
    )
    w = W.partitionBy("cluster_id").orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    return lab.select(
        F.col(id_col),
        F.col("cluster_id"),
        F.col(score_col),
        (F.row_number().over(w) == 1).alias("keep"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS algorithm): from every doc's rolling k-gram
    hashes, select the minimum hash of each w-wide window (rightmost
    position on hash ties), deduped — a sparse fingerprint set with the
    winnowing GUARANTEE: any shared substring of ≥ k + w − 1 tokens
    yields at least one shared fingerprint, at an expected density of
    2/(w+1) of all k-grams. The selective sibling of ``dup_spans``'s
    keep-every-window-hash index: same candidate power for long matches
    at a w-fold smaller index.

    Engine shape: one explode (k-gram hashes, the dup_spans scan) + two
    window functions over per-doc partitions (doc length bounds the
    partition; no corpus-wide shuffle beyond the doc-key exchange) + a
    distinct bounded by the fingerprint density. The rightmost-tie
    argmin is encoded into a single ordered string key
    ``md5hash ∥ lpad(10⁸ − start)`` so one ``min`` over the frame
    resolves both orderings — identical string comparison in the DuckDB
    oracle (positions must stay < 10⁸; a 100 TB corpus chunks docs long
    before that, operators/packing.py)."""
    from pyspark.sql import Window as W

    wins = _window_hashes(_tokenized(docs, id_col, text_col), id_col, k)
    key = F.concat(
        F.col("_h"),
        F.lpad((F.lit(100_000_000) - F.col("start")).cast("string"), 9, "0"),
    )
    frame = W.partitionBy(id_col).orderBy("start").rowsBetween(0, w - 1)
    sel = (
        wins.withColumn("_cnt", F.count(F.lit(1)).over(frame))
        .withColumn("_sel", F.min(key).over(frame))
        .filter(F.col("_cnt") == w)
    )
    return sel.select(
        F.col(id_col),
        (F.lit(100_000_000) - F.substring("_sel", 33, 9).cast("long")).alias(
            "start"
        ),
        F.substring("_sel", 1, 32).alias("fp"),
    ).distinct()
