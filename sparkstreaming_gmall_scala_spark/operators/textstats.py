"""Text-quality analysis operators for training-data pipelines.

Language-ID (stopword-marker heuristic), quality scoring (length/punct/
stopword ratios), token counting (whitespace + BPE-ish regex) — all pure
Column expressions so they run inside whole-stage codegen at full scan
speed; on 100 TB these are scan-bound, zero-shuffle ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import punct_ratio, stopword_ratio, token_count

# Marker-word lists per language for the n-gram/stopword heuristic. On the
# synthetic corpus these share one vocabulary — the heuristic is honest and
# deterministic, which is what the oracle checks.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "zh": ("的", "是", "了", "在"),
}


def _marker_hits(text: Column, markers: tuple[str, ...]) -> Column:
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))
    return F.size(F.filter(toks, lambda t: t.isin(list(markers))))


def lang_id(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Pick the language with the most marker-token hits; ties and
    zero-hit docs fall back to 'und' ordered by the fixed language order
    (deterministic)."""
    text = F.col(text_col)
    scores = [
        (lang, _marker_hits(text, markers)) for lang, markers in LANG_MARKERS.items()
    ]
    best_score = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    # Reverse order so earlier languages win ties via later overwrite.
    for lang, s in reversed(scores):
        pred = F.when((s == best_score) & (best_score > 0), lang).otherwise(pred)
    return docs.select(
        F.col(id_col), pred.alias("pred_lang"), best_score.alias("marker_hits")
    )


def tfidf_top_terms(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k TF-IDF terms per document: tf from one (doc, term) groupBy,
    document frequency from a term-level rollup of that SAME aggregate
    (no second scan), idf = ln((N+1)/(df+1)).

    Scores are floor-rounded to 1e-6 and ranked as integers so the
    ordering — not just the values — is identical across engines; ties
    break on the term string. Two shuffles total (doc+term, then term);
    both keys are uniform, no skew."""
    from pyspark.sql import Window

    text = F.col(text_col)
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()  # post-agg scalar (like centroid k×dim collects)
    scored = tf.join(dfreq, "term").select(
        F.col(id_col),
        "term",
        "tf",
        "df",
        F.floor(
            F.col("tf")
            * F.log((n_docs + 1.0) / (F.col("df") + F.lit(1.0)))
            * 1e6
            + 0.5
        )
        .cast("long")
        .alias("score6"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score6").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score6", "rank")
    )


def bm25_rank(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: tuple[str, ...],
    top_n: int = 10,
    materialize: bool = True,
) -> DataFrame:
    """Top-n documents for a fixed query under BM25 (Robertson k1=1.2,
    b=0.75; Lucene idf = ln(1 + (N-df+0.5)/(df+0.5))).

    One token scan, one shuffle: per-doc length AND the per-query-term
    tfs come out of a single groupBy(doc) with one conditional sum per
    term (the query is a handful of terms — never a (doc, term) matrix).
    Corpus stats (N, Σdl, per-term df) fold from that aggregate into ONE
    collected row; the scoring pass reads the cached per-doc frame with
    the stats as literals. Top-n is orderBy+limit — Spark plans
    TakeOrderedAndProject (per-partition heaps + driver merge), never a
    global row_number sort of the corpus.

    Determinism: scores are IEEE doubles built with the same expression
    tree the DuckDB oracle writes (exact-integer tf/dl/N/df; one
    division for avgdl; per-term sums added left-to-right), floored at
    1e-6 into integer score6 — ranking ties break on the doc id.
    Residual portability risk (round-9 advice): the idf's ln() is only
    ~1-ulp-accurate and platform-dependent (JVM Math.log vs DuckDB
    libm), so a score6 within one ulp of the 1e-6 floor or a rank
    boundary could differ on another platform/libm — observed identical
    on this host."""
    return bm25_score_per_doc(
        bm25_per_doc(docs, id_col, text_col, query_terms),
        id_col,
        query_terms,
        top_n=top_n,
        materialize=materialize,
    )


def bm25_per_doc(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: tuple[str, ...],
) -> DataFrame:
    """The per-doc half of BM25: one token scan folded to
    (id, dl, _tf0.._tfk) — one conditional sum per query term. These
    rows are PER-DOC CONSTANTS (a document's length and term counts
    never change after arrival), which is what makes the live search
    index possible: streaming/search.py appends each batch's rows to an
    AppendOnlyIndex and the corpus statistics re-fold additively."""
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")
    text = F.col(text_col)
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))
        ).alias("term"),
    )
    return toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"_tf{i}")
            for i, t in enumerate(query_terms)
        ],
    )


def bm25_score_per_doc(
    per_doc: DataFrame,
    id_col: str,
    query_terms: tuple[str, ...],
    top_n: int = 10,
    materialize: bool = True,
) -> DataFrame:
    """The scoring half of BM25 over a (id, dl, _tf0.._tfk) frame —
    shared verbatim between bm25_rank (batch) and the live index read
    (streaming/search.py), so batch ≡ live holds by construction above
    the postings fold. Corpus stats collapse to ONE collected row; the
    scoring pass reads the cached per-doc frame with the stats as
    literals; top-n is TakeOrderedAndProject."""
    from pyspark.sql import Window

    per_doc = per_doc.persist()
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    ).collect()[0]  # one bounded row; also materializes the cache
    n = stats["n"]
    if not n:  # empty corpus: no avgdl to divide by (round-9 advice)
        # Derive the id type from per_doc itself (round-12 advice): a
        # string-id caller must get the same schema on the empty path
        # as the non-empty path (which keeps the real type via ranked).
        empty = per_doc.select(
            F.col(id_col),
            F.col("dl").cast("long").alias("dl"),
            F.lit(None).cast("long").alias("score6"),
            F.lit(None).cast("int").alias("rank"),
        ).limit(0)
        per_doc.unpersist()
        return empty
    avgdl = stats["sum_dl"] / n  # exact ints -> one double division
    score = None
    for i in range(len(query_terms)):
        dfi = stats[f"_df{i}"]
        tf = F.col(f"_tf{i}").cast("double")
        idf = F.log(F.lit(1.0) + F.lit(float(n - dfi) + 0.5) / F.lit(dfi + 0.5))
        term_score = idf * (
            (tf * F.lit(2.2))
            / (
                tf
                + F.lit(1.2)
                * (
                    F.lit(0.25)
                    + F.lit(0.75) * (F.col("dl").cast("double") / F.lit(avgdl))
                )
            )
        )
        score = term_score if score is None else score + term_score
    scored = per_doc.select(
        F.col(id_col),
        "dl",
        F.floor(score * 1e6 + 0.5).cast("long").alias("score6"),
    ).filter(F.col("score6") > 0)
    top = scored.orderBy(F.col("score6").desc(), F.col(id_col)).limit(top_n)
    w = Window.orderBy(F.col("score6").desc(), F.col(id_col))
    ranked = top.withColumn("rank", F.row_number().over(w))
    if not materialize:  # plan-inspection path: caller owns the cache
        return ranked
    # the result is bounded (≤ top_n rows): materialize it in ONE action
    # — the token scan + TakeOrderedAndProject run here — so the cached
    # per-doc frame can be unpersisted before return instead of leaking
    # across the bench session (round-9 advice)
    rows = ranked.collect()
    per_doc.unpersist()
    return per_doc.sparkSession.createDataFrame(rows, schema=ranked.schema)


def quality_score(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Cheap quality features + a blended score in [0,1]:
    - n_chars, n_tokens
    - stop_ratio: stopword fraction (too low ⇒ keyword soup)
    - punct_ratio: non-alnum fraction (too high ⇒ markup/noise)
    - score = 0.4*min(n_tokens/100,1) + 0.4*stop_ratio + 0.2*(1-punct_ratio)
    All ratios floor-rounded to 6 dp for cross-engine stability."""
    text = F.col(text_col)

    def r6(c: Column) -> Column:
        return F.floor(c * 1e6 + F.lit(0.5)) / 1e6

    n_tokens = token_count(text)
    stop_r = r6(stopword_ratio(text))
    punct_r = r6(punct_ratio(text))
    score = r6(
        F.lit(0.4) * F.least(n_tokens.cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.4) * stop_r
        + F.lit(0.2) * (F.lit(1.0) - punct_r)
    )
    return docs.select(
        F.col(id_col),
        F.length(text).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        stop_r.alias("stop_ratio"),
        punct_r.alias("punct_ratio"),
        score.alias("quality"),
    )


def repetition_stats(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals per doc (Rae et al. 2021 §A1.1's
    duplicate-token and top-n-gram fractions — standard LLM corpus quality
    filters the reference has no analog for):

    - ``dup_token_frac``: 1 − |distinct tokens| / |tokens| — boilerplate
      and keyword-stuffed docs score high;
    - ``top_2gram_frac``: occurrences of the most frequent 2-gram over all
      2-gram slots — repeated-phrase spam scores high.

    Token/2-gram extraction is a codegen Column expression; the only
    shuffle is one (doc, gram) groupBy for the mode — scan-bound at scale.
    Fractions are floor-rounded to 6 dp for engine-portable comparison.
    """
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
        ).alias("_toks"),
    )
    base = toks.select(
        F.col(id_col),
        F.size("_toks").alias("n_tokens"),
        F.size(F.array_distinct("_toks")).alias("n_distinct"),
        F.when(
            F.size("_toks") >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - 2),
                lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, 2)),
            ),
        )
        .otherwise(F.array())
        .alias("_grams"),
    )
    gram_counts = (
        base.select(F.col(id_col), F.explode("_grams").alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy(id_col)
        .agg(F.max("n").alias("top_gram_n"), F.sum("n").alias("n_grams"))
    )

    def r6(c: Column) -> Column:
        return F.floor(c * 1e6 + 0.5) / 1e6

    return (
        base.drop("_grams")
        .join(gram_counts, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            r6(
                F.when(
                    F.col("n_tokens") > 0,
                    1 - F.col("n_distinct") / F.col("n_tokens"),
                ).otherwise(F.lit(0.0))
            ).alias("dup_token_frac"),
            r6(
                F.when(
                    F.col("n_grams") > 0, F.col("top_gram_n") / F.col("n_grams")
                ).otherwise(F.lit(0.0))
            ).alias("top_2gram_frac"),
        )
    )


def boilerplate_stats(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_df: int = 20,
) -> DataFrame:
    """Cross-document boilerplate detection (the C4/RefinedWeb repeated-
    n-gram filter): an n-gram appearing in ≥ ``min_df`` distinct docs is
    boilerplate (navigation chrome, licence footers, templated spam);
    each doc reports how much of it is boilerplate.

    Shape at 100 TB: document frequency comes from ``groupBy(shingle).
    count()`` + join back — NOT a count window over
    ``partitionBy(shingle)``. A boilerplate shingle is by definition
    present in a huge share of documents, and a window partition cannot
    be split: every occurrence of "click here to" would ship to ONE
    window task (AQE skew handling covers joins, not windows). The
    groupBy formulation is partial-aggregated map-side, so hot shingles
    compress to one row per task BEFORE their shuffle, and the join-back
    probe — the only remaining skewed exchange — is a sort-merge join
    AQE's skew-split CAN cut into bounded tasks. The third exchange this
    costs (agg subtree vs probe subtree, no exchange reuse) is the price
    of bounded per-task work; the per-doc rollup after it is a
    partial-aggregated groupBy on uniform doc keys.

    Every doc appears in the output: ``shingle_rows`` is total (an empty
    text yields one empty-string shingle), so no reconciling join against
    the input is needed. Output per doc: ``(id, n_shingles, n_boiler,
    boiler_frac)`` with boiler_frac floor-rounded to 6 dp for engine
    portability.
    """
    from .dedup import shingle_rows

    sh = shingle_rows(docs, id_col, text_col, n=n)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    # inner join keeps every sh row (each shingle has a df row by
    # construction), so the per-doc counts below are over the full set
    with_df = sh.join(dfreq, "shingle")

    def r6(c: Column) -> Column:
        return F.floor(c * 1e6 + 0.5) / 1e6

    return (
        with_df.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("_df") >= min_df, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_boiler"),
        )
        .select(
            id_col,
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_boiler").cast("long").alias("n_boiler"),
            r6(
                F.when(
                    F.col("n_shingles") > 0,
                    F.col("n_boiler") / F.col("n_shingles"),
                ).otherwise(F.lit(0.0))
            ).alias("boiler_frac"),
        )
    )


def ngram_overlap_flags(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Eval-set decontamination by n-gram collision (the GPT-3/LLaMA
    practice: a training doc sharing any long n-gram with a benchmark doc
    is contaminated and dropped).

    Both sides explode into distinct word-n-gram shingles; the eval
    shingle set — tiny by definition — is broadcast and the overlap count
    per training doc is one anti-skew-free groupBy. Production uses
    n≈8-13; ``n`` is a parameter (tests here use the corpus-standard 3 so
    the DuckDB oracle reuses the shared shingle fragment).

    Output: (id, n_shared_ngrams, contaminated) for EVERY input doc —
    the keep-policy filter is ``NOT contaminated``.
    """
    from .dedup import shingle_rows

    doc_sh = shingle_rows(docs, id_col, text_col, n=n)
    eval_sh = (
        shingle_rows(eval_docs, id_col, text_col, n=n)
        .select("shingle")
        .distinct()
    )
    hits = (
        doc_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shared_ngrams", F.lit(0))
            .cast("long")
            .alias("n_shared_ngrams"),
            (F.coalesce("n_shared_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def gopher_columns(
    text: Column,
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.6,
) -> dict[str, Column]:
    """The Gopher-rule feature/keep COLUMN expressions (factored out r16
    so corpus_features can inline ``keep`` on its cached base projection
    instead of paying a join-by-id exchange pair for a zero-shuffle
    select — one definition, so the flag cannot drift between the
    standalone query and the curation pipeline)."""
    toks = F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))
    lines = F.filter(
        F.split(text, r"\n"), lambda l: F.trim(l) != F.lit("")
    )
    n_words = F.size(toks)
    n_lines = F.size(lines)
    mean_word_len = F.when(
        n_words > 0,
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).cast("double")
        / n_words,
    ).otherwise(F.lit(0.0))
    n_symbols = (
        F.size(F.split(text, r"#", -1))
        + F.size(F.split(text, r"\.\.\.", -1))
        + F.size(F.split(text, "…", -1))
        - 3
    )
    symbol_ratio = F.when(
        n_words > 0, n_symbols.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda l: F.trim(l).rlike(r"^([*•\-]\s)"),
            )
        ).cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"),
            )
        ).cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("double")
        / n_words,
    ).otherwise(F.lit(0.0))

    def r6(c: Column) -> Column:
        return F.floor(c * 1e6 + 0.5) / 1e6

    mean_word_len, symbol_ratio, bullet_frac, ellipsis_frac, alpha_frac = (
        r6(mean_word_len),
        r6(symbol_ratio),
        r6(bullet_frac),
        r6(ellipsis_frac),
        r6(alpha_frac),
    )
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_frac)
    )
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": mean_word_len,
        "symbol_ratio": symbol_ratio,
        "bullet_frac": bullet_frac,
        "ellipsis_frac": ellipsis_frac,
        "alpha_frac": alpha_frac,
        "keep": keep,
    }


def gopher_quality(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.6,
) -> DataFrame:
    """Gopher-rule composite quality filter (Rae et al. 2021 §A1.1's
    document-level heuristics, the standard pre-filter before model-based
    scoring): word-count bounds, mean word length bounds, symbol-to-word
    ratio ('#' and ellipses), bullet-started / ellipsis-ended line
    fractions, and the alphabetic-word fraction. Emits every feature plus
    the composite ``keep`` flag so downstream can re-threshold without
    recomputing.

    Pure Column expressions over one scan — zero shuffle, codegen'd; at
    100 TB this runs at scan speed next to the other per-doc features.
    Ratios floor-rounded to 6 dp for engine-portable comparison.
    """
    cols = gopher_columns(
        F.col(text_col),
        min_words,
        max_words,
        min_mean_word_len,
        max_mean_word_len,
        max_symbol_ratio,
        max_bullet_frac,
        max_ellipsis_frac,
        min_alpha_frac,
    )
    return docs.select(
        F.col(id_col),
        *[c.alias(name) for name, c in cols.items()],
    )


def token_entropy(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Unigram token entropy per doc (nats) — the cheap perplexity proxy
    for spotting degenerate/repetitive text (low entropy) without a model:
    H = ln(n) − (Σ_t tf ln tf) / n over the doc's token histogram.

    One (doc, term) groupBy — uniform keys, partial-aggregated — then a
    per-doc rollup; both shuffles compress map-side. Entropy is
    floor-rounded to 6 dp so the DuckDB oracle matches bit-for-bit at
    double precision.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode_outer(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("term").alias("tf"))
    per_doc = tf.groupBy(id_col).agg(
        F.sum("tf").alias("n"),
        F.sum(F.col("tf") * F.log(F.col("tf").cast("double"))).alias("s"),
    )
    ent = F.when(
        F.col("n") > 0, F.log(F.col("n").cast("double")) - F.col("s") / F.col("n")
    ).otherwise(F.lit(0.0))
    return per_doc.select(
        F.col(id_col),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_tokens"),
        (F.floor(ent * 1e6 + 0.5) / 1e6).alias("entropy"),
    )


def lm_doc_logprob(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc bigram-LM score — the CCNet/KenLM perplexity filter signal
    (Wenzek et al. 2020) with the LM trained on the corpus itself: docs
    whose token sequences are improbable under the corpus's own bigram
    statistics (keyboard mash, wrong-language fragments, templated spam)
    score low, and the standard keep-policy drops the tail.

    Model: MLE bigram probabilities P(w2|w1) = c(w1,w2) / c(w1,·) with
    counts over the SAME corpus being scored — every scored bigram exists
    in the table by construction, so no smoothing branch is needed and
    the whole computation is exactly SQL-expressible (full DuckDB oracle,
    unlike an external-LM variant). Output per doc: ``n_bigrams`` and
    ``avg_logprob`` (mean ln P; perplexity = exp(−avg_logprob) is the
    monotone-equivalent report, left to callers to avoid a second
    transcendental in the cross-engine hash). Docs with < 2 tokens score
    0.0 with n_bigrams = 0.

    100 TB shape (round-7 restructure): the per-occurrence bigram frame
    is touched by exactly ONE partial-aggregated groupBy — into per-doc
    DISTINCT bigram counts ``(doc, w1, w2, c)`` — and everything after
    runs at distinct-bigram granularity: the global bigram table derives
    from that aggregate (not from the occurrence frame again), the
    prefix table derives from the bigram table (vocab²-bounded, tiny by
    comparison), and the join-back probe matches per-doc DISTINCT
    bigrams, weighting each log by its count. The earlier form ran two
    corpus-sized groupBys plus a corpus-sized two-table join-back —
    measurably slower and strictly more exchange bytes. Hot bigrams
    still compress map-side; the join-back stays AQE-splittable (the
    boilerplate_stats de-skew argument). avg rounded to 6 dp for engine
    portability.

    Determinism (round-6 advice): each per-bigram ln is quantized to an
    integer nano-unit (floor(ln·1e9 + 0.5) as BIGINT) BEFORE summation,
    so the per-doc total is exact integer arithmetic — independent of
    partition/accumulation order on both engines. A float F.sum of
    doubles is order-dependent in the last ulp, which could flip the
    6-dp rounding of a doc landing near a 0.5e-6 boundary between runs;
    the 1e-9 quantization error (≤ n_bigrams·5e-10 on the mean) is far
    below the 6-dp report.
    """
    toked = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
        ).alias("_toks"),
    )
    bg = toked.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("_toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("_toks") - 1),
                    lambda i: F.struct(
                        F.element_at("_toks", i).alias("w1"),
                        F.element_at("_toks", i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("_bg"),
    ).select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    # the ONLY pass over the occurrence frame
    bgc = bg.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("_c"))
    c12 = bgc.groupBy("w1", "w2").agg(F.sum("_c").alias("_n12"))
    c1 = c12.groupBy("w1").agg(F.sum("_n12").alias("_n1"))
    # per-bigram quantized log-rate; |l9| ≤ ~3.6e10 and counts ≤ 1e6
    # tokens/doc keep the weighted products far inside long range
    rate = (
        c12.join(c1, "w1")
        .select(
            "w1",
            "w2",
            F.floor(
                F.log(F.col("_n12").cast("double") / F.col("_n1")) * 1e9
                + 0.5
            )
            .cast("long")
            .alias("_l9"),
        )
    )
    per = (
        bgc.join(rate, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_bigrams"),
            F.sum(F.col("_c") * F.col("_l9")).alias("_s9"),
        )
    )
    return (
        docs.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            (
                F.floor(
                    F.when(
                        F.col("n_bigrams") > 0,
                        F.col("_s9") / 1e9 / F.col("n_bigrams"),
                    ).otherwise(F.lit(0.0))
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("avg_logprob"),
        )
    )


def perplexity_buckets(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    strata_col: str,
    k: int = 3,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): within each
    stratum (CCNet: language shard; here: source domain), rank docs by
    LM score and cut into ``k`` equal tiles — head = best-scoring third,
    the slice usually kept for pretraining, tail = the drop candidate.

    Built on lm_doc_logprob (higher avg_logprob = more probable = better),
    ordered by (avg_logprob DESC, id) so ties break deterministically and
    NTILE is total-order-exact on both engines (same first-(n mod k)-
    tiles-get-one-extra semantics). The per-stratum window is a sort
    within each domain partition — fine while no single domain dominates
    a shard set; at 100 TB with a monster stratum the same contract is
    served by two approx_percentile thresholds per stratum (no sort,
    broadcast thresholds), trading exact tile sizes for a bounded-error
    split. This exact form is the oracle-checkable contract.
    """
    from pyspark.sql import Window

    lm = lm_doc_logprob(docs, id_col, text_col)
    scored = docs.select(id_col, strata_col).join(lm, id_col)
    w = Window.partitionBy(strata_col).orderBy(
        F.col("avg_logprob").desc(), F.col(id_col)
    )
    tile = F.ntile(k).over(w)
    label = (
        F.when(tile == 1, F.lit("head"))
        .when(tile == k, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return scored.select(
        id_col,
        strata_col,
        "avg_logprob",
        tile.alias("tile"),
        label.alias("ppl_bucket"),
    )


def bigram_stats(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 50,
    materialize: bool = True,
) -> DataFrame:
    """Top-n corpus bigrams with conditional and continuation
    probabilities — the n-gram LM counting pass (the expensive half of
    Kneser-Ney training; smoothing is driver-side arithmetic over these
    counts at any scale).

    Per bigram (w1, w2): c12 = corpus count, p6 = P(w2|w1) and
    pcont6 = KN continuation P_cont(w2) = |{w: c(w,w2)>0}| / |distinct
    bigrams| — both held as EXACT integers ((x * 1e6) // y; no doubles
    anywhere, so cross-engine equality is arithmetic, not luck).

    One token scan: bigrams form executor-side by zipping the token
    array against its own tail (no self-join), one groupBy(w1, w2), and
    the two marginals (w1 totals, w2 continuation counts) roll up from
    that SAME aggregate — vocabulary-sized, broadcast back. Top-n via
    orderBy+limit (TakeOrderedAndProject)."""
    from pyspark.sql import Window  # noqa: F401  (parity with siblings)

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    pairs = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w1"),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w2"),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).persist()
    c12.count()  # materialize before the three-consumer fan-out
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n_left"))
    n_bigram_types = c12.count()
    scored = (
        c12.join(F.broadcast(c1), "w1")
        .join(F.broadcast(cont), "w2")
        .select(
            "w1",
            "w2",
            "c12",
            # `div` = integral floor division on longs — matches the
            # oracle's `//` exactly (a double `/` + cast could round the
            # other way within one ulp of an integer)
            F.expr("c12 * 1000000L div c1").alias("p6"),
            F.expr(f"n_left * 1000000L div {n_bigram_types}L").alias("pcont6"),
        )
    )
    top = scored.orderBy(F.col("c12").desc(), "w1", "w2").limit(top_n)
    if not materialize:  # plan-inspection path: caller owns the cache
        return top
    # bounded (≤ top_n rows): one action materializes the whole pipeline
    # so the cached bigram aggregate unpersists before return instead of
    # leaking across the bench session (round-9 advice)
    rows = top.collect()
    c12.unpersist()
    return docs.sparkSession.createDataFrame(rows, schema=top.schema)


def postings(
    docs: DataFrame, id_col: str, text_col: str, head_n: int = 20
) -> DataFrame:
    """Inverted-index build: per term, document frequency, total term
    frequency, and the first ``head_n`` doc ids of the (ascending)
    postings list rendered as a comma string — the search-index
    construction pass feeding BM25 serving.

    One token scan -> one (term, doc) aggregate (tf per posting) ->
    one term-level rollup where the postings list materializes as
    sort_array(collect_list(...)) TRUNCATED to head_n: the head is for
    inspection/oracle purposes — a full 100 TB postings store writes the
    (term, doc, tf) aggregate itself, bucketed by term, instead of
    packing giant arrays into single rows (documented cap, not a silent
    one). Deterministic: doc ids are distinct per term by construction,
    so the ascending sort is a total order."""
    text = F.col(text_col)
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))
        ).alias("term"),
    )
    per_posting = toks.groupBy("term", id_col).agg(
        F.count(F.lit(1)).alias("tf")
    )
    heads = F.concat_ws(
        ",",
        F.transform(
            F.slice(F.sort_array(F.collect_list(F.col(id_col))), 1, head_n),
            lambda x: x.cast("string"),
        ),
    )
    return per_posting.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("tf_total"),
        heads.alias("head_postings"),
    )


def skipgram_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 2,
    top_n: int = 100,
    materialize: bool = True,
) -> DataFrame:
    """Top-``top_n`` skip-gram co-occurrence pairs with PPM lift — the
    word2vec/PMI data-prep pass: tokens within ``window`` positions
    co-occur; lift = P(w1,w2)/(P(w1)·P(w2)) scaled to parts-per-million.

    Scale shape: pair generation is ARRAY-side (zip_with over position-
    shifted slices — no positional self-join, no O(len²) explode), so the
    corpus is token-scanned once into one (pair) aggregate plus one
    (token) aggregate; the pair→unigram joins broadcast the vocab-sized
    count tables. Lift avoids ln() entirely (integral PPM ratio of exact
    BIGINT counts through one IEEE-double tree shared with the oracle —
    multiplication/division are correctly rounded, unlike ln; counts
    above 2^53 at extreme corpus scale would round identically on both
    engines, so the gate holds even there). Ties: (n_cooc desc, pair asc)
    is a total order."""
    text = F.col(text_col)
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))
    # Persisted so BOTH aggregates (pair + unigram) fold from one token
    # scan: the `total` collect below fills the cache, the pair lineage
    # at the final collect reads it (MEMORY_AND_DISK — spills, never
    # recomputes through the corpus). Unigram counts can't roll up from
    # the skip-gram pair aggregate (each token joins up to 2·window
    # pairs), so caching the tokens is what makes one-scan true here,
    # where bigram_stats gets it by persisting the pair aggregate.
    d = docs.select(F.col(id_col), toks.alias("t")).persist()
    parts = []
    for k in range(1, window + 1):
        parts.append(
            F.when(
                F.size("t") > k,
                F.zip_with(
                    F.expr(f"slice(t, 1, size(t) - {k})"),
                    F.expr(f"slice(t, {k + 1}, size(t) - {k})"),
                    lambda a, b: F.concat_ws(
                        " ", F.least(a, b), F.greatest(a, b)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        )
    pairs = d.select(
        F.explode(F.concat(*parts)).alias("pair")
    )
    cooc = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n_cooc"))
    uni = (
        d.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    total = uni.agg(F.sum("c").alias("n")).collect()[0]["n"]
    if not total:
        uni.unpersist()
        d.unpersist()
        return docs.sparkSession.createDataFrame(
            [], "pair string, n_cooc long, lift_ppm long"
        )
    split_pair = F.split(F.col("pair"), " ", 2)
    scored = (
        cooc.withColumn("w1", split_pair.getItem(0))
        .withColumn("w2", split_pair.getItem(1))
        .join(F.broadcast(uni.withColumnRenamed("w", "w1")
                          .withColumnRenamed("c", "c1")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2")
                          .withColumnRenamed("c", "c2")), "w2")
        .select(
            "pair",
            "n_cooc",
            F.floor(
                (
                    F.col("n_cooc").cast("double")
                    * F.lit(float(total))
                    / (F.col("c1").cast("double") * F.col("c2").cast("double"))
                )
                * F.lit(1000000.0)
                + F.lit(0.5)
            ).cast("long").alias("lift_ppm"),
        )
    )
    top = scored.orderBy(F.col("n_cooc").desc(), "pair").limit(top_n)
    if not materialize:
        # plan-inspection path: keep the pre-existing one-cache contract
        # (caller owns `uni` only) — release the doc-proportional token
        # cache here so lazy callers don't leak it for the session
        d.unpersist()
        return top
    rows = top.collect()  # bounded: <= top_n rows
    uni.unpersist()
    d.unpersist()
    return docs.sparkSession.createDataFrame(rows, schema=top.schema)


def phrase_match(
    docs: DataFrame, id_col: str, text_col: str, w1: str, w2: str
) -> DataFrame:
    """Exact-phrase retrieval ("w1 w2" adjacent) via a POSITIONAL
    postings join: per matching document, occurrence count and first
    match position (1-based).

    The serving-path shape: explode to (doc, pos, term) postings,
    filter each side to ONE term (against a persisted term-bucketed
    postings store this is partition pruning — two point lookups, never
    a corpus scan), then an equi-join on (doc, pos+1 = pos) — a hash
    join of two term-sized slices, no nested loop, no array
    rescanning. Complements bm25_rank (bag-of-words) with order-aware
    matching."""
    text = F.col(text_col)
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))
    pos = docs.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "term")
    )
    # 1-based position of w1; w2 must sit at the NEXT slot, whose 0-based
    # pos equals that same number — both join keys are plain columns, so
    # Catalyst plans a hash join of two term-sized postings slices
    p1 = pos.filter(F.col("term") == w1).select(
        F.col(id_col), (F.col("pos") + 1).alias("i")
    )
    p2 = pos.filter(F.col("term") == w2).select(
        F.col(id_col).alias("_d2"), F.col("pos").alias("i2")
    )
    m = p1.join(
        p2, (F.col(id_col) == F.col("_d2")) & (F.col("i") == F.col("i2"))
    )
    return m.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("i").alias("first_pos"),
    )
