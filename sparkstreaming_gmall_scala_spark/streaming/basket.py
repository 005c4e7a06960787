"""Streaming market-basket affinity (the live cross-sell matrix).

The batch query (plans/tpch.py:brand_affinity) self-joins the distinct
(order, brand) projection of the FULL fact table; per-batch recomputation
is O(corpus). This module streams it with the transitions-style carry
(streaming/transitions.py): all three statistics the lift needs — pair
co-occurrence counts, per-brand order frequencies, and the order total —
are additive monoids over the distinct (order, brand) pairs, PROVIDED each
pair is counted exactly once across batches. Baskets span batches (an
order's lines can arrive in any split), so per batch:

- ``new``   = the batch's distinct (o, b) pairs NOT in carry(N−1) — the
  anti-join makes every (order, brand) pair contribute to the counters in
  exactly one batch, whatever the split;
- freq partial   += new grouped by brand;
- orders partial += orders appearing in ``new`` whose key is absent from
  carry(N−1) (first sighting of the basket);
- pair partial   += for each order, new×old pairs (counted once — the old
  side never re-pairs, it isn't in ``new``) plus new×new pairs under
  a<b (counted once by the ordering);
- carry(N) = carry(N−1) ∪ new, written as generation N.

Replay-idempotent: carry is read by EXACT generation (N−1), never
"latest", so a replayed batch recomputes the same ``new`` set and
rewrites its three counter partials and its carry generation
byte-identically. Counter rows carry ``src_batch`` (the vocab/bpe
identity-semantic discipline) so compaction/crash-dedup stay safe.

State: carry(N) holds every (order, brand) pair seen so far — unlike the
transitions carry (one row per user) this grows with the fact table. At
100 TB the carry generations are pruned by basket lateness: an order
whose last line is older than the ingestion watermark can never gain new
brands, so its rows leave the carry (drop them when writing generation N)
without affecting any future anti-join. The tests exercise the unpruned
form; the pruning predicate is a filter on the carry write, not a design
change.

Read side: fold the three partials (dedup on key+src_batch, groupBy-sum),
then the SAME literal-n_orders IEEE lift tree as the batch query — pinned
equal to it over any batch split in tests/test_streaming_basket.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.batch import AppendOnlyIndex, IdempotentBatchWriter, has_parquet


def basket_ingest_batch(
    spark: SparkSession,
    pairs_dir: str,
    freq_dir: str,
    orders_dir: str,
    carry_dir: str,
    order_col: str = "o",
    brand_col: str = "b",
    compact_every: int | None = None,
):
    """Per-batch body (foreachBatch-shaped): fold the batch's NEW
    (order, brand) pairs into the three additive counter indexes, then
    rewrite the carry generation."""
    pairs_idx = AppendOnlyIndex(pairs_dir)
    freq_idx = AppendOnlyIndex(freq_dir)
    orders_idx = AppendOnlyIndex(orders_dir)
    carry = IdempotentBatchWriter(carry_dir)
    if compact_every is not None and compact_every < 1:
        raise ValueError("compact_every must be >= 1")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        ob = batch_df.select(
            F.col(order_col).alias("o"), F.col(brand_col).alias("b")
        ).distinct()
        prev_path = f"{carry_dir}/batch_id={batch_id - 1}"
        if batch_id > 0 and has_parquet(prev_path):
            prev = spark.read.parquet(prev_path).select("o", "b")
        else:
            prev = spark.createDataFrame([], ob.schema).select("o", "b")
        new = ob.join(prev, ["o", "b"], "left_anti").persist()
        # brand frequency partial: each NEW pair is one (order ∋ brand)
        freq_idx.append(
            new.groupBy("b")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("src_batch", F.lit(batch_id)),
            batch_id,
        )
        # order-total partial: baskets first sighted in this batch
        first = (
            new.select("o")
            .distinct()
            .join(prev.select("o").distinct(), "o", "left_anti")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("src_batch", F.lit(batch_id))
        )
        orders_idx.append(first, batch_id)
        # pair partial: new×old once (old is never the x side — it isn't
        # in `new`), new×new once via a<b. Keyed on the order, quadratic
        # only in basket WIDTH — the batch query's own bound.
        old_side = prev.select("o", F.col("b").alias("yb")).withColumn(
            "y_new", F.lit(False)
        )
        new_side = new.select("o", F.col("b").alias("yb")).withColumn(
            "y_new", F.lit(True)
        )
        cand = (
            new.select("o", F.col("b").alias("xb"))
            .join(old_side.unionByName(new_side), "o")
            .filter(
                (F.col("xb") != F.col("yb"))
                & (~F.col("y_new") | (F.col("xb") < F.col("yb")))
            )
        )
        pairs_idx.append(
            cand.select(
                F.least("xb", "yb").alias("brand_a"),
                F.greatest("xb", "yb").alias("brand_b"),
            )
            .groupBy("brand_a", "brand_b")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("src_batch", F.lit(batch_id)),
            batch_id,
        )
        # carry(N) = carry(N−1) ∪ new — rewritten whole per generation so
        # a replayed batch N reads the same N−1 inputs (at 100 TB, add
        # the watermark filter here: orders past basket lateness leave)
        carry(prev.unionByName(new.select("o", "b")), batch_id)
        new.unpersist()
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            for idx in (pairs_idx, freq_idx, orders_idx):
                idx.compact(spark, upto_batch_id=batch_id - 1)

    return process


def _fold(raw: DataFrame, key_cols: list[str]) -> DataFrame:
    return (
        raw.dropDuplicates(key_cols + ["src_batch"])
        .groupBy(*key_cols)
        .agg(F.sum("cnt").alias("n"))
    )


def brand_affinity_live(
    spark: SparkSession, pairs_dir: str, freq_dir: str, orders_dir: str
) -> DataFrame:
    """The streamed twin of the brand_affinity catalog query: identical
    columns and the identical literal-n_orders IEEE lift tree, computed
    from the folded counter indexes instead of a fact re-scan."""
    n_orders = (
        _fold(AppendOnlyIndex(orders_dir).read(spark), [])
        .collect()[0]["n"]
        or 0
    )
    freq = _fold(
        AppendOnlyIndex(freq_dir).read(spark), ["b"]
    ).withColumnRenamed("n", "nb")
    pairs = _fold(
        AppendOnlyIndex(pairs_dir).read(spark), ["brand_a", "brand_b"]
    ).withColumnRenamed("n", "n_both")
    return (
        pairs.join(
            F.broadcast(
                freq.withColumnRenamed("b", "brand_a").withColumnRenamed(
                    "nb", "na"
                )
            ),
            "brand_a",
        )
        .join(
            F.broadcast(
                freq.withColumnRenamed("b", "brand_b").withColumnRenamed(
                    "nb", "nbb"
                )
            ),
            "brand_b",
        )
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            F.floor(
                F.col("n_both").cast("double")
                * F.lit(float(n_orders))
                / (F.col("na").cast("double") * F.col("nbb").cast("double"))
                * F.lit(1000000.0)
                + F.lit(0.5)
            ).cast("long").alias("lift_ppm"),
        )
    )


def assoc_rules_live(
    spark: SparkSession, pairs_dir: str, freq_dir: str, orders_dir: str
) -> DataFrame:
    """Directional association rules (plans/tpch.py:assoc_rules) served
    from the SAME three counter indexes brand_affinity_live folds — no
    new ingest state (r11 verdict #6): confidence/support/lift are all
    functions of (pair count, brand frequencies, order total). The
    unordered pair counter (brand_a < brand_b) expands to both
    directions by a union with the swapped projection — n_both is
    direction-independent, only confidence's denominator (the
    antecedent's frequency) differs per direction. Arithmetic is the
    batch query's verbatim: exact integer ppm floor-div for
    confidence/support, the one shared IEEE double tree for lift."""
    n_orders = (
        _fold(AppendOnlyIndex(orders_dir).read(spark), [])
        .collect()[0]["n"]
        or 0
    )
    freq = _fold(
        AppendOnlyIndex(freq_dir).read(spark), ["b"]
    ).withColumnRenamed("n", "nb")
    und = _fold(
        AppendOnlyIndex(pairs_dir).read(spark), ["brand_a", "brand_b"]
    ).withColumnRenamed("n", "n_both")
    pairs = und.select(
        F.col("brand_a").alias("antecedent"),
        F.col("brand_b").alias("consequent"),
        "n_both",
    ).unionByName(
        und.select(
            F.col("brand_b").alias("antecedent"),
            F.col("brand_a").alias("consequent"),
            "n_both",
        )
    )
    lift = F.floor(
        F.col("n_both").cast("double")
        * F.lit(float(n_orders))
        / (F.col("na").cast("double") * F.col("nc").cast("double"))
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    conf = F.expr("n_both * 1000000L div na")
    return (
        pairs.join(
            F.broadcast(
                freq.withColumnRenamed("b", "antecedent")
                .withColumnRenamed("nb", "na")
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                freq.withColumnRenamed("b", "consequent")
                .withColumnRenamed("nb", "nc")
            ),
            "consequent",
        )
        .select(
            "antecedent",
            "consequent",
            "n_both",
            conf.alias("confidence_ppm"),
            F.expr(f"n_both * 1000000L div {n_orders}").alias(
                "support_ppm"
            ),
            lift.alias("lift_ppm"),
            ((conf >= 250000) & (lift > 1000000)).alias("actionable"),
        )
    )
