"""Incremental corpus dedup: MinHash-LSH candidate generation as a
streaming pipeline over a persisted band index.

No reference counterpart (the reference's only dedup is per-key streaming
distinct, app/DauApp.scala:85-104); this is the shape a 100 TB ingest
actually needs: documents arrive continuously, and each micro-batch
computes candidates for the NEW docs only — shingle/minhash cost is
O(batch), and the join probes the persisted (band_idx, band_hash) index
instead of re-banding the whole corpus. Exact duplicates are subsumed:
identical normalized text ⇒ identical signature ⇒ all bands collide.

Incremental completeness argument: a pair {x, y} (x ingested no later
than y) is emitted exactly when y's batch runs — y is new, x is in the
index (or the same batch) — so the union of all batch outputs equals the
batch self-join (operators/dedup.py::lsh_candidate_pairs) over the full
corpus; pinned by tests/test_streaming.py.

Write order is output-then-index (the order_info_batch claims pattern):
a crash between the two replays the batch against an index that doesn't
yet contain its bands, recomputing identical pairs. Replaying a batch
AFTER later batches committed emits a superset of its original pairs
(new-vs-everything-indexed); those extras are exactly the later batches'
rows, so the corpus-level pair set is unchanged.

The band index is APPEND-ONLY: each batch writes its own ``batch_id=N``
directory (``IdempotentBatchWriter`` — a replayed id overwrites itself
with identical bands, never touching other batches' files). Bands are
insert-only by construction, so no merge is needed: per-batch index
maintenance is O(batch), not O(corpus) — the whole-index
read-union-rewrite ``upsert_parquet`` (a small-dim tool) would be the
bottleneck at 100 TB. The batch's own bands join the probe universe via
a plain union (no ``distinct()``: the index is (doc_id, band_idx)-unique
per batch dir by construction, and the final ``pairs.distinct()``
already absorbs replay overlap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import band_signatures, minhash_signatures, shingle_rows
from ..sinks.batch import IdempotentBatchWriter, has_parquet
from .sources import file_stream

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

_BAND_SCHEMA = "doc_id long, band_idx int, band_hash string"


def dedup_candidates_batch(
    spark: SparkSession,
    index_dir: str,
    sink: IdempotentBatchWriter,
    num_hashes: int = 8,
    band_size: int = 2,
):
    """Per-batch body (exposed so tests can replay a (batch_df, batch_id)
    directly): shingle → minhash → band the NEW docs, join against the
    persisted band index ∪ this batch, emit (id_a, id_b) candidates,
    then append the new bands as the index's ``batch_id=N`` directory."""
    index_writer = IdempotentBatchWriter(index_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        new = batch_df.dropDuplicates(["doc_id"])
        banded_new = band_signatures(
            minhash_signatures(
                shingle_rows(new, "doc_id", "text"), "doc_id", num_hashes
            ),
            "doc_id",
            num_hashes,
            band_size,
        ).persist()
        if has_parquet(index_dir):
            seen = index_writer.read(spark).drop("batch_id")
        else:
            seen = spark.createDataFrame([], _BAND_SCHEMA)
        # A replayed batch finds its own bands already indexed; the extra
        # copies only produce duplicate pairs, which the distinct below
        # absorbs — no O(corpus) universe.distinct() needed.
        universe = seen.unionByName(banded_new)
        a, b = banded_new.alias("a"), universe.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") != F.col("b.doc_id")),
            )
            .select(
                F.least("a.doc_id", "b.doc_id").alias("id_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("id_b"),
            )
            .distinct()
        )
        sink(pairs, batch_id)
        index_writer(banded_new, batch_id)
        banded_new.unpersist()

    return process


def dedup_index_pipeline(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    out_dir: str,
    checkpoint: str,
    num_hashes: int = 8,
    band_size: int = 2,
):
    """Document stream → incremental LSH candidate pairs + band index."""
    docs = file_stream(spark, src_dir, DOC_SCHEMA)
    sink = IdempotentBatchWriter(out_dir)
    return (
        docs.writeStream.foreachBatch(
            dedup_candidates_batch(spark, index_dir, sink, num_hashes, band_size)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
