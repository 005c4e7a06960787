"""Training-corpus materialization: write curated documents as ordered,
sharded parquet a data loader can stream.

This is the landing step after ``corpus_to_shards``/``shuffle_shards``
produce their manifests: the corpus goes to disk partitioned by shard,
physically ordered inside each shard file by the manifest position, so a
loader opens shard files round-robin and reads rows in training order
with zero further sorting.

Engine shape: ``repartition(shard)`` is the ONE exchange (co-locates
each shard's rows in one task), ``sortWithinPartitions`` orders rows
inside the task with no extra shuffle, and ``partitionBy("shard")``
lands one directory per shard. Parquet row-group order preserves write
order, so read-back order == write order per file — pinned in tests.

Idempotent by construction: the write is an overwrite of the target dir
and every upstream operator is deterministic, so a retry lands
byte-identical files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    docs: DataFrame,
    manifest: DataFrame,
    id_col: str,
    out_dir: str,
) -> None:
    """Join docs (id, text, …) to a manifest carrying (id, shard,
    shard_pos) — ``shuffle_shards``' output, or ``corpus_to_shards``'
    with tok_offset standing in for position — and land one ordered
    parquet directory per shard."""
    cols = set(manifest.columns)
    if not {"shard"} <= cols:
        raise ValueError("manifest must carry a 'shard' column")
    pos = "shard_pos" if "shard_pos" in cols else "tok_offset"
    joined = docs.join(
        manifest.select(id_col, "shard", F.col(pos).alias("_pos")), id_col
    )
    # id_col is the tie-breaker: when _pos is tok_offset, a zero-token
    # doc shares its offset with the following doc (running sum adds 0),
    # and without a total order the post-shuffle placement of tied rows
    # would vary between retries — breaking the byte-identical-retry and
    # read-back-order==write-order guarantees for corpora with empty docs.
    (
        joined.repartition("shard")
        .sortWithinPartitions("shard", "_pos", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


def read_training_shard(
    spark: SparkSession, out_dir: str, shard: int
) -> DataFrame:
    """One shard's rows in training order (file order == write order for
    parquet written by a single ordered task)."""
    return spark.read.parquet(f"{out_dir}/shard={shard}")
