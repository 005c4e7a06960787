"""Date-partitioned storage: the partition-pruning path for 100 TB facts.

Completes the storage-layout trio next to bucketing (sources/bucketed.py
— pays the JOIN shuffle at ingest) and Z-order keys (zorder_keys — packs
multi-dimensional locality into one sort key): Hive-style ``dt=...``
partitioning pays the TIME-slice cost at ingest, after which

* a literal date predicate prunes at PLANNING time — the scan's
  ``PartitionFilters`` drop every non-matching directory before a single
  byte is read (``events_day_prune``), and
* a JOIN against a filtered dimension prunes at RUNTIME via dynamic
  partition pruning — Spark executes the dim side first and reuses its
  broadcast as a partition filter on the fact scan
  (``events_dpp_join``), the star-schema scan killer.

At 100 TB an events table is ~3 years × ~90 GB/day; a one-day query
reads 0.1% of the files and a five-day DPP join 0.5%, independent of
cluster size. The reference has no analog — its events live in Kafka
topics and every consumer replays the full retention window.

The one-time partitioned write follows the knn persisted-index
discipline: cached under /tmp keyed by params + data fingerprint, with a
_WRITTEN marker so a partial (crashed) write rebuilds instead of
serving. No catalog table is needed — ``spark.read.parquet`` discovers
``dt=...`` directories and exposes ``dt`` as a DATE partition column,
which is exactly what both pruning forms key on.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def require_utc_session(spark: SparkSession, what: str) -> None:
    """load_table's UTC session-timezone guard, replicated for the
    cache-HIT read paths that never call load_table (r13 advice): the
    dt directories were baked under UTC, so ``hour(ts)`` and to_date
    comparisons in a non-UTC session would silently diverge from the
    DuckDB oracle's naive values. Fail loud instead."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
        raise ValueError(
            f"{what} must run under a UTC session timezone "
            f"(spark.sql.session.timeZone={tz!r}): the dt partitions "
            "were derived under UTC, so timestamp functions over this "
            "table would shift relative to the oracle. Set "
            'spark.conf.set("spark.sql.session.timeZone", "UTC").'
        )


def partitioned_events_path(spark: SparkSession, sf_dir: str) -> str:
    """Ensure a dt-partitioned copy of the events table exists under
    /tmp for this corpus and return its root path. ``dt`` is the event
    date (UTC); everything else is carried as-is."""
    from ..plans.llm import _data_fingerprint, _params_key
    from . import load_table

    key = _params_key("dtpart", _data_fingerprint(sf_dir, "events"))
    work = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_dtpart_{os.path.basename(sf_dir.rstrip('/'))}_{key}",
    )
    marker = os.path.join(work, "_WRITTEN")
    if not os.path.exists(marker):
        # a partial write (crash mid-job) must rebuild, never serve
        shutil.rmtree(work, ignore_errors=True)
        ev = load_table(spark, sf_dir, "events")
        (
            ev.withColumn("dt", F.to_date("ts"))
            .repartition("dt")  # one shuffle at ingest -> one file per
            # day instead of |input partitions| × |days| small files
            .write.mode("overwrite")
            .partitionBy("dt")
            .parquet(work)
        )
        with open(marker, "w") as fh:
            fh.write("1")
    return work


def read_partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the dt-partitioned events copy (building it on first use).
    Filters on ``dt`` prune directories at planning time; joins on ``dt``
    against filtered dims prune at runtime (DPP)."""
    require_utc_session(spark, "read_partitioned_events")
    # The files were written by the engine as TIMESTAMP; keep the
    # read-back type session-stable even when the cache-hit path skips
    # load_table (which sets this for the raw events read).
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    return spark.read.parquet(partitioned_events_path(spark, sf_dir))


def partition_file_counts(path: str) -> dict[str, int]:
    """{partition dir name: parquet file count} for a dt-partitioned
    table — pure filesystem metadata, the signal a compaction scheduler
    keys on (at lake scale: the manifest/snapshot file listing)."""
    import glob as _glob

    out = {}
    for d in sorted(_glob.glob(os.path.join(path, "dt=*"))):
        out[os.path.basename(d)] = len(
            _glob.glob(os.path.join(d, "*.parquet"))
        )
    return out


def _compact_stage_root(path: str) -> str:
    """Sibling staging-generation dir for ``compact_partitions`` —
    OUTSIDE the table root, so partition discovery over ``path`` never
    lists a half-written generation."""
    return path.rstrip("/") + ".compacting"


def recover_compaction(path: str) -> None:
    """Roll a crashed ``compact_partitions`` forward or back (the
    recover_dir crash-matrix discipline, sinks/batch.py:81).

    * stage exists WITHOUT ``_STAGED``: the compacted rewrite never
      finished — the live table was never touched; drop the stage.
    * stage exists WITH ``_STAGED``: every staged partition is
      authoritative — finish the swap (idempotent: a partition already
      swapped in is absent from the stage, a crash between the two
      renames of one partition leaves its staged dir present and its
      live dir already moved aside, which this replays cleanly).
    """
    stage = _compact_stage_root(path)
    trash = stage + ".old"
    if os.path.exists(os.path.join(stage, "_STAGED")):
        for d in sorted(_glob_dt(stage)):
            name = os.path.basename(d)
            dst = os.path.join(path, name)
            os.makedirs(trash, exist_ok=True)
            t = os.path.join(trash, name)
            if os.path.isdir(dst):
                if os.path.isdir(t):
                    shutil.rmtree(t)
                os.rename(dst, t)
            os.rename(d, dst)
        shutil.rmtree(stage, ignore_errors=True)
    elif os.path.isdir(stage):
        shutil.rmtree(stage)
    shutil.rmtree(trash, ignore_errors=True)


def _glob_dt(root: str) -> list[str]:
    import glob as _glob

    return _glob.glob(os.path.join(root, "dt=*"))


def compact_partitions(
    spark: SparkSession, path: str, max_files: int = 1
) -> list[str]:
    """Small-file compaction for a dt-partitioned table: rewrite every
    partition holding more than ``max_files`` parquet files into one
    file, leaving healthy partitions byte-untouched. Returns the list of
    compacted partition dir names.

    The operational problem this kills at 100 TB: a streaming ingest
    with many executors writes |tasks| files per partition per batch;
    after a day a hot partition holds thousands of KB-sized files and
    every scan pays file-open + footer-read per file (NameNode/S3
    LIST pressure included). Compaction is the standard nightly job
    (Delta OPTIMIZE / Iceberg rewrite_data_files); here it is a plain
    Spark job over the open layout:

    * only FRAGMENTED partitions are read (explicit partition dirs under
      a basePath — planning-time pruned, never a full-table scan),
    * hash-partitioning by dt into |fragmented| tasks writes one file
      per partition,
    * the rewrite is STAGED to a sibling generation dir and swapped in
      with the recover_dir two-rename discipline (r13 advice: Spark's
      in-place dynamic-partition overwrite deletes each old partition
      dir before renaming the staged one in, so a crash in that window
      lost the partition's only copy and a re-run saw nothing to
      repair). Here the live table is untouched until the stage is
      complete and ``_STAGED``-marked; ``recover_compaction`` (called on
      entry) rolls a crash at any point forward or back.

    Commit-window honesty: the swap is two directory renames per
    partition — atomic-in-effect on a local FS / HDFS; on an object
    store with non-atomic "rename" a reader could glimpse a partition
    mid-swap, which is exactly why lake table formats (Delta/Iceberg)
    commit via a manifest pointer instead of directory layout. The
    staged-generation + marker structure here is the same commit shape;
    only the pointer flip differs.
    """
    recover_compaction(path)
    fragmented = [
        d for d, n in partition_file_counts(path).items() if n > max_files
    ]
    if not fragmented:
        return []
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    df = spark.read.option("basePath", path).parquet(
        *[os.path.join(path, d) for d in fragmented]
    )
    stage = _compact_stage_root(path)
    (
        # hash-partition by dt into |fragmented| tasks: a collision only
        # means one task carries two days — partitionBy still emits one
        # file per day, because each dt hashes to exactly one task
        df.repartition(len(fragmented), "dt")
        .sortWithinPartitions("dt")
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(stage)
    )
    staged = {os.path.basename(d) for d in _glob_dt(stage)}
    if staged != set(fragmented):
        # never mark a wrong-shaped stage authoritative
        shutil.rmtree(stage, ignore_errors=True)
        raise AssertionError(
            f"compaction staged {sorted(staged)} != fragmented "
            f"{sorted(fragmented)} at {path}"
        )
    with open(os.path.join(stage, "_STAGED"), "w") as fh:
        fh.write("1")
    recover_compaction(path)  # the roll-forward IS the swap
    return fragmented
