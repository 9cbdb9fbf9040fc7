"""J2 sink side: apply the deletion set to the output table (+ F4
subtree pruning).

Reference: deletion detection reads back indexed filenames, diffs against
the live listing, and issues ES deletes (FsParser.java:1010-1057); the
.fscrawlerignore marker prunes whole subtrees (FsParser.java:99,896-906).

Spark shape: with an Iceberg catalog this is `MERGE/DELETE WHERE key IN
(delete_set)`; on plain partitioned parquet we rewrite ONLY the buckets
that contain deleted keys — partition-scoped rewrite, the same I/O shape
Iceberg's copy-on-write DELETE performs. Crucially the rewrite goes to a
STAGING directory first and is swapped in per bucket afterwards: a lazy
plan that reads a path while dynamically overwriting the same path can
see partially-replaced partitions under task retry — the staged swap
never reads and writes the same files in one job, and a crash mid-swap
leaves a state from which re-running the same delete is a no-op
(idempotent).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def apply_deletes(spark: SparkSession, output_docs: str, delete_keys: DataFrame) -> int:
    """Remove (conv_id, turn_idx) keys from the docs table by rewriting
    only affected part_bucket partitions. Returns #rows deleted."""
    docs = spark.read.parquet(output_docs)
    keys = delete_keys.select("conv_id", "turn_idx")
    # ONE job yields both the affected buckets and the deleted count
    # (previously: three jobs — affected collect + before.count + kept.count)
    hits = (
        docs.join(keys, ["conv_id", "turn_idx"])
        .groupBy("part_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not hits:
        return 0
    affected = [r["part_bucket"] for r in hits]
    deleted = sum(r["n"] for r in hits)

    kept = (
        docs.filter(F.col("part_bucket").isin(affected))
        .join(keys, ["conv_id", "turn_idx"], "left_anti")
    )
    # stage the surviving rows OUTSIDE the live table (fresh directory, so
    # no partitionOverwriteMode dependency), preserving the stable
    # within-partition turn ordering invariant (north_rule O1)
    staging = output_docs.rstrip("/") + f"__delete_stage_{uuid.uuid4().hex[:8]}"
    (
        kept.repartition(max(1, len(affected)), "part_bucket")
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.mode("overwrite")
        .partitionBy("part_bucket")
        .parquet(staging)
    )

    # swap per bucket via the Hadoop FileSystem API (scheme-agnostic:
    # file:/, s3a://, hdfs:// all work; os-level moves would no-op on URIs).
    # A bucket whose rows were ALL deleted has no staged dir — dynamic
    # partition overwrite could never empty it (a partition absent from
    # the written data survives on disk), so the live dir is dropped
    # explicitly. Iceberg DELETE does the same via snapshot metadata.
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    fs = HPath(output_docs).getFileSystem(hconf)
    for b in affected:
        live = HPath(f"{output_docs}/part_bucket={b}")
        staged = HPath(f"{staging}/part_bucket={b}")
        if fs.exists(live):
            fs.delete(live, True)
        if fs.exists(staged):
            fs.rename(staged, live)
    fs.delete(HPath(staging), True)
    return deleted


def prune_ignored(turns: DataFrame, ignored_convs: DataFrame) -> DataFrame:
    """F4 — .fscrawlerignore analog: drop every turn of marked
    conversations via a broadcast anti-join (marker table is tiny)."""
    return turns.join(
        F.broadcast(ignored_convs.select("conv_id")), "conv_id", "left_anti"
    )
