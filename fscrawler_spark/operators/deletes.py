"""J2 sink side: apply the deletion set to the output table (+ F4
subtree pruning).

Reference: deletion detection reads back indexed filenames, diffs against
the live listing, and issues ES deletes (FsParser.java:1010-1057); the
.fscrawlerignore marker prunes whole subtrees (FsParser.java:99,896-906).

Spark shape: with an Iceberg catalog this is `MERGE/DELETE WHERE key IN
(delete_set)`; on plain partitioned parquet we rewrite ONLY the buckets
that contain deleted keys (anti-join) — partition-scoped rewrite, the
same I/O shape Iceberg's copy-on-write DELETE performs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def apply_deletes(spark: SparkSession, output_docs: str, delete_keys: DataFrame) -> int:
    """Remove (conv_id, turn_idx) keys from the docs table by rewriting
    only affected part_bucket partitions. Returns #rows deleted."""
    docs = spark.read.parquet(output_docs)
    keys = delete_keys.select("conv_id", "turn_idx")
    affected = [
        r["part_bucket"]
        for r in docs.join(keys, ["conv_id", "turn_idx"]).select("part_bucket").distinct().collect()
    ]
    if not affected:
        return 0
    before = docs.filter(F.col("part_bucket").isin(affected))
    kept = before.join(keys, ["conv_id", "turn_idx"], "left_anti")
    deleted = before.count() - kept.count()
    # dynamic partition overwrite rewrites only partitions PRESENT in the
    # written data — a bucket whose rows were all deleted would silently
    # survive on disk. Track which affected buckets still have rows and
    # remove the emptied ones explicitly (Iceberg DELETE does this via
    # snapshot metadata; on plain parquet it is a directory drop).
    surviving = {r["part_bucket"] for r in kept.select("part_bucket").distinct().collect()}
    if surviving:
        (
            kept.repartition(max(1, len(surviving)), "part_bucket")
            .sortWithinPartitions("conv_id", "turn_idx")
            .write.mode("overwrite")
            .partitionBy("part_bucket")
            .parquet(output_docs)
        )
    # scheme-agnostic delete (file:/, s3a://, hdfs:// all work) via the
    # Hadoop FileSystem API — os-level rmtree would silently no-op on URIs
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for b in set(affected) - surviving:
        hpath = jvm.org.apache.hadoop.fs.Path(f"{output_docs}/part_bucket={b}")
        fs = hpath.getFileSystem(hconf)
        if fs.exists(hpath):
            fs.delete(hpath, True)
    return deleted


def prune_ignored(turns: DataFrame, ignored_convs: DataFrame) -> DataFrame:
    """F4 — .fscrawlerignore analog: drop every turn of marked
    conversations via a broadcast anti-join (marker table is tiny)."""
    return turns.join(
        F.broadcast(ignored_convs.select("conv_id")), "conv_id", "left_anti"
    )
