"""Bucketed-table support: co-located incremental joins without shuffle.

The J1/J2 incremental joins (current input vs previous snapshot) are the
only big-big joins in the system. At 100 TB you do NOT want to shuffle
both sides every run: persist both tables bucketed by conv_id
(`bucketBy` + saveAsTable); Spark then sort-merge-joins matching buckets
with ZERO Exchange on either side — the classic co-located join.

This module is the thin wrapper + the plan proof (tests assert the
joined plan has no shuffle). On Iceberg the same effect comes from
bucket partition transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 32,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> None:
    """Persist as a bucketed managed table (overwrite).

    Bucket keys must EXACTLY match the later join keys: Spark's
    co-partition check requires all cluster keys by default
    (spark.sql.requireAllClusterKeysForCoPartition), so bucketing on a
    subset would still shuffle.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_changed_keys(
    spark: SparkSession, current_table: str, prev_table: str
) -> DataFrame:
    """J1 over two equally-bucketed tables: new-or-changed keys, joined
    bucket-to-bucket with NO Exchange on either side. The checksum
    comparison rides along as a post-join filter so the join keys match
    the bucket keys exactly."""
    cur = spark.table(current_table).select(
        "conv_id", "turn_idx", F.sha2("text", 256).alias("_ck")
    )
    prev = spark.table(prev_table).select(
        "conv_id", "turn_idx", F.sha2("text", 256).alias("_ck_prev")
    )
    return (
        cur.join(prev, ["conv_id", "turn_idx"], "left")
        .filter(F.col("_ck_prev").isNull() | (F.col("_ck_prev") != F.col("_ck")))
        .select("conv_id", "turn_idx")
    )
