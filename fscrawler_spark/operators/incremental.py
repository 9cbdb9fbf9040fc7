"""Incremental-scan semantics: change detection, deletion detection,
tag merge (SURVEY §2.3 J1/J2/J3).

All three are join-shaped and declarative so Catalyst picks the physical
strategy; the small sides (tag tables, watermarks) broadcast, the big
anti-joins sort-merge with AQE skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def changed_since(df: DataFrame, last_run_ts, slack_seconds: int = 2) -> DataFrame:
    """J1 — watermark change detection (FsParser.java:1200-1215).

    Keep turns with ts newer than the previous run's scan date, minus a
    2s boundary slack (the reference rounds scanDate down 2s to avoid
    boundary loss, issue #82 / FsParser.java:377-379). A pure partition-/
    predicate-pushdown filter: on a ts-partitioned table this prunes whole
    partitions before any I/O.
    """
    return df.filter(
        F.col("ts") > (F.lit(last_run_ts).cast("timestamp") - F.expr(f"INTERVAL {slack_seconds} SECONDS"))
    )


def changed_vs_snapshot(df: DataFrame, prev: DataFrame, checksum_algo: str = "sha256") -> DataFrame:
    """J1 (content variant) — re-extract only turns that are new or whose
    payload checksum changed vs the previous run's output (the ACL-hash /
    mtime comparison analog, FsParser.java:1147-1215).

    left_anti on (identity, checksum): unchanged turns drop out. At scale
    both sides are bucketed by conv_id so this is a co-located join.
    ``checksum_algo`` MUST match the settings.checksum_algo the snapshot
    was written with, else every turn looks changed.
    """
    if checksum_algo not in ("sha256", "md5"):
        raise ValueError(f"checksum_algo must be 'sha256' or 'md5', got {checksum_algo!r}")
    ck = F.sha2(F.col("text"), 256) if checksum_algo == "sha256" else F.md5(F.col("text"))
    cur = df.withColumn("_ck", ck)
    prev_keys = prev.select(
        "conv_id", "turn_idx", F.col("file.checksum").alias("_ck")
    )
    return (
        cur.join(prev_keys, ["conv_id", "turn_idx", "_ck"], "left_anti").drop("_ck")
    )


def deleted_keys(prev: DataFrame, current: DataFrame) -> DataFrame:
    """J2 — deletion detection (FsParser.java:1010-1057): keys present in
    the previous output but absent from the current input form the delete
    set (Iceberg MERGE/DELETE target)."""
    return prev.select("conv_id", "turn_idx").join(
        current.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"], "left_anti"
    )


def merge_tags(docs: DataFrame, conv_tags: DataFrame) -> DataFrame:
    """J3 — per-conversation metadata merge (DocUtils.java:54-148 deep
    merge; doc wins on conflict).

    conv_tags: (conv_id, tags:map<string,string>). Broadcast hash join —
    tag tables are tiny relative to the turns table. If the doc already
    carries a ``tags`` map, doc entries win (map_concat order + coalesce).
    """
    conv_side = conv_tags.select("conv_id", F.col("tags").alias("_conv_tags"))
    tagged = docs.join(F.broadcast(conv_side), "conv_id", "left")
    if "tags" in docs.columns:
        # deep-merge maps, doc value winning per key (DocUtils.java:125-148)
        doc_m = F.coalesce(F.col("tags"), F.expr("map()"))
        conv_m = F.coalesce(F.col("_conv_tags"), F.expr("map()"))
        merged = F.map_from_arrays(
            F.array_union(F.map_keys(conv_m), F.map_keys(doc_m)),
            F.transform(
                F.array_union(F.map_keys(conv_m), F.map_keys(doc_m)),
                lambda k: F.coalesce(F.element_at(doc_m, k), F.element_at(conv_m, k)),
            ),
        )
        return tagged.withColumn("tags", merged).drop("_conv_tags")
    return tagged.withColumnRenamed("_conv_tags", "tags").withColumn(
        "tags", F.coalesce(F.col("tags"), F.expr("map()"))
    )
