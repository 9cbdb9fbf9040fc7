"""Streaming windowed aggregation + late-data handling + stream dedup.

The reference's late/changed-data story is W2: re-index when
mtime > scanDate − 2s (FsParser.java:377-379). The Structured-Streaming
native form is an event-time watermark: late turns inside the watermark
update their window; turns later than the watermark are dropped by the
engine (and at 10^12 scale you WANT the bound — unbounded state is the
failure mode).

Also here: exactly-once stream dedup by doc id within the watermark
(the at-least-once + idempotent-upsert analog of W4,
FsParser.java:868-887) via dropDuplicatesWithinWatermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_turn_counts(
    stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "2 seconds",
) -> DataFrame:
    """Per-(window, role) turn counts with a late-data watermark.

    The 2s default watermark mirrors the reference's scan-date slack
    (issue #82). Output mode append emits a window only once it is final.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("role"))
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            # octet_length: BYTES, the repo-wide convention (size gate F3)
            # — F.length counts characters and undercounts CJK ~3x
            F.sum(F.octet_length("text")).alias("bytes_in"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "role",
            "turn_count",
            "bytes_in",
        )
    )


def dedup_stream(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Drop duplicate (conv_id, turn_idx) deliveries within the watermark —
    turns re-delivered by an at-least-once upstream are emitted once."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )
