"""Structured-Streaming form of the extraction job.

The reference is a micro-batch poller: rescan every ``update_rate``
(default 15m), wake early on checkpoint nextCheck (FsParser.java:488-556).
The Spark-native equivalent is a file-source readStream with
Trigger.AvailableNow — each trigger drains whatever new transcript files
landed, runs the identical extraction plan, and commits exactly-once via
the streaming checkpoint. Late/changed data (W2) is handled upstream by
the watermark predicate in operators.incremental.changed_since.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from fscrawler_spark.config import ExtractSettings
from fscrawler_spark.operators.extract import extract_transcripts

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def run_streaming_extraction(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    settings: ExtractSettings | None = None,
    await_termination: bool = True,
):
    """One AvailableNow drain: new parquet files -> extraction -> append.

    Exactly-once across restarts comes from the streaming checkpoint
    (source offsets + file sink log) — the streaming twin of the batch
    CheckpointManifest.
    """
    settings = settings or ExtractSettings()
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    docs = extract_transcripts(stream, settings)
    q = (
        docs.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
