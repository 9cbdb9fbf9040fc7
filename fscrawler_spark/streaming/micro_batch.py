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

from fscrawler_spark.config import ExtractSettings
from fscrawler_spark.operators.extract import extract_transcripts

# ONE source of truth for the record contract: the batch reader's schema
# (a hand-maintained copy here had already drifted on nullability)
from fscrawler_spark.sources.transcripts import TRANSCRIPT_SCHEMA, validate_schema


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
    # same cast/projection preflight as the batch path (pure projection,
    # streaming-safe) so batch and streaming outputs share one schema
    docs = extract_transcripts(validate_schema(stream), settings)
    q = (
        docs.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        # same docs/part_bucket=N/ layout as the batch sink
        # (pipeline.write_docs): the bucket-scoped machinery (staged
        # bucket swaps, dynamic partition overwrite, lineage backfill)
        # assumes partition directories, not a plain column
        .partitionBy("part_bucket")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
