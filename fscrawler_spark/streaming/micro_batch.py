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


def _reject_unpartitioned_legacy_output(spark: SparkSession, output_dir: str) -> None:
    """A pre-partitionBy output dir has part-*.parquet files at the ROOT;
    appending part_bucket=N/ dirs next to them leaves mixed leaf depths
    and partition discovery fails with 'Conflicting directory structures'
    on the NEXT read — fail at the write with a migration hint instead."""
    from py4j.protocol import Py4JJavaError

    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(output_dir)
    try:
        fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(root):
            return
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if st.isFile() and name.startswith("part-") and name.endswith(".parquet"):
                raise ValueError(
                    f"{output_dir} holds an UNPARTITIONED (pre-round-3) "
                    "streaming output; appending partitioned data would mix "
                    "layouts. Compact it (read + write partitionBy "
                    "'part_bucket' elsewhere) or point at a fresh dir."
                )
    except Py4JJavaError:
        # unreadable store: let the sink raise its own, better error
        return


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
    _reject_unpartitioned_legacy_output(spark, output_dir)
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
        # same docs/part_bucket=N/ DIRECTORY layout as the batch sink
        # (partition-pruned reads work identically). Two deliberate
        # divergences from full batch parity: (1) this dir is OWNED by
        # the file sink's _spark_metadata log — the batch bucket-swap /
        # delete machinery refuses it (stage_and_swap_buckets guard) and
        # a compaction to a plain table is the migration path; (2) the
        # O1 within-file (conv_id, turn_idx) ordering is NOT guaranteed:
        # Spark disallows sort on streaming DataFrames, so byte-stable
        # listing output requires the batch job.
        .partitionBy("part_bucket")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
