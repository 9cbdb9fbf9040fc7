"""End-to-end extraction job: read -> filter -> extract -> partitioned
write + per-partition lineage/metrics + checkpoint-resume.

Lifecycle analog of the reference's FsParser.run() crawl loop
(/root/reference/core/.../FsParser.java:310-557), re-expressed as one
declarative DataFrame plan per run:

* the BFS directory queue        -> Spark task scheduling over buckets
* bulk processor batching (S7)   -> per-task parquet writes
* retry/backoff (S8, W3)         -> spark.task.maxFailures + driver
                                    re-drive of pending buckets
* ScanStatistic (A1/A2/A4)       -> metrics table aggregated per bucket
* _checkpoint.json (W3/W4)       -> CheckpointManifest of completed buckets

Scale notes (100 TB): the only Python boundary is the extraction UDF; no
shuffle exists between scan and sink — the plan is scan -> filter ->
project(UDF) -> write, i.e. embarrassingly parallel. Metrics are computed
by reading BACK the written output with column pruning (cheap columns
only), never by caching the full extraction result.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fscrawler_spark.config import ExtractSettings
from fscrawler_spark.operators.extract import extract_transcripts
from fscrawler_spark.plans.checkpoint import CheckpointManifest

LINEAGE_COLS = [
    "run_id",
    "part_bucket",
    "conv_count",
    "turn_count",
    "bytes_in",
    "bytes_out",
    "parse_failures",
    "span_count",
]


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def bucket_metrics(out_df: DataFrame, run_id: str, buckets: list[int] | None = None) -> DataFrame:
    """Per-partition lineage/metrics rows (north_star requirement;
    ScanStatistic analog, beans/ScanStatistic.java:33-38).

    ``buckets``: when given, emits an explicit zero row for any bucket
    with no output rows — a completed-but-empty bucket still gets its
    lineage row (otherwise it would look permanently unmetered and
    resume runs would re-attempt the backfill forever).
    """
    agg = out_df.groupBy("part_bucket").agg(
        F.approx_count_distinct("conv_id").alias("conv_count"),
        F.count(F.lit(1)).alias("turn_count"),
        F.sum(F.col("file.filesize")).alias("bytes_in"),
        F.sum(F.coalesce(F.length("extracted"), F.lit(0))).alias("bytes_out"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("parse_failures"),
        F.sum(F.size("spans")).alias("span_count"),
    )
    if buckets is not None:
        spark = out_df.sparkSession
        base = spark.createDataFrame([(int(b),) for b in buckets], "part_bucket int")
        agg = base.join(agg, "part_bucket", "left").fillna(
            0, ["conv_count", "turn_count", "bytes_in", "bytes_out", "parse_failures", "span_count"]
        )
    return agg.withColumn("run_id", F.lit(run_id)).select(LINEAGE_COLS)


def run_extraction_job(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    settings: ExtractSettings | None = None,
    resume: bool = True,
    fail_after_buckets: int | None = None,
) -> dict:
    """One crawl "run": extract all pending buckets, write output
    partitioned by part_bucket, append lineage metrics, maintain the
    checkpoint manifest.

    fail_after_buckets: test hook — abort after K bucket-groups to
    exercise resume (the reference's kill-and-restart IT scenario).
    """
    settings = settings or ExtractSettings()
    out_data = os.path.join(output_dir, "docs")
    out_metrics = os.path.join(output_dir, "metrics")
    ckpt_path = os.path.join(output_dir, "_checkpoint.json")

    manifest = CheckpointManifest.load_or_create(ckpt_path) if resume else CheckpointManifest(ckpt_path)
    pending = manifest.pending(settings.num_buckets)
    run_id = f"run-{uuid.uuid4().hex[:12]}"
    if not pending:
        # still backfill lineage rows for any completed bucket whose
        # metrics write was lost to a crash
        if os.path.isdir(out_data):
            metered: set[int] = set()
            if os.path.isdir(out_metrics):
                metered = {
                    r["part_bucket"]
                    for r in spark.read.parquet(out_metrics).select("part_bucket").distinct().collect()
                }
            missing = sorted(manifest.completed - metered)
            if missing:
                out_df = spark.read.parquet(out_data).filter(F.col("part_bucket").isin(missing))
                bucket_metrics(out_df, run_id, buckets=missing).write.mode("append").parquet(out_metrics)
        manifest.finish()
        return {"run_id": run_id, "written_buckets": [], "skipped_buckets": sorted(manifest.completed)}

    src = read_transcripts(spark, input_path)
    docs = extract_transcripts(src, settings)

    # Group pending buckets into write waves so a mid-job failure leaves
    # completed waves durable (checkpoint cadence analog of "every 100
    # files", FsParser.java:105). One wave == one Spark job; granularity
    # is settings.checkpoint_waves.
    wave_size = max(1, settings.num_buckets // max(1, settings.checkpoint_waves))
    waves = [pending[i : i + wave_size] for i in range(0, len(pending), wave_size)]

    written: list[int] = []
    for wi, wave in enumerate(waves):
        if fail_after_buckets is not None and len(written) >= fail_after_buckets:
            raise RuntimeError("injected failure for resume test")
        wave_df = docs.filter(F.col("part_bucket").isin(wave))
        # stable turn ordering inside each output partition (north_rule O1)
        (
            wave_df.repartition(len(wave), "part_bucket")
            .sortWithinPartitions("conv_id", "turn_idx")
            .write.mode("overwrite")
            .partitionBy("part_bucket")
            .parquet(out_data)
        )
        manifest.mark_completed(wave)
        written.extend(wave)

    # lineage/metrics: read back only the cheap columns (column pruning).
    # Targets = buckets written THIS run plus any completed bucket whose
    # metrics never landed (a prior run that died between its bucket
    # write and its metrics write) — keeps the every-bucket-has-a-
    # lineage-row invariant across crash/resume.
    already_metered: set[int] = set()
    if os.path.isdir(out_metrics):
        already_metered = {
            r["part_bucket"]
            for r in spark.read.parquet(out_metrics).select("part_bucket").distinct().collect()
        }
    targets = sorted(set(written) | (manifest.completed - already_metered))
    out_df = spark.read.parquet(out_data).filter(F.col("part_bucket").isin(targets))
    metrics = bucket_metrics(out_df, run_id, buckets=targets)
    metrics.write.mode("append").parquet(out_metrics)

    manifest.finish()
    return {
        "run_id": run_id,
        "written_buckets": written,
        "skipped_buckets": sorted(set(manifest.completed) - set(written)),
        "output": out_data,
        "metrics": out_metrics,
    }
