"""applyInPandasWithState: state persists across micro-batch triggers and
across query restarts (streaming checkpoint)."""

import os

from pyspark.sql import functions as F

from fscrawler_spark.streaming.micro_batch import TRANSCRIPT_SCHEMA
from fscrawler_spark.streaming.stateful import conversation_stats_stream


def _write_batch(spark, dir_, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("append").parquet(dir_)


def _drain(spark, src_dir, ckpt, out_dir):
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src_dir)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        conversation_stats_stream(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {r["conv_id"]: r for r in spark.read.parquet(out_dir).collect()}


def test_stateful_conv_stats_across_restarts(spark, tmp_path):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(
        spark,
        src,
        [
            ("a", 0, "user", "aaaa", None, "2024-01-01 00:00:00"),
            ("a", 1, "assistant", "bb", None, "2024-01-01 00:00:01"),
            ("b", 0, "user", "cccccc", None, "2024-01-01 00:00:02"),
        ],
    )
    got = _drain(spark, src, ckpt, str(tmp_path / "out1"))
    assert got["a"]["turns_seen"] == 2 and got["a"]["bytes_in"] == 6 and got["a"]["max_turn_idx"] == 1
    assert got["b"]["turns_seen"] == 1 and got["b"]["bytes_in"] == 6

    # restart with new files: state must RESUME from the checkpoint
    _write_batch(spark, src, [("a", 2, "user", "ddd", None, "2024-01-01 00:00:03")])
    got2 = _drain(spark, src, ckpt, str(tmp_path / "out2"))
    assert got2["a"]["turns_seen"] == 3  # 2 carried + 1 new
    assert got2["a"]["bytes_in"] == 9
    assert got2["a"]["max_turn_idx"] == 2
    assert "b" not in got2  # untouched conv not re-emitted in update mode
