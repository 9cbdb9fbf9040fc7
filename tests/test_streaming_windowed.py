"""Streaming windowed aggs with watermark + stream dedup, via the
in-memory sink on a rate-free availableNow file source."""

import os

from pyspark.sql import functions as F

from fscrawler_spark.streaming.micro_batch import TRANSCRIPT_SCHEMA
from fscrawler_spark.streaming.windowed import dedup_stream, windowed_turn_counts


def _write_turn_batch(spark, dir_, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("append").parquet(dir_)


def test_windowed_counts_with_watermark(spark, tmp_path):
    src_dir = str(tmp_path / "in")
    rows = [
        ("c", 0, "user", "aaaa", None, "2024-01-01 00:01:00"),
        ("c", 1, "assistant", "bb", None, "2024-01-01 00:03:00"),
        ("c", 2, "user", "cc", None, "2024-01-01 00:12:00"),
        ("d", 0, "user", "dd", None, "2024-01-01 00:04:00"),
    ]
    _write_turn_batch(spark, src_dir, rows)
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src_dir)
    agg = windowed_turn_counts(stream, window="10 minutes", watermark="2 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (str(r["window_start"]), r["role"]): (r["turn_count"], r["bytes_in"])
        for r in spark.sql("select * from win_counts").collect()
    }
    assert got[("2024-01-01 00:00:00", "user")] == (2, 6)  # c0 + d0
    assert got[("2024-01-01 00:00:00", "assistant")] == (1, 2)
    assert got[("2024-01-01 00:10:00", "user")] == (1, 2)


def test_stream_dedup_within_watermark(spark, tmp_path):
    src_dir = str(tmp_path / "in2")
    rows = [
        ("c", 0, "user", "original", None, "2024-01-01 00:01:00"),
        ("c", 0, "user", "redelivered duplicate", None, "2024-01-01 00:01:30"),
        ("c", 1, "user", "second turn", None, "2024-01-01 00:02:00"),
    ]
    _write_turn_batch(spark, src_dir, rows)
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src_dir)
    out = dedup_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    res = spark.sql("select conv_id, turn_idx from dedup_out").collect()
    assert sorted((r["conv_id"], r["turn_idx"]) for r in res) == [("c", 0), ("c", 1)]
