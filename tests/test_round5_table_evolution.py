"""Round 5 snapshot-table round-out: rollback commits, additive schema
evolution, the optimistic append-retry loop, and the streaming
foreachBatch sink that commits one atomic snapshot per epoch
(streaming/micro_batch.run_streaming_extraction_to_table)."""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil

import pytest

from fscrawler_spark.plans.snapshot_table import (
    CommitConflictError,
    SnapshotTable,
)
from fscrawler_spark.sources.transcripts import TRANSCRIPT_SCHEMA


def _df(spark, rows):
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def _rows(conv, lo, hi):
    return [
        (
            conv,
            i,
            "user" if i % 2 == 0 else "assistant",
            f"text {conv} {i}",
            None,
            dt.datetime(2026, 1, 1) + dt.timedelta(minutes=i),
        )
        for i in range(lo, hi)
    ]


def _texts(df):
    return sorted((r.conv_id, r.turn_idx) for r in df.collect())


# --- rollback ----------------------------------------------------------


def test_rollback_restores_contents_as_new_snapshot(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark, _df(spark, _rows("a", 0, 5)))  # v1
    t.append(spark, _df(spark, _rows("b", 0, 3)))  # v2
    t.overwrite(spark, _df(spark, _rows("oops", 0, 1)))  # v3: the bad commit
    sid = t.rollback(spark, 2)
    assert sid == 4 and t.current_id() == 4
    assert _texts(t.read(spark)) == _texts(t.read(spark, snapshot_id=2))
    m = t.manifest(4)
    assert m["operation"] == "rollback" and m["rolled_back_to"] == 2
    # the bad snapshot stays readable for forensics
    assert _texts(t.read(spark, snapshot_id=3)) == [("oops", 0)]
    # a manifest-diff across the rollback sees exactly the file swap
    d = t.diff(3, 4)
    assert len(d["removed"]) >= 1 and len(d["added"]) >= 1


def test_rollback_to_current_is_noop_and_unknown_raises(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark, _df(spark, _rows("a", 0, 2)))
    assert t.rollback(spark, 1) == 1
    assert t.current_id() == 1
    with pytest.raises(FileNotFoundError):
        t.rollback(spark, 99)


# --- additive schema evolution ------------------------------------------


def test_append_with_new_column_evolves_schema(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark, _df(spark, _rows("a", 0, 4)))  # v1: base schema
    wide = _df(spark, _rows("b", 0, 3)).withColumn(
        "quality", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(0.5)
    )
    t.append(spark, wide)  # v2: +quality
    got = t.read(spark)
    assert "quality" in got.columns
    rows = {(r.conv_id, r.turn_idx): r.quality for r in got.collect()}
    assert rows[("b", 0)] == 0.5
    assert rows[("a", 0)] is None  # old files read NULL in the new column
    # time travel keeps the OLD schema
    assert "quality" not in t.read(spark, snapshot_id=1).columns


def test_append_type_change_is_refused(spark, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark, _df(spark, _rows("a", 0, 2)))
    bad = _df(spark, _rows("b", 0, 2)).withColumn(
        "turn_idx", F.col("turn_idx").cast("string")
    )
    with pytest.raises(ValueError, match="type"):
        t.append(spark, bad)
    assert t.current_id() == 1  # nothing committed


def test_append_may_omit_nullable_but_not_required_columns(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark, _df(spark, _rows("a", 0, 2)))
    narrow = _df(spark, _rows("b", 0, 2)).drop("tool")  # tool is nullable
    t.append(spark, narrow)
    got = {(r.conv_id, r.turn_idx): r.tool for r in t.read(spark).collect()}
    assert got[("b", 1)] is None
    # a non-nullable table column cannot be omitted
    import pyspark.sql.types as T

    req = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ])
    t2 = SnapshotTable(str(tmp_path / "t2"))
    t2.append(spark, spark.createDataFrame([("x", 1)], req))
    with pytest.raises(ValueError, match="non-nullable"):
        t2.append(spark, spark.createDataFrame([(2,)], "v long"))


def test_replace_evolves_schema_too(spark, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark, _df(spark, _rows("a", 0, 2)))
    victims = [e.path for e in t.files()]
    add = _df(spark, _rows("c", 0, 1)).withColumn("tag", F.lit("new"))
    t.replace(spark, victims, add)
    got = t.read(spark)
    assert "tag" in got.columns
    assert {r.tag for r in got.collect()} == {"new"}


# --- optimistic append retry ---------------------------------------------


def test_append_retries_past_a_conflicting_commit(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark, _df(spark, _rows("a", 0, 3)))  # v1
    # simulate a racing writer: pre-publish v2 out from under this handle
    # (a valid manifest — a copy of v1 under the next version name)
    m = dict(t.manifest(1))
    m["snapshot_id"], m["parent_id"] = 2, 1
    with open(os.path.join(str(tmp_path / "t"), "_snap", "v00000002.json"), "w") as f:
        json.dump(m, f)
    sid = t.append(spark, _df(spark, _rows("b", 0, 2)))
    assert sid == 3  # rebased onto the interloper, not clobbered
    assert _texts(t.read(spark)) == _texts(t.read(spark, snapshot_id=1)) + [
        ("b", 0), ("b", 1)
    ]


# --- streaming sink → snapshot commits -----------------------------------


def _write_input(spark, path, rows):
    _df(spark, rows).coalesce(1).write.mode("append").parquet(path)


def test_streaming_to_table_commits_snapshots(spark, tmp_path):
    from fscrawler_spark.streaming.micro_batch import (
        run_streaming_extraction_to_table,
    )

    inp = str(tmp_path / "in")
    root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    _write_input(spark, inp, _rows("c1", 0, 6))
    run_streaming_extraction_to_table(spark, inp, root, ckpt)

    t = SnapshotTable(root)
    assert t.exists()
    first = t.current_id()
    got = t.read(spark)
    assert got.count() == 6
    # extraction actually ran (docs schema, not raw transcripts)
    assert "extracted" in got.columns and "part_bucket" in got.columns
    m = t.manifest(first)
    assert m["operation"] == "append" and m["epoch_id"] is not None
    assert m["stream_id"]

    # second drain with NEW files appends another snapshot; old rows kept
    _write_input(spark, inp, _rows("c2", 0, 4))
    run_streaming_extraction_to_table(spark, inp, root, ckpt)
    assert t.current_id() > first
    assert t.read(spark).count() == 10
    # a drain with NOTHING new commits nothing
    cur = t.current_id()
    run_streaming_extraction_to_table(spark, inp, root, ckpt)
    assert t.current_id() == cur


def test_streaming_to_table_replayed_epoch_is_skipped(spark, tmp_path):
    """Crash-replay twin: wipe the STREAM checkpoint (so Spark replays
    epoch 0 over the same input) while keeping the table — the
    (stream_id, epoch_id) guard must skip the duplicate append."""
    from fscrawler_spark.streaming.micro_batch import (
        run_streaming_extraction_to_table,
    )

    inp = str(tmp_path / "in")
    root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    _write_input(spark, inp, _rows("c1", 0, 5))
    run_streaming_extraction_to_table(spark, inp, root, ckpt)
    t = SnapshotTable(root)
    assert t.read(spark).count() == 5

    shutil.rmtree(ckpt)  # lose the acknowledgment, keep the table
    run_streaming_extraction_to_table(spark, inp, root, ckpt)
    assert t.read(spark).count() == 5  # no double-append
    assert [h["operation"] for h in t.history()].count("append") == 1


def test_streaming_to_table_rows_match_batch_extraction(spark, tmp_path):
    """Per-turn parity with the batch plan over the same input."""
    from fscrawler_spark.config import ExtractSettings
    from fscrawler_spark.operators.extract import extract_transcripts
    from fscrawler_spark.sources.transcripts import read_transcripts
    from fscrawler_spark.streaming.micro_batch import (
        run_streaming_extraction_to_table,
    )

    inp = str(tmp_path / "in")
    _write_input(spark, inp, _rows("c1", 0, 8))
    run_streaming_extraction_to_table(
        spark, inp, str(tmp_path / "t"), str(tmp_path / "ck")
    )
    stream_rows = sorted(
        (r.conv_id, r.turn_idx, r.extracted)
        for r in SnapshotTable(str(tmp_path / "t")).read(spark).collect()
    )
    batch = extract_transcripts(read_transcripts(spark, inp), ExtractSettings())
    batch_rows = sorted(
        (r.conv_id, r.turn_idx, r.extracted) for r in batch.collect()
    )
    assert stream_rows == batch_rows


def test_cli_table_rollback(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark, _df(spark, _rows("a", 0, 4)).coalesce(1))
    t.overwrite(spark, _df(spark, _rows("bad", 0, 1)).coalesce(1))

    assert main(["--output", t.root, "--table-rollback", "1"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out == {"root": t.root, "rolled_back_to": 1, "new_snapshot": 3}
    assert _texts(t.read(spark)) == _texts(t.read(spark, snapshot_id=1))

    # contract: bad args exit 2 with a message, never a traceback
    assert main(["--output", t.root, "--table-rollback", "42"]) == 2
    assert main(["--output", str(tmp_path / "nope"), "--table-rollback", "1"]) == 2
