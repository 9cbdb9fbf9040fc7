"""Round 4: streaming-sink → batch-table compaction (the migration path
the stage_and_swap_buckets guard points at). After compaction, every
batch operator — tick, deletes, resume bookkeeping — must work on the
result, and uncommitted orphan files in the sink dir must NOT survive
into the table."""

import os

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.config import ExtractSettings
from fscrawler_spark.plans.pipeline import job_status, run_incremental_update
from fscrawler_spark.streaming.micro_batch import (
    compact_streaming_output,
    run_streaming_extraction,
)

SETTINGS = ExtractSettings(num_buckets=8, skew_salt=4)


@pytest.fixture
def streamed(spark, transcripts_dir, tmp_path):
    stream_in = tmp_path / "in"
    stream_in.mkdir()
    os.symlink(
        os.path.join(transcripts_dir, "transcripts.parquet"),
        stream_in / "transcripts.parquet",
    )
    out = str(tmp_path / "sink")
    run_streaming_extraction(
        spark, str(stream_in), out, str(tmp_path / "ckpt"), SETTINGS
    )
    return os.path.join(transcripts_dir, "transcripts.parquet"), out


def test_compaction_produces_working_batch_table(spark, streamed, tmp_path):
    inp, sink = streamed
    out = str(tmp_path / "batch")
    res = compact_streaming_output(spark, sink, out, SETTINGS)
    src_n = spark.read.parquet(inp).count()
    assert res["rows"] == src_n and res["buckets"] == SETTINGS.num_buckets

    docs = spark.read.parquet(os.path.join(out, "docs"))
    assert docs.count() == src_n
    # O1: rows inside each file are (conv_id, turn_idx)-sorted — the
    # guarantee streaming could not give
    files = docs.select(F.input_file_name().alias("f"), "conv_id", "turn_idx").collect()
    by_file = {}
    for r in files:
        by_file.setdefault(r["f"], []).append((r["conv_id"], r["turn_idx"]))
    assert by_file and all(rows == sorted(rows) for rows in by_file.values())
    # manifest is COMPLETED and fingerprint-stamped: batch lifecycle works
    assert job_status(out)["state"] == "COMPLETED"
    # metrics reconcile with the table
    m = spark.read.parquet(os.path.join(out, "metrics"))
    assert m.agg(F.sum("turn_count")).first()[0] == src_n

    # the steady-state tick runs on the compacted table
    r = run_incremental_update(spark, inp, out, SETTINGS)
    assert r["changed"] == 0 and r["deleted"] == 0
    v2 = spark.read.parquet(inp).withColumn(
        "text",
        F.when(F.col("turn_idx") % 13 == 1, F.concat(F.col("text"), F.lit(" x"))).otherwise(
            F.col("text")
        ),
    )
    v2p = str(tmp_path / "v2.parquet")
    v2.write.parquet(v2p)
    r2 = run_incremental_update(spark, v2p, out, SETTINGS)
    assert r2["changed"] > 0


def test_compaction_excludes_uncommitted_orphans(spark, streamed, tmp_path):
    """A crashed trigger's leftover files live in the sink dir but not in
    its log; the log-driven read must drop them."""
    inp, sink = streamed
    src_n = spark.read.parquet(inp).count()
    # plant an orphan inside an existing partition dir
    part_dirs = [d for d in os.listdir(sink) if d.startswith("part_bucket=")]
    victim = os.path.join(sink, part_dirs[0])
    real = [f for f in os.listdir(victim) if f.endswith(".parquet")][0]
    import shutil

    shutil.copy(os.path.join(victim, real), os.path.join(victim, "orphan-" + real))
    out = str(tmp_path / "batch")
    res = compact_streaming_output(spark, sink, out, SETTINGS)
    assert res["rows"] == src_n  # orphan rows did NOT double-count


def test_compaction_refuses_misuse(spark, streamed, tmp_path):
    inp, sink = streamed
    # not a streaming sink
    with pytest.raises(ValueError, match="_spark_metadata absent"):
        compact_streaming_output(spark, str(tmp_path / "nothing"), str(tmp_path / "o1"), SETTINGS)
    # non-empty target
    out = str(tmp_path / "batch")
    compact_streaming_output(spark, sink, out, SETTINGS)
    with pytest.raises(ValueError, match="already holds a docs table"):
        compact_streaming_output(spark, sink, out, SETTINGS)
    # a LEFTOVER manifest alone (emptied table) is also "not fresh" —
    # stale bookkeeping must never merge under a new table
    stale = tmp_path / "stale"
    stale.mkdir()
    (stale / "_checkpoint.json").write_text("{}")
    with pytest.raises(ValueError, match="checkpoint manifest"):
        compact_streaming_output(spark, sink, str(stale), SETTINGS)
    # torn mid-restart target refused like every job entry point
    torn = tmp_path / "torn"
    torn.mkdir()
    (torn / "_restarting").write_text("torn\n")
    with pytest.raises(RuntimeError, match="_restarting"):
        compact_streaming_output(spark, sink, str(torn), SETTINGS)


def test_cli_compact_verb(spark, streamed, tmp_path, capsys):
    import json as _json

    from fscrawler_spark.cli import main

    inp, sink = streamed
    out = str(tmp_path / "cliout")
    rc = main(
        ["--compact", "--input", sink, "--output", out,
         "--num-buckets", "8", "--skew-salt", "4"],
        spark=spark,
    )
    assert rc == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == spark.read.parquet(inp).count()
    assert job_status(out)["state"] == "COMPLETED"
    # misuse -> clean exit 2, not a traceback
    assert main(
        ["--compact", "--input", str(tmp_path / "nope"), "--output", str(tmp_path / "o2"),
         "--num-buckets", "8"],
        spark=spark,
    ) == 2
    # contradictory flags refused BEFORE any work — --dry-run especially:
    # compaction writes, so silently ignoring it would break its contract
    for extra in (["--dry-run"], ["--incremental"], ["--restart"], ["--loop", "3"]):
        assert main(
            ["--compact", "--input", sink, "--output", str(tmp_path / "o3"), *extra],
            spark=spark,
        ) == 2
    capsys.readouterr()


def test_compaction_invalidates_stale_snapshot_index(spark, streamed, tmp_path):
    """Compacting into a path that once had a (now wrong) snapshot index
    must drop it — or the first bucketed tick would diff against the
    pre-compaction table."""
    from fscrawler_spark.plans import bucketed as snap

    inp, sink = streamed
    out = str(tmp_path / "reused")
    os.makedirs(out)
    snap.commit_snapshot_marker(out, SETTINGS.num_buckets, SETTINGS.fingerprint())
    compact_streaming_output(spark, sink, out, SETTINGS)
    assert not os.path.exists(os.path.join(out, snap.SNAPSHOT_MARKER))
    # bucketed tick rebuilds a fresh index and sees no delta
    r = run_incremental_update(spark, inp, out, SETTINGS, layout="bucketed")
    assert r["changed"] == 0 and r["deleted"] == 0
    spark.sql(f"DROP TABLE IF EXISTS {snap.snapshot_table_name(out)}")
