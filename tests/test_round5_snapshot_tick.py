"""Manifest-diff incremental tick over ``snap:`` inputs: O(changed-files)
delta — the tick reads ONLY files added/removed between two snapshots,
converges to exactly the full recompute, records/clears its diff base
correctly, and falls back to the full diff when the base is unusable."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.config import ExtractSettings
from fscrawler_spark.operators.incremental import snapshot_file_delta
from fscrawler_spark.plans.checkpoint import CheckpointManifest
from fscrawler_spark.plans.pipeline import run_extraction_job, run_incremental_update
from fscrawler_spark.plans.snapshot_table import SnapshotTable
from fscrawler_spark.sources.transcripts import TRANSCRIPT_SCHEMA

SETTINGS = ExtractSettings(num_buckets=8, skew_salt=4)


def _rows(conv, n, text="orig"):
    return [
        (
            conv,
            i,
            "user" if i % 2 == 0 else "assistant",
            f"{text} {conv} {i}",
            None,
            dt.datetime(2026, 2, 1) + dt.timedelta(minutes=i),
        )
        for i in range(n)
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def _docs_sorted(spark, out):
    return (
        spark.read.parquet(os.path.join(out, "docs"))
        .drop("spans", "meta")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )


def _manifest(out):
    return CheckpointManifest.load_or_create(os.path.join(out, "_checkpoint.json"))


def _base_id(out):
    """Recorded diff base's snapshot id (the record is {root, snapshot_id}
    since the table-identity fix — a bare id could collide across tables)."""
    rec = _manifest(out).input_snapshot
    return rec["snapshot_id"] if rec else None


def _build_table(spark, root, groups=4, convs_per_group=3, turns=10):
    """One append per group -> each group lives in its own data file(s),
    so a replace() of one group's file leaves the others untouched."""
    t = SnapshotTable(root)
    for g in range(groups):
        rows = []
        for c in range(convs_per_group):
            rows += _rows(f"g{g}-conv{c}", turns)
        t.append(spark, _df(spark, rows).coalesce(1))
    return t


def test_virgin_full_run_records_input_snapshot(spark, tmp_path):
    t = _build_table(spark, str(tmp_path / "tbl"))
    out = str(tmp_path / "out")
    res = run_extraction_job(spark, f"snap:{t.root}", out, SETTINGS)
    assert res["status"] == "completed"
    assert _base_id(out) == t.current_id()


def test_snapdiff_tick_equals_full_recompute(spark, tmp_path):
    t = _build_table(spark, str(tmp_path / "tbl"))
    out = str(tmp_path / "out")
    run_extraction_job(spark, f"snap:{t.root}", out, SETTINGS)
    base = t.current_id()
    total_files = len(t.files())

    # mutate group 1 copy-on-write: change one conv's text, DROP one conv,
    # keep one conv verbatim (moved file, unchanged rows), add a new conv
    victim_files = [
        e.path for e in t.files() if e.stats["conv_id"]["min"].startswith("g1-")
    ]
    g1_new = (
        _rows("g1-conv0", 10, text="EDITED")  # changed
        + _rows("g1-conv2", 10)  # moved, byte-identical
        + _rows("g1-convNEW", 4)  # added
    )  # g1-conv1 dropped entirely
    t.replace(spark, victim_files, _df(spark, g1_new).coalesce(1))

    res = run_incremental_update(spark, f"snap:{t.root}", out, SETTINGS)
    assert res["layout"] == "snapshot-diff"
    assert res["input_snapshot"] == t.current_id()
    # O(changed files): only group 1's old+new files were read
    assert res["input_files_read"] == len(victim_files) + 1
    assert res["input_files_read"] < total_files
    # moved-but-identical rows are NOT re-extracted
    assert res["changed"] == 10 + 4
    assert res["deleted"] == 10
    assert _base_id(out) == t.current_id()

    # ground truth: full recompute of the current snapshot from scratch
    full = str(tmp_path / "full")
    run_extraction_job(spark, f"snap:{t.root}", full, SETTINGS)
    assert _docs_sorted(spark, out) == _docs_sorted(spark, full)


def test_snapdiff_noop_when_snapshot_unchanged(spark, tmp_path):
    t = _build_table(spark, str(tmp_path / "tbl"), groups=2)
    out = str(tmp_path / "out")
    run_extraction_job(spark, f"snap:{t.root}", out, SETTINGS)
    before = _docs_sorted(spark, out)
    res = run_incremental_update(spark, f"snap:{t.root}", out, SETTINGS)
    assert res["layout"] == "snapshot-diff"
    assert res["changed"] == 0 and res["deleted"] == 0
    assert res["input_files_read"] == 0
    assert _docs_sorted(spark, out) == before


def test_tick_without_base_falls_back_then_records(spark, tmp_path):
    # full run over a PLAIN dir -> no recorded base; first snap: tick must
    # full-diff (fallback), converge, and record the base for the next one
    t = _build_table(spark, str(tmp_path / "tbl"), groups=2)
    plain = str(tmp_path / "plain.parquet")
    t.read(spark).write.parquet(plain)
    out = str(tmp_path / "out")
    run_extraction_job(spark, plain, out, SETTINGS)
    assert _manifest(out).input_snapshot is None

    res = run_incremental_update(spark, f"snap:{t.root}", out, SETTINGS)
    assert res["layout"] in ("parquet", "bucketed")  # fallback full diff
    assert res["input_snapshot"] == t.current_id()
    assert _base_id(out) == t.current_id()

    # second tick fast-paths
    res2 = run_incremental_update(spark, f"snap:{t.root}", out, SETTINGS)
    assert res2["layout"] == "snapshot-diff"


def test_non_snapshot_tick_clears_base(spark, tmp_path):
    t = _build_table(spark, str(tmp_path / "tbl"), groups=2)
    out = str(tmp_path / "out")
    run_extraction_job(spark, f"snap:{t.root}", out, SETTINGS)
    assert _base_id(out) == t.current_id()
    plain = str(tmp_path / "plain.parquet")
    t.read(spark).write.parquet(plain)
    run_incremental_update(spark, plain, out, SETTINGS)
    assert _manifest(out).input_snapshot is None


def test_non_virgin_full_run_clears_base(spark, tmp_path):
    t = _build_table(spark, str(tmp_path / "tbl"), groups=2)
    out = str(tmp_path / "out")
    run_extraction_job(spark, f"snap:{t.root}", out, SETTINGS)
    assert _base_id(out) == t.current_id()
    # resume=False over the EXISTING table: dynamic overwrite can keep
    # buckets the new data misses -> correspondence no longer provable
    run_extraction_job(spark, f"snap:{t.root}", out, SETTINGS, resume=False)
    assert _manifest(out).input_snapshot is None


def test_expired_base_falls_back(spark, tmp_path):
    t = _build_table(spark, str(tmp_path / "tbl"), groups=2)
    out = str(tmp_path / "out")
    run_extraction_job(spark, f"snap:{t.root}", out, SETTINGS)
    victim = [e.path for e in t.files() if e.stats["conv_id"]["min"].startswith("g0-")]
    t.replace(spark, victim, _df(spark, _rows("g0-conv0", 3, "NEW")).coalesce(1))
    t.expire_unreferenced(keep_snapshots=1)  # the recorded base is gone

    res = run_incremental_update(spark, f"snap:{t.root}", out, SETTINGS)
    assert res["layout"] in ("parquet", "bucketed")  # graceful fallback
    assert _base_id(out) == t.current_id()
    full = str(tmp_path / "full")
    run_extraction_job(spark, f"snap:{t.root}", full, SETTINGS)
    assert _docs_sorted(spark, out) == _docs_sorted(spark, full)


def test_dry_run_previews_without_recording(spark, tmp_path):
    t = _build_table(spark, str(tmp_path / "tbl"))
    out = str(tmp_path / "out")
    run_extraction_job(spark, f"snap:{t.root}", out, SETTINGS)
    base = t.current_id()
    victim = [e.path for e in t.files() if e.stats["conv_id"]["min"].startswith("g2-")]
    t.replace(spark, victim, _df(spark, _rows("g2-conv0", 5, "EDIT")).coalesce(1))

    preview = run_incremental_update(spark, f"snap:{t.root}", out, SETTINGS, dry_run=True)
    assert preview["dry_run"] and preview["layout"] == "snapshot-diff"
    assert _base_id(out) == base  # NOT advanced
    real = run_incremental_update(spark, f"snap:{t.root}", out, SETTINGS)
    assert (preview["changed"], preview["deleted"]) == (real["changed"], real["deleted"])
    assert sorted(preview["touched_buckets"]) == sorted(real["touched_buckets"])


def test_remove_deleted_false_skips_deletions(spark, tmp_path):
    t = _build_table(spark, str(tmp_path / "tbl"), groups=2)
    out = str(tmp_path / "out")
    keep = ExtractSettings(num_buckets=8, skew_salt=4, remove_deleted=False)
    run_extraction_job(spark, f"snap:{t.root}", out, keep)
    victim = [e.path for e in t.files() if e.stats["conv_id"]["min"].startswith("g0-")]
    t.replace(spark, victim, None)  # drop group 0 entirely
    res = run_incremental_update(spark, f"snap:{t.root}", out, keep)
    assert res["layout"] == "snapshot-diff" and res["deleted"] == 0
    got = _docs_sorted(spark, out)
    assert any(r.conv_id.startswith("g0-") for r in got)  # vanished rows stay


def test_compaction_tick_is_a_noop(spark, tmp_path):
    """Compacting the input table rewrites every small file — but moves
    rows byte-identically, so the manifest-diff tick must classify the
    whole rewrite as unchanged and mutate nothing."""
    t = _build_table(spark, str(tmp_path / "tbl"))
    out = str(tmp_path / "out")
    run_extraction_job(spark, f"snap:{t.root}", out, SETTINGS)
    before_files = len(t.files())
    res_c = t.compact(spark, target_file_bytes=1024 * 1024)
    assert res_c["rewritten"] == before_files  # all fixture files are small
    assert len(t.files()) < before_files
    assert t.read(spark).count() == 4 * 3 * 10  # rows preserved

    before_docs = _docs_sorted(spark, out)
    res = run_incremental_update(spark, f"snap:{t.root}", out, SETTINGS)
    assert res["layout"] == "snapshot-diff"
    assert res["changed"] == 0 and res["deleted"] == 0
    assert res["touched_buckets"] == []
    assert _docs_sorted(spark, out) == before_docs
    assert _base_id(out) == t.current_id()


def test_compact_noop_below_two_small_files(spark, tmp_path):
    t = _build_table(spark, str(tmp_path / "tbl"), groups=1)
    t.compact(spark, target_file_bytes=1024 * 1024)  # collapse to one file
    res = t.compact(spark, target_file_bytes=1024 * 1024)
    assert res["rewritten"] == 0 and res["snapshot_id"] == t.current_id()


def test_snapshot_file_delta_classification(spark):
    old = _df(
        spark,
        _rows("keep", 3) + _rows("edit", 3) + _rows("gone", 3) + _rows("attr", 3),
    )
    new_attr = [
        (c, i, "tool", txt, tool, ts)  # role flipped -> attr-only change
        for (c, i, _r, txt, tool, ts) in _rows("attr", 3)
    ]
    new = _df(
        spark,
        _rows("keep", 3) + _rows("edit", 3, text="EDITED") + _rows("fresh", 2) + new_attr,
    )
    d = snapshot_file_delta(old, new, attr_cols=("role", "tool", "ts")).collect()
    by = {}
    for r in d:
        by.setdefault(r.conv_id, []).append(r)
    assert all(not r.changed and not r.deleted for r in by["keep"])  # moved, identical
    assert all(r.changed and r.in_old for r in by["edit"])
    assert all(r.changed and r.in_old for r in by["attr"])  # attr-only edit re-extracts
    assert all(r.changed and not r.in_old for r in by["fresh"])
    assert all(r.deleted for r in by["gone"])
    with pytest.raises(ValueError, match="checksum_algo"):
        snapshot_file_delta(old, new, checksum_algo="crc32")
