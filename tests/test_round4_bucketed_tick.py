"""Round 4: the co-located bucketed layout of the incremental tick.

The steady-state tick is the 100-TB workload (the reference's whole
reason to exist — core/.../FsParser.java:1147-1215). layout="bucketed"
must (a) plan its ONE corpus-scale diff join with ZERO Exchange when the
input is a bucketed table, (b) produce byte-identical results to the
parquet layout and to a full recompute, and (c) survive crash/rebuild of
the snapshot index without ever trusting a stale marker.
"""

import os

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.config import ExtractSettings
from fscrawler_spark.plans import bucketed as snap
from fscrawler_spark.plans.bucketed import write_bucketed
from fscrawler_spark.plans.pipeline import run_extraction_job, run_incremental_update
from fscrawler_spark.sources.transcripts import read_transcripts

SETTINGS = ExtractSettings(num_buckets=8, skew_salt=4)


def _docs_sorted(spark, out):
    return (
        spark.read.parquet(os.path.join(out, "docs"))
        .drop("spans", "meta")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )


def _mutate_input(spark, inp, out_path):
    """v2 input: one conversation deleted, a block of turns changed, new
    turns appended (same recipe as the round-2 parquet-layout tests)."""
    src = spark.read.parquet(inp)
    victim = src.select("conv_id").orderBy("conv_id").first()["conv_id"]
    changed = src.filter(F.col("conv_id") != victim).withColumn(
        "text",
        F.when(
            F.col("turn_idx") % 17 == 3, F.concat(F.col("text"), F.lit(" CHANGED TAIL"))
        ).otherwise(F.col("text")),
    )
    new_rows = spark.createDataFrame(
        [("conv-new", i, "user", f"brand new turn {i}", None, None) for i in range(5)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    v2 = changed.unionByName(new_rows)
    v2.write.mode("overwrite").parquet(out_path)
    return victim


@pytest.fixture
def bucketed_out(spark, transcripts_dir, tmp_path):
    """A completed full run + a valid snapshot index (built by a no-op
    bucketed tick)."""
    inp = os.path.join(transcripts_dir, "transcripts.parquet")
    out = str(tmp_path / "bt")
    run_extraction_job(spark, inp, out, SETTINGS)
    res = run_incremental_update(spark, inp, out, SETTINGS, layout="bucketed")
    assert res["changed"] == 0 and res["deleted"] == 0
    assert snap.snapshot_is_valid(spark, out, SETTINGS.num_buckets, SETTINGS.fingerprint())
    yield inp, out
    spark.sql(f"DROP TABLE IF EXISTS {snap.snapshot_table_name(out)}")


def test_tick_diff_join_has_zero_exchange(spark, bucketed_out):
    """The exact plan the bucketed tick materializes — read_transcripts
    over a table: input (incl. validate_schema projection) full-outer
    joined with the snapshot index — must have NO Exchange on EITHER
    side. This is the 10^12-turn property: the corpus never moves."""
    inp, out = bucketed_out
    write_bucketed(
        spark.read.parquet(inp), "r4_plan_input", buckets=SETTINGS.num_buckets
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        src = read_transcripts(spark, "table:r4_plan_input")
        delta = snap.colocated_tick_delta(
            spark, src, snap.snapshot_table_name(out)
        )
        plan = delta._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert delta.count() == 0  # same input ⇒ empty delta
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS r4_plan_input")


def test_bucketed_tick_equals_full_recompute(spark, bucketed_out, tmp_path):
    inp, out = bucketed_out
    inp_v2 = str(tmp_path / "v2.parquet")
    victim = _mutate_input(spark, inp, inp_v2)
    write_bucketed(
        spark.read.parquet(inp_v2), "r4_tick_v2", buckets=SETTINGS.num_buckets
    )
    try:
        res = run_incremental_update(
            spark, "table:r4_tick_v2", out, SETTINGS, layout="bucketed"
        )
        assert res["changed"] > 0 and res["deleted"] > 0

        full = str(tmp_path / "full")
        run_extraction_job(spark, inp_v2, full, SETTINGS)
        got = _docs_sorted(spark, out)
        want = _docs_sorted(spark, full)
        assert len(got) == len(want) == spark.read.parquet(inp_v2).count()
        assert got == want
        assert all(r.conv_id != victim for r in got)
        # marker re-committed after the refresh
        assert snap.snapshot_is_valid(
            spark, out, SETTINGS.num_buckets, SETTINGS.fingerprint()
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS r4_tick_v2")


def test_snapshot_refresh_keeps_second_tick_correct(spark, bucketed_out, tmp_path):
    """Two consecutive bucketed ticks: the index refreshed by tick 1 must
    give tick 2 the correct (delta-sized) diff — the steady-state loop."""
    inp, out = bucketed_out
    inp_v2 = str(tmp_path / "v2.parquet")
    _mutate_input(spark, inp, inp_v2)
    run_incremental_update(spark, inp_v2, out, SETTINGS, layout="bucketed")

    # v3: change a handful of conv-new turns only
    v3 = spark.read.parquet(inp_v2).withColumn(
        "text",
        F.when(
            F.col("conv_id") == "conv-new", F.concat(F.col("text"), F.lit(" v3"))
        ).otherwise(F.col("text")),
    )
    inp_v3 = str(tmp_path / "v3.parquet")
    v3.write.mode("overwrite").parquet(inp_v3)
    res = run_incremental_update(spark, inp_v3, out, SETTINGS, layout="bucketed")
    assert res["changed"] == 5 and res["deleted"] == 0  # exactly the delta

    full = str(tmp_path / "full3")
    run_extraction_job(spark, inp_v3, full, SETTINGS)
    assert _docs_sorted(spark, out) == _docs_sorted(spark, full)


def test_bucketed_tick_respects_remove_deleted_false(spark, bucketed_out, tmp_path):
    """The co-located delta carries deleted rows, but the reference's
    remove_deleted=False knob must still keep them — the gating lives
    OUTSIDE the join and must hold in both layouts."""
    inp, out = bucketed_out
    inp_v2 = str(tmp_path / "v2.parquet")
    victim = _mutate_input(spark, inp, inp_v2)
    st = ExtractSettings(num_buckets=8, skew_salt=4, remove_deleted=False)
    res = run_incremental_update(spark, inp_v2, out, st, layout="bucketed")
    assert res["deleted"] == 0 and res["changed"] > 0
    kept = spark.read.parquet(os.path.join(out, "docs"))
    assert kept.filter(F.col("conv_id") == victim).count() > 0  # vanished rows stay


def test_stale_marker_forces_rebuild_not_stale_diff(spark, bucketed_out, tmp_path):
    """Crash simulation: marker gone after docs mutated out-of-band. The
    next bucketed tick must rebuild the index from the docs parquet — a
    stale index would diff against pre-crash state and miss the
    out-of-band changes.

    Since the round-5 hardening a HEALTHY parquet-layout tick refreshes a
    bootstrapped index partition-scoped and re-commits the marker (see
    tests/test_round5_review_fixes.py::test_parquet_tick_refreshes_bootstrapped_index),
    so the crash is simulated by invalidating the marker AFTER the tick —
    exactly the on-disk state a crash between the bucket swaps and the
    index refresh leaves behind."""
    inp, out = bucketed_out
    inp_v2 = str(tmp_path / "v2.parquet")
    _mutate_input(spark, inp, inp_v2)
    # healthy parquet tick: refreshes the bootstrapped index in place
    run_incremental_update(spark, inp_v2, out, SETTINGS, layout="parquet")
    assert snap.snapshot_is_valid(
        spark, out, SETTINGS.num_buckets, SETTINGS.fingerprint()
    )
    # crash simulation: marker lost after the mutation
    snap.invalidate_snapshot(out)
    assert not snap.snapshot_is_valid(
        spark, out, SETTINGS.num_buckets, SETTINGS.fingerprint()
    )
    # bucketed no-op tick over the same input: rebuild, then empty delta
    res = run_incremental_update(spark, inp_v2, out, SETTINGS, layout="bucketed")
    assert res["changed"] == 0 and res["deleted"] == 0
    assert snap.snapshot_is_valid(
        spark, out, SETTINGS.num_buckets, SETTINGS.fingerprint()
    )


def test_dry_run_bucketed_previews_without_building_index(
    spark, transcripts_dir, tmp_path
):
    """dry_run over an invalid/missing index must fall back to the
    parquet diff (same counts) and must NOT create the index table."""
    inp = os.path.join(transcripts_dir, "transcripts.parquet")
    out = str(tmp_path / "dry")
    run_extraction_job(spark, inp, out, SETTINGS)
    inp_v2 = str(tmp_path / "v2.parquet")
    _mutate_input(spark, inp, inp_v2)
    res = run_incremental_update(
        spark, inp_v2, out, SETTINGS, dry_run=True, layout="bucketed"
    )
    assert res["dry_run"] is True and res["changed"] > 0 and res["deleted"] > 0
    assert not spark.catalog.tableExists(snap.snapshot_table_name(out))
    # and nothing was written
    parq = spark.read.parquet(os.path.join(out, "docs"))
    assert parq.filter(F.col("conv_id") == "conv-new").count() == 0


def test_colocated_delta_null_safety_matrix(spark, tmp_path):
    """Every null/presence combination the diff must classify exactly like
    the parquet path: null text equals null text (not perpetually
    re-extracted), a null attr differs from a value, absence ≠ all-null
    row. One fixture, every case."""
    import datetime as dt

    ts1 = dt.datetime(2026, 1, 1)
    ts2 = dt.datetime(2026, 1, 2)

    def h(t):
        import hashlib

        return hashlib.sha256(t.encode()).hexdigest() if t is not None else None

    # (key, cur(text,role,tool,ts), prev(text,role,tool,ts) or None)
    cases = [
        ("same", ("a", "user", None, ts1), ("a", "user", None, ts1)),          # unchanged
        ("nulls_same", (None, None, None, None), (None, None, None, None)),    # unchanged
        ("text_chg", ("a", "user", None, ts1), ("b", "user", None, ts1)),      # changed
        ("text_to_null", (None, "user", None, ts1), ("a", "user", None, ts1)), # changed
        ("text_from_null", ("a", "user", None, ts1), (None, "user", None, ts1)),
        ("role_chg", ("a", "user", None, ts1), ("a", "asst", None, ts1)),      # changed
        ("tool_null_vs_val", ("a", "user", None, ts1), ("a", "user", "x", ts1)),
        ("ts_chg", ("a", "user", None, ts1), ("a", "user", None, ts2)),        # changed
        ("new_row", ("a", "user", None, ts1), None),                           # changed, !in_prev
        ("gone_row", None, ("a", "user", None, ts1)),                          # deleted
    ]
    cur_rows = [
        (k, 0, c[1], c[0], c[2], c[3]) for k, c, _ in cases if c is not None
    ]
    snap_rows = [
        (k, 0, h(p[0]), p[1], p[2], p[3], 0) for k, _, p in cases if p is not None
    ]
    cur = spark.createDataFrame(
        cur_rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    snap_df = spark.createDataFrame(
        snap_rows,
        "conv_id string, turn_idx int, _ck string, role string, tool string, ts timestamp, part_bucket int",
    )
    write_bucketed(cur, "r4_null_cur", buckets=4)
    snap._write_snapshot(snap_df, "r4_null_snap", 4, mode="overwrite")
    try:
        delta = snap.colocated_tick_delta(spark, spark.table("r4_null_cur"), "r4_null_snap")
        got = {r["conv_id"]: (r["changed"], r["in_prev"], r["deleted"]) for r in delta.collect()}
        assert got == {
            "text_chg": (True, True, False),
            "text_to_null": (True, True, False),
            "text_from_null": (True, True, False),
            "role_chg": (True, True, False),
            "tool_null_vs_val": (True, True, False),
            "ts_chg": (True, True, False),
            "new_row": (True, False, False),
            "gone_row": (False, True, True),
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS r4_null_cur")
        spark.sql("DROP TABLE IF EXISTS r4_null_snap")


def test_cli_layout_flag_drives_bucketed_tick(spark, transcripts_dir, tmp_path, capsys):
    """`--incremental --layout bucketed` end-to-end through the CLI:
    builds the index, reports the delta, leaves a valid marker."""
    import json as _json

    from fscrawler_spark.cli import main

    inp = os.path.join(transcripts_dir, "transcripts.parquet")
    out = str(tmp_path / "cliout")
    assert main(["--input", inp, "--output", out, "--num-buckets", "8", "--skew-salt", "4"], spark=spark) == 0
    capsys.readouterr()
    rc = main(
        ["--input", inp, "--output", out, "--num-buckets", "8", "--skew-salt", "4",
         "--incremental", "--layout", "bucketed"],
        spark=spark,
    )
    assert rc == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["changed"] == 0 and res["deleted"] == 0
    assert snap.snapshot_is_valid(spark, out, 8, SETTINGS.fingerprint())
    spark.sql(f"DROP TABLE IF EXISTS {snap.snapshot_table_name(out)}")


def test_marker_fingerprint_drift_rejected(spark, tmp_path):
    """A marker written under different settings must not validate —
    bits of the layout (num_buckets) and content (filters) both ride the
    fingerprint, and a drifted index would diff against the wrong
    bucketing."""
    out = str(tmp_path / "drift")
    os.makedirs(out)
    snap.commit_snapshot_marker(out, num_buckets=8, fingerprint="aaaa")
    # table absent -> invalid regardless
    assert not snap.snapshot_is_valid(spark, out, 8, "aaaa")
    # wrong fingerprint / bucket count -> invalid even if a table existed
    assert not snap.snapshot_is_valid(spark, out, 8, "bbbb")
    assert not snap.snapshot_is_valid(spark, out, 16, "aaaa")


def test_restart_clean_drops_snapshot(spark, bucketed_out):
    from fscrawler_spark.plans.pipeline import restart_clean

    inp, out = bucketed_out
    table = snap.snapshot_table_name(out)
    assert spark.catalog.tableExists(table)
    restart_clean(out, spark)
    assert not spark.catalog.tableExists(table)
    assert not os.path.exists(os.path.join(out, snap.SNAPSHOT_MARKER))


def test_write_bucketed_recovers_orphaned_location(spark, tmp_path):
    # a killed session leaves the managed LOCATION on disk while a fresh
    # metastore knows no such table; saveAsTable refuses with
    # LOCATION_ALREADY_EXISTS even in overwrite mode (took down the r4
    # bench). write_bucketed must clear the orphan and proceed.
    import os
    import shutil

    df = spark.createDataFrame(
        [("c0", 0, "x")], "conv_id string, turn_idx int, text string"
    )
    write_bucketed(df, "r4_orphan_loc", buckets=2)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(wh, "r4_orphan_loc")
    assert os.path.isdir(loc)
    # simulate the crash: drop the metastore entry, resurrect the dir
    backup = str(tmp_path / "orphan_backup")
    shutil.copytree(loc, backup)
    spark.sql("DROP TABLE r4_orphan_loc")
    shutil.copytree(backup, loc)
    write_bucketed(df, "r4_orphan_loc", buckets=2)  # must not raise
    assert spark.table("r4_orphan_loc").count() == 1
    spark.sql("DROP TABLE IF EXISTS r4_orphan_loc")
