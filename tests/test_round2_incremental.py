"""Steady-state incremental tick: run_incremental_update must converge to
exactly what a full recompute would produce — added, changed, and deleted
turns all handled, with work proportional to the delta."""

import os

from pyspark.sql import functions as F

from fscrawler_spark.config import ExtractSettings
from fscrawler_spark.plans.pipeline import run_extraction_job, run_incremental_update

SETTINGS = ExtractSettings(num_buckets=8, skew_salt=4)


def _docs_sorted(spark, out):
    return (
        spark.read.parquet(os.path.join(out, "docs"))
        .drop("spans", "meta")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )


def _mutate_input(spark, inp, out_path):
    """v2 input: one conversation deleted, a block of turns changed, a
    few new turns appended."""
    src = spark.read.parquet(inp)
    victim = src.select("conv_id").orderBy("conv_id").first()["conv_id"]
    kept = src.filter(F.col("conv_id") != victim)
    changed = kept.withColumn(
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


def test_incremental_update_equals_full_recompute(spark, transcripts_dir, tmp_path):
    inp_v1 = os.path.join(transcripts_dir, "transcripts.parquet")
    out = str(tmp_path / "incr")
    run_extraction_job(spark, inp_v1, out, SETTINGS)

    inp_v2 = str(tmp_path / "v2.parquet")
    victim = _mutate_input(spark, inp_v1, inp_v2)

    res = run_incremental_update(spark, inp_v2, out, SETTINGS)
    v2_count = spark.read.parquet(inp_v2).count()
    changed_expected = spark.read.parquet(inp_v2).filter(
        (F.col("turn_idx") % 17 == 3) | (F.col("conv_id") == "conv-new")
    ).count()
    assert res["changed"] == changed_expected  # work ∝ delta, not corpus
    assert res["deleted"] > 0
    assert 0 < len(res["touched_buckets"]) <= SETTINGS.num_buckets

    # ground truth: full recompute of v2 from scratch
    full = str(tmp_path / "full")
    run_extraction_job(spark, inp_v2, full, SETTINGS)

    got = _docs_sorted(spark, out)
    want = _docs_sorted(spark, full)
    assert len(got) == len(want) == v2_count
    assert got == want
    # the deleted conversation is gone, the new one present
    assert all(r.conv_id != victim for r in got)
    assert any(r.conv_id == "conv-new" for r in got)


def test_incremental_update_noop_on_unchanged_input(spark, transcripts_dir, tmp_path):
    inp = os.path.join(transcripts_dir, "transcripts.parquet")
    out = str(tmp_path / "noopincr")
    run_extraction_job(spark, inp, out, SETTINGS)
    before = _docs_sorted(spark, out)
    res = run_incremental_update(spark, inp, out, SETTINGS)
    assert res["changed"] == 0 and res["deleted"] == 0
    assert res["touched_buckets"] == []
    assert _docs_sorted(spark, out) == before


def test_incremental_requires_prior_run(spark, transcripts_dir, tmp_path):
    import pytest

    inp = os.path.join(transcripts_dir, "transcripts.parquet")
    with pytest.raises(FileNotFoundError, match="run_extraction_job first"):
        run_incremental_update(spark, inp, str(tmp_path / "nope"), SETTINGS)


def test_incremental_refuses_settings_drift(spark, transcripts_dir, tmp_path):
    """A tick with different num_buckets would scatter fresh rows into new
    buckets while stale copies survive — the fingerprint guard applies."""
    import pytest

    from fscrawler_spark.plans.checkpoint import SettingsMismatchError

    inp = os.path.join(transcripts_dir, "transcripts.parquet")
    out = str(tmp_path / "drift")
    run_extraction_job(spark, inp, out, SETTINGS)
    with pytest.raises(SettingsMismatchError):
        run_incremental_update(
            spark, inp, out, ExtractSettings(num_buckets=16, skew_salt=4)
        )


def test_incremental_metadata_only_change_converges(spark, transcripts_dir, tmp_path):
    """role/tool/ts edits with identical text must still re-extract (the
    checksum covers text only; attributes compare separately)."""
    inp_v1 = os.path.join(transcripts_dir, "transcripts.parquet")
    out = str(tmp_path / "metaedit")
    run_extraction_job(spark, inp_v1, out, SETTINGS)
    src = spark.read.parquet(inp_v1)
    v2 = src.withColumn(
        "role",
        F.when((F.col("conv_id") == "megaconv-0") & (F.col("turn_idx") < 3), "flipped")
        .otherwise(F.col("role")),
    )
    inp_v2 = str(tmp_path / "v2meta.parquet")
    v2.write.parquet(inp_v2)
    res = run_incremental_update(spark, inp_v2, out, SETTINGS)
    assert res["changed"] == 3
    got = (
        spark.read.parquet(os.path.join(out, "docs"))
        .filter((F.col("conv_id") == "megaconv-0") & (F.col("turn_idx") < 3))
        .select("role")
        .collect()
    )
    assert all(r["role"] == "flipped" for r in got)


def test_incremental_newly_filtered_row_is_purged(spark, transcripts_dir, tmp_path):
    """A changed turn that now exceeds ignore_above must disappear from
    the output (a full recompute would exclude it), not linger stale."""
    st = ExtractSettings(num_buckets=8, skew_salt=4, ignore_above=2000)
    inp_v1 = os.path.join(transcripts_dir, "transcripts.parquet")
    src = spark.read.parquet(inp_v1).filter(F.octet_length("text") <= 2000)
    inp_small = str(tmp_path / "small.parquet")
    src.write.parquet(inp_small)
    out = str(tmp_path / "filtered")
    run_extraction_job(spark, inp_small, out, st)

    victim = src.select("conv_id", "turn_idx").orderBy("conv_id", "turn_idx").first()
    v2 = spark.read.parquet(inp_small).withColumn(
        "text",
        F.when(
            (F.col("conv_id") == victim["conv_id"]) & (F.col("turn_idx") == victim["turn_idx"]),
            F.rpad(F.lit("x"), 3000, "x"),  # grows past the 2000-byte gate
        ).otherwise(F.col("text")),
    )
    inp_v2 = str(tmp_path / "v2big.parquet")
    v2.write.parquet(inp_v2)
    res = run_incremental_update(spark, inp_v2, out, st)
    assert res["changed"] == 1
    docs = spark.read.parquet(os.path.join(out, "docs"))
    assert (
        docs.filter(
            (F.col("conv_id") == victim["conv_id"]) & (F.col("turn_idx") == victim["turn_idx"])
        ).count()
        == 0
    )
    # matches a full recompute of v2
    full = str(tmp_path / "filtered_full")
    run_extraction_job(spark, inp_v2, full, st)
    assert _docs_sorted(spark, out) == _docs_sorted(spark, full)


def test_incremental_converges_with_always_filtered_rows(spark, tmp_path):
    """Rows the filters have ALWAYS excluded are never in prev; they must
    not be re-flagged as 'changed' on every tick (the tick would rewrite
    their buckets forever). Second tick on unchanged input == no-op."""
    st = ExtractSettings(num_buckets=4, skew_salt=2, ignore_above=100)
    rows = [
        ("c", 0, "user", "small turn", None, None),
        ("c", 1, "user", "x" * 500, None, None),   # always filtered out
        ("d", 0, "user", None, None, None),        # null text: null checksum
    ]
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    inp = str(tmp_path / "in.parquet")
    spark.createDataFrame(rows, schema).write.parquet(inp)
    out = str(tmp_path / "conv")
    run_extraction_job(spark, inp, out, st)

    res1 = run_incremental_update(spark, inp, out, st)
    assert res1["changed"] == 0 and res1["deleted"] == 0
    assert res1["touched_buckets"] == []
    res2 = run_incremental_update(spark, inp, out, st)
    assert res2["changed"] == 0 and res2["touched_buckets"] == []


def test_incremental_tick_that_empties_the_table(spark, tmp_path):
    """Deleting every remaining row must not crash the metrics read-back
    (no parquet left to infer a schema from)."""
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    st = ExtractSettings(num_buckets=4, skew_salt=2)
    inp1 = str(tmp_path / "in1.parquet")
    spark.createDataFrame([("c", 0, "u", "hello", None, None)], schema).write.parquet(inp1)
    out = str(tmp_path / "emptied")
    run_extraction_job(spark, inp1, out, st)
    inp2 = str(tmp_path / "in2.parquet")
    spark.createDataFrame([], schema).write.parquet(inp2)
    res = run_incremental_update(spark, inp2, out, st)
    assert res["deleted"] == 1 and res["changed"] == 0
    metrics = spark.read.parquet(os.path.join(out, "metrics"))
    latest = metrics.filter(F.col("run_id") == res["run_id"])
    assert latest.count() == len(res["touched_buckets"]) > 0
    assert latest.agg(F.sum("turn_count")).collect()[0][0] == 0


def test_incremental_delete_only_tick_updates_metrics(spark, transcripts_dir, tmp_path):
    """A tick that only deletes must still append fresh lineage rows for
    the buckets it mutates."""
    inp_v1 = os.path.join(transcripts_dir, "transcripts.parquet")
    out = str(tmp_path / "delonly")
    run_extraction_job(spark, inp_v1, out, SETTINGS)
    src = spark.read.parquet(inp_v1)
    victim = src.select("conv_id").orderBy("conv_id").first()["conv_id"]
    inp_v2 = str(tmp_path / "v2del.parquet")
    src.filter(F.col("conv_id") != victim).write.parquet(inp_v2)

    res = run_incremental_update(spark, inp_v2, out, SETTINGS)
    assert res["changed"] == 0 and res["deleted"] > 0
    assert res["touched_buckets"]  # delete-only buckets reported
    metrics = spark.read.parquet(os.path.join(out, "metrics"))
    latest = metrics.filter(F.col("run_id") == res["run_id"])
    assert {r["part_bucket"] for r in latest.select("part_bucket").collect()} == set(
        res["touched_buckets"]
    )
    # the latest lineage row reconciles with the table per bucket
    docs = spark.read.parquet(os.path.join(out, "docs"))
    for b in res["touched_buckets"]:
        want = docs.filter(F.col("part_bucket") == b).count()
        got = latest.filter(F.col("part_bucket") == b).collect()[0]["turn_count"]
        assert got == want
