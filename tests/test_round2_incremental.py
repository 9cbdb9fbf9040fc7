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
