"""End-to-end extraction job tests: golden per-turn equality, span
invariant, stable ordering, checkpoint-resume idempotence, plan shape.

Mirrors the reference's integration-test strategy
(/root/reference/integration-tests/.../FsCrawlerTest*IT.java) on the
deterministic synthetic transcripts table.
"""

import os

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.config import ExtractSettings
from fscrawler_spark.functions.sniff import sniff_mime_col
from fscrawler_spark.operators.extract import extract_transcripts
from fscrawler_spark.plans.pipeline import run_extraction_job


SETTINGS = ExtractSettings(num_buckets=8, skew_salt=4)


def test_per_turn_text_equality(spark, transcripts_dir):
    """north_rule: per-turn text equality under stable (conv_id, turn_idx)
    ordering, against the golden expected table."""
    src = spark.read.parquet(os.path.join(transcripts_dir, "transcripts.parquet"))
    expected = spark.read.parquet(os.path.join(transcripts_dir, "expected.parquet"))
    got = extract_transcripts(src, SETTINGS)

    joined = got.alias("g").join(expected.alias("e"), ["conv_id", "turn_idx"], "full_outer")
    from fscrawler_spark.functions.udfs import spans_to_structs

    mismatch = joined.filter(
        ~(
            F.col("g.extracted").eqNullSafe(F.col("e.expected_text"))
            & F.col("g.mime").eqNullSafe(F.col("e.expected_mime"))
            & F.col("g.error").eqNullSafe(F.col("e.expected_error"))
            & spans_to_structs(F.col("g.spans")).eqNullSafe(F.col("e.expected_spans"))
        )
    )
    assert mismatch.count() == 0
    assert got.count() == expected.count()


def test_span_invariant_distributed(spark, transcripts_dir):
    """joining text[start:end] slices with '\\n' reproduces extracted —
    verified in-plan with JVM-side substring, no collect of payloads."""
    src = spark.read.parquet(os.path.join(transcripts_dir, "transcripts.parquet"))
    got = extract_transcripts(src, SETTINGS).join(
        src.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"]
    )
    from fscrawler_spark.functions.udfs import spans_to_structs

    got = got.withColumn(
        "rebuilt",
        F.array_join(
            F.transform(
                spans_to_structs(F.col("spans")),
                lambda s: F.substring(F.col("text"), s["start"] + 1, s["end"] - s["start"]),
            ),
            "\n",
        ),
    )
    bad = got.filter(
        F.col("extracted").isNotNull() & ~F.col("rebuilt").eqNullSafe(F.col("extracted"))
    )
    assert bad.count() == 0


def test_sniff_expr_matches_python_core(spark, transcripts_dir):
    """JVM sniff expression and the UDF-side Python sniff agree row-for-row."""
    src = spark.read.parquet(os.path.join(transcripts_dir, "transcripts.parquet"))
    got = extract_transcripts(src, SETTINGS).join(
        src.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"]
    )
    bad = got.filter(~sniff_mime_col(F.col("text")).eqNullSafe(F.col("mime")))
    assert bad.count() == 0


def test_no_shuffle_before_sink(spark, transcripts_dir):
    """The extraction plan is embarrassingly parallel: no Exchange between
    scan and the extraction projection."""
    src = spark.read.parquet(os.path.join(transcripts_dir, "transcripts.parquet"))
    plan = extract_transcripts(src, SETTINGS)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_job_end_to_end_and_metrics(spark, transcripts_dir, tmp_path):
    out = str(tmp_path / "out")
    res = run_extraction_job(
        spark, os.path.join(transcripts_dir, "transcripts.parquet"), out, SETTINGS
    )
    assert sorted(res["written_buckets"]) == list(range(SETTINGS.num_buckets))

    docs = spark.read.parquet(os.path.join(out, "docs"))
    src = spark.read.parquet(os.path.join(transcripts_dir, "transcripts.parquet"))
    assert docs.count() == src.count()

    metrics = spark.read.parquet(os.path.join(out, "metrics"))
    m = metrics.agg(
        F.sum("turn_count").alias("t"),
        F.sum("parse_failures").alias("f"),
        F.sum("span_count").alias("s"),
        F.sum("bytes_in").alias("bi"),
    ).collect()[0]
    assert m["t"] == src.count()
    assert m["f"] > 0  # encrypted/broken classes exist in the fixture
    assert m["s"] > 0 and m["bi"] > 0
    # every bucket has a lineage row
    assert metrics.select("part_bucket").distinct().count() == SETTINGS.num_buckets


def test_checkpoint_resume_idempotent(spark, transcripts_dir, tmp_path):
    """Kill after K waves, re-run, verify the union is complete and
    byte-identical to a clean single run (W3/W4, exactly-once)."""
    inp = os.path.join(transcripts_dir, "transcripts.parquet")
    out_a = str(tmp_path / "resumed")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_extraction_job(spark, inp, out_a, SETTINGS, fail_after_buckets=2)
    # some buckets done, some pending
    from fscrawler_spark.plans.checkpoint import CheckpointManifest

    m = CheckpointManifest.load_or_create(os.path.join(out_a, "_checkpoint.json"))
    assert 0 < len(m.completed) < SETTINGS.num_buckets

    res2 = run_extraction_job(spark, inp, out_a, SETTINGS)
    assert set(res2["written_buckets"]) == set(range(SETTINGS.num_buckets)) - m.completed

    out_b = str(tmp_path / "clean")
    run_extraction_job(spark, inp, out_b, SETTINGS)

    # drop spans (ordering-internal) and meta (map type is not allowed in
    # set operations) for the equality check
    a = spark.read.parquet(os.path.join(out_a, "docs")).drop("spans", "meta")
    b = spark.read.parquet(os.path.join(out_b, "docs")).drop("spans", "meta")
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_rerun_on_completed_checkpoint_is_noop(spark, transcripts_dir, tmp_path):
    inp = os.path.join(transcripts_dir, "transcripts.parquet")
    out = str(tmp_path / "noop")
    run_extraction_job(spark, inp, out, SETTINGS)
    res = run_extraction_job(spark, inp, out, SETTINGS)
    assert res["written_buckets"] == []


def test_skew_salting_spreads_megaconv(spark, transcripts_dir):
    src = spark.read.parquet(os.path.join(transcripts_dir, "transcripts.parquet"))
    docs = extract_transcripts(src, SETTINGS)
    buckets = (
        docs.filter(F.col("conv_id") == "megaconv-0")
        .select("part_bucket")
        .distinct()
        .count()
    )
    assert buckets >= min(SETTINGS.skew_salt, SETTINGS.num_buckets) - 1
