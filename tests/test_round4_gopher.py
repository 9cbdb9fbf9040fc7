"""Round 4: Gopher rule-based quality gate (curation.gopher_quality_flags
— Rae et al. 2021 §A1.1 defaults). Rule-by-rule hand-computed fixtures:
each row is built to trip exactly one rule (or none), so a regression in
any rule is attributable from the failing assert alone.
"""

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.functions.curation import gopher_quality_flags

GOOD = (
    "the quick brown fox jumps over a lazy dog and then it runs to "
    "the river for water because it is thirsty after that long chase "
    "in the warm sun while birds sing simple songs about summer days "
    "that pass slowly in the quiet field near an old farm house there"
)  # 51 words, natural English


def _flags(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(gopher_quality_flags("text", **kw).alias("q")).collect()[0].q


def test_good_doc_passes_with_expected_metrics(spark):
    q = _flags(spark, GOOD)
    assert q.passes and q.fail_reasons == []
    words = GOOD.split()
    assert q.word_count == len(words)
    # mean word len = non-space chars / words == mean of per-word lengths
    assert q.mean_word_len == pytest.approx(
        sum(len(w) for w in words) / len(words), abs=1e-6
    )
    assert q.stopword_hits >= 2 and q.alpha_word_frac == 1.0


@pytest.mark.parametrize(
    "text,reason",
    [
        (None, "null_text"),
        ("too short", "too_few_words"),
        # 60 single-char words: mean word len 1 < 3
        (" ".join(["a"] * 30 + ["i"] * 30), "mean_word_len_out_of_range"),
        # symbol-heavy: >0.1 '#'/ellipsis per word
        (GOOD + " " + "# # # # # # #", "symbol_heavy"),
        # every line a bullet (> 0.9)
        ("\n".join(f"- item {i} here now" for i in range(20)), "bullet_heavy"),
        # >30% of lines end with ellipsis
        (GOOD + "\nread more...\nand more...\nthe end", "ellipsis_heavy"),
        # numbers are words with no alphabetic char
        (" ".join(str(i) for i in range(60)), "low_alpha_words"),
        # long but stopword-free (word soup)
        (" ".join(f"zxqv{i}" for i in range(60)), "too_few_stopwords"),
    ],
)
def test_each_rule_trips_alone(spark, text, reason):
    q = _flags(spark, text)
    assert not q.passes
    assert reason in q.fail_reasons, (reason, q.fail_reasons)


def test_thresholds_are_parameters(spark):
    # the same short doc passes once min_words is lowered
    q = _flags(
        spark,
        "the cats sleep on warm mats and they stay fine right here today",
        min_words=5,
    )
    assert q.passes, q.fail_reasons


def test_max_words_cap(spark):
    q = _flags(spark, GOOD, max_words=10)
    assert not q.passes and "too_many_words" in q.fail_reasons


def test_gate_rides_a_projection_without_shuffle(spark):
    """100-TB shape: the gate is a pure column expression — adding it to
    a scan plan introduces NO Exchange and no Python eval."""
    df = spark.range(100).withColumn("text", F.lit(GOOD))
    plan = (
        df.select("id", gopher_quality_flags("text").alias("q"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
