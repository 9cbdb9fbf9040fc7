"""Round 4: preference pairs (assembly.preference_pairs — DPO-style
(prompt, chosen, rejected) triples grouped by identical prompt) and
curriculum export ordering (export.curriculum_order — stage-major,
seeded-permutation-minor single-key layout). Hand-computed fixtures,
determinism under repartitioning, margin/NULL semantics, plan pins
(one Exchange for pairing; zero for curriculum keys). The DuckDB value
twin for the pairing lives in the driver oracle row
(q_preference_pairs — see tests/test_oracle_parity.py).
"""

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.functions.assembly import preference_pairs, sft_examples
from fscrawler_spark.functions.export import curriculum_order, training_order


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _examples(spark):
    # two prompts with multiple distinct responses + one singleton.
    # quality_score is monotone in length up to 500 chars at zero
    # punctuation, so response length orders the scores predictably.
    rows = [
        ("p1", "short answer"),
        ("p1", "a much longer considered answer with many plain words " * 4),
        ("p1", "medium sized answer with several words"),
        ("p2", "only one response"),
        # identical length / punct / stopword profile -> identical score
        ("p3", "tie aa"),
        ("p3", "tie bb"),
    ]
    return spark.createDataFrame(rows, "prompt string, response string")


# --- preference_pairs ---------------------------------------------------------


def test_pairs_pick_best_and_worst(spark):
    out = preference_pairs(_examples(spark)).orderBy("prompt").collect()
    by_prompt = {r["prompt"]: r for r in out}
    # p2 has one candidate -> no pair
    assert set(by_prompt) == {"p1", "p3"}
    p1 = by_prompt["p1"]
    assert p1["chosen"].startswith("a much longer")
    assert p1["rejected"] == "short answer"
    assert p1["chosen_score"] > p1["rejected_score"]
    assert p1["n_candidates"] == 3
    # p3: equal scores, distinct responses -> deterministic byte tie-break
    p3 = by_prompt["p3"]
    assert p3["chosen_score"] == p3["rejected_score"]
    assert (p3["chosen"], p3["rejected"]) == ("tie bb", "tie aa")


def test_margin_filters_low_confidence_pairs(spark):
    out = preference_pairs(_examples(spark), min_margin=0.01).collect()
    assert {r["prompt"] for r in out} == {"p1"}  # p3's gap is exactly 0


def test_null_scores_drop_before_pairing(spark):
    df = spark.createDataFrame(
        [("p", "real response words here"), ("p", None), ("p", "ok words")],
        "prompt string, response string",
    )
    out = preference_pairs(df).collect()
    assert len(out) == 1 and out[0]["n_candidates"] == 2


def test_custom_score_column(spark):
    df = spark.createDataFrame(
        [("p", "a", 1.0), ("p", "b", 9.0), ("p", "c", 5.0)],
        "prompt string, response string, s double",
    )
    out = preference_pairs(df, score=F.col("s")).collect()[0]
    assert (out["chosen"], out["rejected"]) == ("b", "a")
    assert (out["chosen_score"], out["rejected_score"]) == (9.0, 1.0)


def test_pairs_parallelism_stable(spark):
    d = _examples(spark)
    a = preference_pairs(d.repartition(8)).collect()
    b = preference_pairs(d.repartition(1)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pairs_single_exchange_no_python(spark):
    plan = plan_of(preference_pairs(_examples(spark)))
    assert plan.count("Exchange") == 1
    assert "Python" not in plan and "Window" not in plan


def test_pairs_compose_with_sft_examples(spark, transcripts_dir):
    import os

    turns = spark.read.parquet(os.path.join(transcripts_dir, "transcripts.parquet"))
    ex = sft_examples(turns, target_role="assistant", context_turns=1)
    out = preference_pairs(ex)
    # schema contract + runs end-to-end on the north-rule table shape
    assert out.columns == [
        "prompt",
        "chosen",
        "rejected",
        "chosen_score",
        "rejected_score",
        "n_candidates",
    ]
    out.limit(5).collect()


# --- curriculum_order ---------------------------------------------------------


def _staged(spark, n=300):
    return (
        spark.range(n)
        .withColumnRenamed("id", "doc_id")
        .withColumn("stage", (F.col("doc_id") % 3).cast("int"))
    )


def test_curriculum_sorts_stage_major(spark):
    out = (
        curriculum_order(_staged(spark), "stage", seed=1)
        .orderBy("order_key")
        .select("stage")
        .collect()
    )
    stages = [r["stage"] for r in out]
    assert stages == sorted(stages)  # stage-major ramp
    # within a stage the permutation actually permutes (not id order)
    first_stage_ids = (
        curriculum_order(_staged(spark), "stage", seed=1)
        .filter(F.col("stage") == 0)
        .orderBy("order_key")
        .select("doc_id")
        .collect()
    )
    ids = [r["doc_id"] for r in first_stage_ids]
    assert ids != sorted(ids)


def test_curriculum_seed_changes_within_stage_order_only(spark):
    a = (
        curriculum_order(_staged(spark), "stage", seed=1)
        .orderBy("order_key")
        .select("doc_id")
        .collect()
    )
    b = (
        curriculum_order(_staged(spark), "stage", seed=2)
        .orderBy("order_key")
        .select("doc_id")
        .collect()
    )
    assert [r["doc_id"] for r in a] != [r["doc_id"] for r in b]


def test_curriculum_shards_are_stage_stratified(spark):
    out = curriculum_order(_staged(spark), "stage", seed=5, n_shards=4)
    per = (
        out.groupBy("shard")
        .agg(F.countDistinct("stage").alias("k"))
        .collect()
    )
    assert len(per) == 4 and all(r["k"] == 3 for r in per)


def test_curriculum_matches_training_order_permutation_bits(spark):
    # the within-stage permutation IS order_key's permutation (masked):
    # same seed => same relative order of two docs in the same stage
    d = _staged(spark)
    base = {
        r["doc_id"]: r["order_key"] % (1 << 52)
        for r in training_order(d, seed=7).collect()
    }
    cur = {
        r["doc_id"]: r["order_key"] % (1 << 52)
        for r in curriculum_order(d, "stage", seed=7).collect()
    }
    assert base == cur


def test_curriculum_stage_out_of_range_raises(spark):
    bad = _staged(spark).withColumn("stage", F.lit(-1))
    with pytest.raises(Exception, match="curriculum stage"):
        curriculum_order(bad, "stage").collect()


def test_curriculum_is_pure_projection(spark):
    plan = plan_of(curriculum_order(_staged(spark), "stage", n_shards=4))
    assert "Exchange" not in plan


# --- CLI verbs ----------------------------------------------------------------


def test_cli_pref_pairs(spark, tmp_path, capsys):
    import json
    import os

    from fscrawler_spark.cli import main

    q = "What is the answer to everything"
    rows = []
    for i, resp in enumerate(
        [
            "a very long detailed plainly worded response with many words " * 3,
            "short",
            "middling answer with several words",
            "short",
        ]
    ):
        rows.append((2 * i, f"c{i}", 0, "user", q))
        rows.append((2 * i + 1, f"c{i}", 1, "assistant", resp))
    src = str(tmp_path / "in")
    spark.createDataFrame(
        rows, "doc_id long, conv_id string, turn_idx int, role string, extracted string"
    ).write.parquet(os.path.join(src, "docs"))
    out = str(tmp_path / "pairs")
    rc = main(
        ["--input", src, "--output", out, "--pref-pairs", "--sft-context", "1"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["pref_pairs"] is True and res["pairs"] == 1 and res["candidates"] == 4
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    assert got[0]["chosen"].startswith("a very long") and got[0]["rejected"] == "short"
    assert got[0]["n_candidates"] == 4


def test_cli_pref_margin_validation(spark, capsys):
    from fscrawler_spark.cli import main

    assert main(["--output", "/tmp/x", "--pref-margin", "0.1"], spark=spark) == 2
    assert (
        main(
            ["--output", "/tmp/x", "--pref-pairs", "--pref-margin", "-1"],
            spark=spark,
        )
        == 2
    )


def test_cli_export_curriculum(spark, tmp_path, capsys):
    import json
    import os

    from fscrawler_spark.cli import main

    src = str(tmp_path / "in")
    rows = [
        (i, f"c{i}", 0, f"document body number {i}", int(i % 3)) for i in range(60)
    ]
    spark.createDataFrame(
        rows, "doc_id long, conv_id string, turn_idx int, extracted string, stage int"
    ).write.parquet(os.path.join(src, "docs"))
    out = str(tmp_path / "exported")
    rc = main(
        [
            "--input", src, "--output", out,
            "--export", "2", "--export-curriculum", "stage",
        ],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["export"] is True and res["curriculum"] == "stage"
    assert res["verify_findings"] == [] and res["rows"] == 60
    shards = spark.read.parquet(os.path.join(out, "shards"))
    for k in (0, 1):
        seq = (
            shards.filter(F.col("shard") == k)
            .orderBy("order_key")
            .select("stage")
            .collect()
        )
        stages = [r["stage"] for r in seq]
        assert stages == sorted(stages) and set(stages) == {0, 1, 2}


def test_cli_export_curriculum_validation(spark, tmp_path, capsys):
    import os

    from fscrawler_spark.cli import main

    assert (
        main(["--output", "/tmp/x", "--export-curriculum", "stage"], spark=spark) == 2
    )
    src = str(tmp_path / "in2")
    spark.createDataFrame(
        [(1, "c", 0, "t")],
        "doc_id long, conv_id string, turn_idx int, extracted string",
    ).write.parquet(os.path.join(src, "docs"))
    assert (
        main(
            [
                "--input", src, "--output", str(tmp_path / "o"),
                "--export", "2", "--export-curriculum", "nope",
            ],
            spark=spark,
        )
        == 2
    )
