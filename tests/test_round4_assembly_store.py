"""Incremental assembly store (plans/assembly_store.py): bootstrap ==
one-shot assembly, no-op ticks, per-conversation delta re-assembly,
deletion purge, fingerprint stability, and the drift/dirty refusals —
all value-checked against one-shot assemble_conversations over the
current corpus (the store must be indistinguishable from a full rebuild
after ANY tick sequence).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.functions.assembly import assemble_conversations
from fscrawler_spark.plans.assembly_store import (
    assembly_tick,
    conversation_fingerprints,
)

SCHEMA = "conv_id string, turn_idx int, role string, extracted string"


def _corpus_v1(spark):
    rows = []
    for c in range(6):
        for i in range(4):
            rows.append((f"c{c}", i, "user" if i % 2 == 0 else "assistant",
                         f"conv {c} turn {i} text"))
    return spark.createDataFrame(rows, SCHEMA)


def _write_output(spark, tmp_path, df):
    out = str(tmp_path / "out")
    df.write.mode("overwrite").parquet(os.path.join(out, "docs"))
    return out


def _store_docs(spark, out):
    return spark.read.parquet(os.path.join(out, "assembled", "docs"))


def _oneshot(df):
    return {
        r["conv_id"]: (r["doc"], r["n_turns"], r["n_chars"])
        for r in assemble_conversations(df, text_col="extracted").collect()
    }


def _stored(spark, out):
    return {
        r["conv_id"]: (r["doc"], r["n_turns"], r["n_chars"])
        for r in _store_docs(spark, out).collect()
    }


def test_bootstrap_equals_oneshot_then_noop(spark, tmp_path):
    v1 = _corpus_v1(spark)
    out = _write_output(spark, tmp_path, v1)
    res = assembly_tick(spark, out)
    assert res["bootstrap"] is True and res["changed_convs"] == 6
    assert _stored(spark, out) == _oneshot(v1)
    # second tick over unchanged content: a true no-op
    res2 = assembly_tick(spark, out)
    assert res2 == {
        "bootstrap": False, "changed_convs": 0, "removed_convs": 0,
        "convs_total": 6,
    }
    assert _stored(spark, out) == _oneshot(v1)


def test_change_reassembles_only_touched_convs(spark, tmp_path):
    v1 = _corpus_v1(spark)
    out = _write_output(spark, tmp_path, v1)
    assembly_tick(spark, out)
    # edit one turn of c2, add a turn to c4, drop conv c5
    v2 = (
        v1.filter(F.col("conv_id") != "c5")
        .withColumn(
            "extracted",
            F.when(
                (F.col("conv_id") == "c2") & (F.col("turn_idx") == 1),
                F.lit("EDITED"),
            ).otherwise(F.col("extracted")),
        )
        .unionByName(
            spark.createDataFrame([("c4", 4, "assistant", "appended")], SCHEMA)
        )
    )
    _write_output(spark, tmp_path, v2)
    res = assembly_tick(spark, out)
    assert res["changed_convs"] == 2  # c2 and c4 only
    assert res["removed_convs"] == 1  # c5 purged
    assert res["convs_total"] == 5
    assert _stored(spark, out) == _oneshot(v2)
    assert "EDITED" in _stored(spark, out)["c2"][0]
    # state table purged too: re-adding c5 later must re-assemble it
    state = spark.read.parquet(os.path.join(out, "assembled", "state"))
    assert state.filter("conv_id = 'c5'").count() == 0
    _write_output(spark, tmp_path, v1)
    res3 = assembly_tick(spark, out)
    assert res3["changed_convs"] == 3  # c2 + c4 revert, c5 reappears
    assert _stored(spark, out) == _oneshot(v1)


def test_metadata_only_edit_triggers_reassembly(spark, tmp_path):
    """A role flip changes the rendered doc even with identical text —
    the fingerprint must catch it."""
    v1 = _corpus_v1(spark)
    out = _write_output(spark, tmp_path, v1)
    assembly_tick(spark, out)
    v2 = v1.withColumn(
        "role",
        F.when(
            (F.col("conv_id") == "c0") & (F.col("turn_idx") == 0), F.lit("system")
        ).otherwise(F.col("role")),
    )
    _write_output(spark, tmp_path, v2)
    res = assembly_tick(spark, out)
    assert res["changed_convs"] == 1
    assert _stored(spark, out)["c0"][0].startswith("<|system|>")


def test_fingerprint_partition_stable_and_null_safe(spark):
    rows = [("c", 0, None, None), ("c", 1, "user", ""), ("d", 0, "u", "x")]
    df = spark.createDataFrame(rows, SCHEMA)
    base = {
        r["conv_id"]: r["conv_sha"]
        for r in conversation_fingerprints(df, text_col="extracted").collect()
    }
    resh = {
        r["conv_id"]: r["conv_sha"]
        for r in conversation_fingerprints(
            df.repartition(7), text_col="extracted"
        ).collect()
    }
    assert base == resh
    # NULL text and empty text are distinct digests (flagged, no sentinel)
    flipped = spark.createDataFrame(
        [("c", 0, None, ""), ("c", 1, "user", None), ("d", 0, "u", "x")], SCHEMA
    )
    other = {
        r["conv_id"]: r["conv_sha"]
        for r in conversation_fingerprints(flipped, text_col="extracted").collect()
    }
    assert other["c"] != base["c"] and other["d"] == base["d"]


def test_params_drift_and_dirty_refusals(spark, tmp_path):
    v1 = _corpus_v1(spark)
    out = _write_output(spark, tmp_path, v1)
    assembly_tick(spark, out, max_turns=None)
    with pytest.raises(ValueError, match="drifted"):
        assembly_tick(spark, out, max_turns=2)
    meta = os.path.join(out, "assembled", "_assembly_meta.json")
    with open(meta) as f:
        m = json.load(f)
    m["dirty"] = True
    with open(meta, "w") as f:
        json.dump(m, f)
    with pytest.raises(RuntimeError, match="DIRTY"):
        assembly_tick(spark, out)


def test_max_turns_param_respected(spark, tmp_path):
    v1 = _corpus_v1(spark)
    out = _write_output(spark, tmp_path, v1)
    res = assembly_tick(spark, out, max_turns=2)
    assert res["changed_convs"] == 6
    docs = _stored(spark, out)
    assert all(v[1] == 2 for v in docs.values())


def test_cli_assemble_store_standalone_and_composed(spark, tmp_path, capsys):
    """--assemble-store: standalone tick over an existing output, then an
    --incremental crawl loop with the assembly tick composed onto it."""
    from fscrawler_spark.cli import main
    from fscrawler_spark.config import ExtractSettings
    from fscrawler_spark.datagen import generate_transcripts
    from fscrawler_spark.plans.pipeline import run_extraction_job

    data = generate_transcripts(str(tmp_path / "data"), n_turns=400, seed=21)
    out = str(tmp_path / "out")
    run_extraction_job(spark, data["transcripts"], out, ExtractSettings(num_buckets=4))

    rc = main(["--output", out, "--assemble-store"], spark=spark)
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["assembled"]
    assert res["bootstrap"] is True and res["convs_total"] > 0
    docs = spark.read.parquet(os.path.join(out, "assembled", "docs"))
    assert docs.count() == res["convs_total"]

    # composed with an incremental tick: unchanged input -> no-op store tick
    rc = main(
        ["--input", data["transcripts"], "--output", out, "--incremental",
         "--num-buckets", "4", "--assemble-store"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["assembled"]
    assert res == {
        "bootstrap": False, "changed_convs": 0, "removed_convs": 0,
        "convs_total": docs.count(),
    }

    # exclusivity: store tick cannot ride a read-only/one-shot verb
    assert main(["--output", out, "--assemble-store", "--doctor"], spark=spark) == 2
    assert main(["--input", data["transcripts"], "--output", out,
                 "--assemble-store", "--clean-text"], spark=spark) == 2


def test_cli_standalone_ticks_both_stores(spark, tmp_path, capsys):
    """--near-dup --assemble-store with only --output must tick BOTH
    stores (not return after the first), and crawl-shaped flags without
    --input are rejected, not silently dropped."""
    from fscrawler_spark.cli import main
    from fscrawler_spark.config import ExtractSettings
    from fscrawler_spark.datagen import generate_transcripts
    from fscrawler_spark.plans.pipeline import run_extraction_job

    data = generate_transcripts(str(tmp_path / "data"), n_turns=200, seed=33)
    out = str(tmp_path / "out")
    run_extraction_job(spark, data["transcripts"], out, ExtractSettings(num_buckets=4))

    rc = main(["--output", out, "--near-dup", "--assemble-store"], spark=spark)
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["near_dup"]["bootstrap"] is True
    assert res["assembled"]["bootstrap"] is True

    for flags in (["--incremental"], ["--restart"], ["--loop", "3"]):
        assert main(["--output", out, "--assemble-store", *flags], spark=spark) == 2
        assert "need --input" in capsys.readouterr().err


def test_doctor_checks_assembly_store(spark, tmp_path):
    """The output doctor flags a dirty assembly store and docs/state
    coverage mismatches, and blesses a healthy one."""
    from fscrawler_spark.config import ExtractSettings
    from fscrawler_spark.datagen import generate_transcripts
    from fscrawler_spark.plans.doctor import check_output
    from fscrawler_spark.plans.pipeline import run_extraction_job

    data = generate_transcripts(str(tmp_path / "data"), n_turns=200, seed=44)
    out = str(tmp_path / "out")
    run_extraction_job(spark, data["transcripts"], out, ExtractSettings(num_buckets=4))
    codes = lambda res: {f["code"] for f in res["findings"]}
    assembly_tick(spark, out)
    res = check_output(spark, out)
    assert res["ok"] is True
    assert not any(c.startswith("assembly") for c in codes(res))

    # torn upsert: a docs row whose conversation has no state row
    extra = spark.createDataFrame(
        [("ghost", "<|u|>\nx", 1, 8, 0)],
        "conv_id string, doc string, n_turns long, n_chars long, db int",
    )
    extra.write.mode("append").partitionBy("db").parquet(
        os.path.join(out, "assembled", "docs")
    )
    res = check_output(spark, out)
    assert "assembly_docs_without_state" in codes(res) and res["ok"] is False

    # dirty marker
    meta = os.path.join(out, "assembled", "_assembly_meta.json")
    with open(meta) as f:
        m = json.load(f)
    m["dirty"] = True
    with open(meta, "w") as f:
        json.dump(m, f)
    res = check_output(spark, out)
    assert "assembly_store_dirty" in codes(res) and res["ok"] is False


def test_store_tool_param(spark, tmp_path):
    """tool_col is a store param: it renders into docs, rides the
    fingerprint (a tool edit re-assembles), and drifting it refuses."""
    rows = [
        ("c", 0, "user", "ask", None),
        ("c", 1, "assistant", "do", "search"),
        ("d", 0, "assistant", "plain", None),
    ]
    sch = "conv_id string, turn_idx int, role string, extracted string, tool string"
    out = str(tmp_path / "out")
    spark.createDataFrame(rows, sch).write.parquet(os.path.join(out, "docs"))
    res = assembly_tick(spark, out, tool_col="tool")
    assert res["changed_convs"] == 2
    assert "tool=search" in _stored(spark, out)["c"][0]
    # tool edit on an otherwise identical turn -> that conv re-assembles
    rows2 = [r if r[0] != "c" or r[1] != 1 else ("c", 1, "assistant", "do", "browse")
             for r in rows]
    spark.createDataFrame(rows2, sch).write.mode("overwrite").parquet(
        os.path.join(out, "docs")
    )
    res = assembly_tick(spark, out, tool_col="tool")
    assert res["changed_convs"] == 1
    assert "tool=browse" in _stored(spark, out)["c"][0]
    with pytest.raises(ValueError, match="drifted"):
        assembly_tick(spark, out)  # tool_col=None drifts


def test_tick_refuses_schema_gaps_cleanly(spark, tmp_path, capsys):
    """A docs table missing turn columns (or the tool column with
    tool_col) refuses with ValueError — and exits 2 through the CLI —
    instead of an AnalysisException traceback mid-plan."""
    from fscrawler_spark.cli import main

    bare = str(tmp_path / "bare")
    spark.createDataFrame(
        [(0, "c", "x")], "doc_id long, conv_id string, extracted string"
    ).write.parquet(os.path.join(bare, "docs"))
    with pytest.raises(ValueError, match="missing"):
        assembly_tick(spark, bare)
    assert main(["--output", bare, "--assemble-store"], spark=spark) == 2
    assert "missing" in capsys.readouterr().err
    # tool_col missing is the same contract
    v1 = _corpus_v1(spark)
    out = _write_output(spark, tmp_path, v1)
    with pytest.raises(ValueError, match="tool"):
        assembly_tick(spark, out, tool_col="tool")
    assert main(["--output", out, "--assemble-store", "--assemble-tools"],
                spark=spark) == 2
