"""Round 5: publishing extraction output to a snapshot table.

The north rule's write-back leg — "writes results back to a partitioned
Iceberg table" — for the BATCH path (streaming got its per-epoch table
commits earlier this round). Contract under test:

* a full run with ``publish_table=`` bootstraps the table as ONE
  clustered overwrite whose contents equal the output docs exactly;
* an incremental tick delta-publishes: ONE atomic stats-pruned
  MERGE+DELETE commit (SnapshotTable.apply_delta) carrying exactly the
  tick's delta — changed/added rows upsert, vanished keys delete, and
  PURGED keys (changed rows the filters now exclude) delete too;
* the correspondence is tracked in the checkpoint manifest
  (``published``): a mutating tick that skips publishing clears it, an
  externally-advanced table invalidates it — either way the next
  publish re-bootstraps instead of silently missing a delta;
* a no-op tick over an in-sync table commits nothing.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.config import ExtractSettings
from fscrawler_spark.plans.checkpoint import CheckpointManifest
from fscrawler_spark.plans.pipeline import run_extraction_job, run_incremental_update
from fscrawler_spark.plans.snapshot_table import SnapshotTable

SETTINGS = ExtractSettings(num_buckets=8, skew_salt=4)


def _docs_rows(spark, out):
    return (
        spark.read.parquet(os.path.join(out, "docs"))
        .drop("spans", "meta")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )


def _published(out):
    with open(os.path.join(out, "_checkpoint.json")) as f:
        return json.load(f).get("published")


def _mutate_input(spark, inp_v1, out_path):
    """v2: one conversation deleted, some turns changed, a new conv added."""
    src = spark.read.parquet(inp_v1)
    victim = src.select("conv_id").orderBy("conv_id").first()["conv_id"]
    kept = src.filter(F.col("conv_id") != victim)
    changed = kept.withColumn(
        "text",
        F.when(
            F.col("turn_idx") % 17 == 3, F.concat(F.col("text"), F.lit(" PUBLISH TAIL"))
        ).otherwise(F.col("text")),
    )
    new_rows = spark.createDataFrame(
        [("conv-pub-new", i, "user", f"published new turn {i}", None, None) for i in range(5)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    changed.unionByName(new_rows).write.mode("overwrite").parquet(out_path)
    return victim


@pytest.fixture()
def base(spark, transcripts_dir, tmp_path):
    inp = os.path.join(transcripts_dir, "transcripts.parquet")
    out = str(tmp_path / "out")
    tbl = str(tmp_path / "pub_tbl")
    res = run_extraction_job(spark, inp, out, SETTINGS, publish_table=tbl)
    return inp, out, tbl, res


def test_full_run_publish_bootstraps(spark, base):
    inp, out, tbl, res = base
    assert res["published"]["mode"] == "bootstrap"
    t = SnapshotTable(tbl)
    assert t.current_id() == res["published"]["snapshot_id"]
    assert _published(out) == {
        "root": os.path.abspath(tbl),
        "snapshot_id": t.current_id(),
        "table_uuid": t.table_uuid(),
    }
    docs = _docs_rows(spark, out)
    cols = [c for c in spark.read.parquet(os.path.join(out, "docs")).columns if c not in ("spans", "meta")]
    got = t.read(spark).select(*cols).orderBy("conv_id", "turn_idx").collect()
    assert got == docs


def test_tick_publish_applies_delta_atomically(spark, base, tmp_path):
    inp, out, tbl, _ = base
    t = SnapshotTable(tbl)
    hist_before = len(t.history())
    inp_v2 = str(tmp_path / "v2.parquet")
    victim = _mutate_input(spark, inp, inp_v2)

    res = run_incremental_update(spark, inp_v2, out, SETTINGS, publish_table=tbl)
    pub = res["published"]
    assert pub["mode"] == "delta"
    # ONE commit for the whole tick (merge + delete together)
    assert len(t.history()) == hist_before + 1
    # stats pruning: the delta rewrote at most the whole file set
    assert pub["files_rewritten"] >= 1
    # table == output docs, row for row
    cols = [c for c in spark.read.parquet(os.path.join(out, "docs")).columns if c not in ("spans", "meta")]
    got = t.read(spark).select(*cols).orderBy("conv_id", "turn_idx").collect()
    assert got == _docs_rows(spark, out)
    # the deleted conversation is gone from the table
    assert t.read(spark).filter(F.col("conv_id") == victim).count() == 0
    # the tick's counters ride the snapshot manifest (summary analog)
    m = t.manifest()
    assert m["published_by"] == res["run_id"]
    assert m["changed"] == res["changed"] and m["deleted"] == res["deleted"]
    # recorded correspondence advanced
    assert _published(out)["snapshot_id"] == t.current_id()


def test_delta_publish_prunes_files(spark, base, tmp_path):
    """A single-conversation change must NOT rewrite the whole clustered
    table — the stats-pruned MERGE touches a strict subset of files."""
    inp, out, tbl, _ = base
    t = SnapshotTable(tbl)
    files_total = len(t.files())
    src = spark.read.parquet(inp)
    victim = src.select("conv_id").orderBy("conv_id").first()["conv_id"]
    inp_v2 = str(tmp_path / "v2.parquet")
    src.withColumn(
        "text",
        F.when(F.col("conv_id") == victim, F.concat(F.col("text"), F.lit(" X"))).otherwise(
            F.col("text")
        ),
    ).write.mode("overwrite").parquet(inp_v2)

    res = run_incremental_update(spark, inp_v2, out, SETTINGS, publish_table=tbl)
    pub = res["published"]
    assert pub["mode"] == "delta"
    if files_total > 1:
        assert 0 < pub["files_rewritten"] < files_total


def test_noop_tick_publish_commits_nothing(spark, base):
    inp, out, tbl, _ = base
    t = SnapshotTable(tbl)
    before = t.current_id()
    res = run_incremental_update(spark, inp, out, SETTINGS, publish_table=tbl)
    assert res["published"]["mode"] == "noop"
    assert t.current_id() == before
    assert _published(out)["snapshot_id"] == before


def test_unpublished_mutating_tick_clears_then_rebootstraps(spark, base, tmp_path):
    inp, out, tbl, _ = base
    inp_v2 = str(tmp_path / "v2.parquet")
    _mutate_input(spark, inp, inp_v2)
    # mutating tick WITHOUT publish: correspondence must clear
    run_incremental_update(spark, inp_v2, out, SETTINGS)
    assert _published(out) is None
    # next published tick may not delta (it would miss the skipped tick):
    # it must bootstrap, and converge to the output exactly
    res = run_incremental_update(spark, inp_v2, out, SETTINGS, publish_table=tbl)
    assert res["published"]["mode"] == "bootstrap"
    t = SnapshotTable(tbl)
    cols = [c for c in spark.read.parquet(os.path.join(out, "docs")).columns if c not in ("spans", "meta")]
    got = t.read(spark).select(*cols).orderBy("conv_id", "turn_idx").collect()
    assert got == _docs_rows(spark, out)


def test_crash_between_tick_mutation_and_publish_rebootstraps(spark, base, tmp_path, monkeypatch):
    """Crash-consistency: the tick clears the published record DURABLY
    before its first mutation (mirroring the full run's first-write
    clear). A crash landing between the bucket swaps and
    _publish_to_table must leave published=None on disk so the re-run
    bootstraps — NOT a stale record whose id still matches the table,
    which would make the re-run compute an empty delta vs the already-
    mutated output and silently drop the crashed tick's rows forever."""
    import fscrawler_spark.plans.pipeline as pl

    inp, out, tbl, _ = base
    t = SnapshotTable(tbl)
    id_before = t.current_id()
    inp_v2 = str(tmp_path / "v2.parquet")
    _mutate_input(spark, inp, inp_v2)

    real = pl._publish_to_table

    def boom(*a, **k):
        raise RuntimeError("simulated crash before publish")

    monkeypatch.setattr(pl, "_publish_to_table", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_incremental_update(spark, inp_v2, out, SETTINGS, publish_table=tbl)
    # the output HAS mutated, the table has not — and the durable clear
    # already fired, so no stale correspondence survives the crash
    assert t.current_id() == id_before
    assert _published(out) is None

    # recovery: the same tick re-runs; with the record gone the publish
    # bootstraps and the table converges to the post-tick output exactly
    monkeypatch.setattr(pl, "_publish_to_table", real)
    res = run_incremental_update(spark, inp_v2, out, SETTINGS, publish_table=tbl)
    assert res["published"]["mode"] == "bootstrap"
    cols = [c for c in spark.read.parquet(os.path.join(out, "docs")).columns if c not in ("spans", "meta")]
    got = t.read(spark).select(*cols).orderBy("conv_id", "turn_idx").collect()
    assert got == _docs_rows(spark, out)
    assert _published(out)["snapshot_id"] == t.current_id()


def test_mutating_tick_publish_keeps_delta_mode(spark, base, tmp_path):
    """The pre-mutation clear must NOT demote the surviving path to
    bootstrap: a normal mutating tick still publishes mode='delta'
    (validated against the captured pre-mutation record)."""
    inp, out, tbl, _ = base
    inp_v2 = str(tmp_path / "v2.parquet")
    _mutate_input(spark, inp, inp_v2)
    res = run_incremental_update(spark, inp_v2, out, SETTINGS, publish_table=tbl)
    assert res["published"]["mode"] == "delta"
    # and a second mutating tick (fresh delta) also stays delta
    inp_v3 = str(tmp_path / "v3.parquet")
    src = spark.read.parquet(inp_v2)
    src.withColumn(
        "text",
        F.when(F.col("turn_idx") % 23 == 5, F.concat(F.col("text"), F.lit(" V3"))).otherwise(
            F.col("text")
        ),
    ).write.mode("overwrite").parquet(inp_v3)
    res3 = run_incremental_update(spark, inp_v3, out, SETTINGS, publish_table=tbl)
    assert res3["published"]["mode"] == "delta"
    t = SnapshotTable(tbl)
    cols = [c for c in spark.read.parquet(os.path.join(out, "docs")).columns if c not in ("spans", "meta")]
    got = t.read(spark).select(*cols).orderBy("conv_id", "turn_idx").collect()
    assert got == _docs_rows(spark, out)


def test_externally_advanced_table_forces_bootstrap(spark, base, tmp_path):
    inp, out, tbl, _ = base
    t = SnapshotTable(tbl)
    # an external writer appends a row: recorded id != current id
    extra = spark.createDataFrame(
        [("conv-ext", 0, "user", "external row", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    t.append(spark, extra)
    inp_v2 = str(tmp_path / "v2.parquet")
    _mutate_input(spark, inp, inp_v2)
    res = run_incremental_update(spark, inp_v2, out, SETTINGS, publish_table=tbl)
    assert res["published"]["mode"] == "bootstrap"
    # the external row is NOT extraction output: the bootstrap overwrote it
    assert t.read(spark).filter(F.col("conv_id") == "conv-ext").count() == 0


def test_purged_rows_are_deleted_from_the_table(spark, transcripts_dir, tmp_path):
    """A changed row the filters now exclude (size gate) must vanish from
    the published table, not linger as a stale copy."""
    settings = ExtractSettings(num_buckets=8, skew_salt=4, ignore_above=100_000)
    inp = os.path.join(transcripts_dir, "transcripts.parquet")
    out = str(tmp_path / "out")
    tbl = str(tmp_path / "tbl")
    run_extraction_job(spark, inp, out, settings, publish_table=tbl)
    t = SnapshotTable(tbl)
    src = spark.read.parquet(inp)
    victim = src.orderBy("conv_id", "turn_idx").first()
    assert (
        t.read(spark)
        .filter((F.col("conv_id") == victim["conv_id"]) & (F.col("turn_idx") == victim["turn_idx"]))
        .count()
        == 1
    )
    inp_v2 = str(tmp_path / "v2.parquet")
    src.withColumn(
        "text",
        F.when(
            (F.col("conv_id") == victim["conv_id"]) & (F.col("turn_idx") == victim["turn_idx"]),
            F.lit("Z" * 150_000),
        ).otherwise(F.col("text")),
    ).write.mode("overwrite").parquet(inp_v2)
    res = run_incremental_update(spark, inp_v2, out, settings, publish_table=tbl)
    assert res["published"]["mode"] == "delta"
    assert (
        t.read(spark)
        .filter((F.col("conv_id") == victim["conv_id"]) & (F.col("turn_idx") == victim["turn_idx"]))
        .count()
        == 0
    )
    # and the table still equals the docs output
    cols = [c for c in spark.read.parquet(os.path.join(out, "docs")).columns if c not in ("spans", "meta")]
    got = t.read(spark).select(*cols).orderBy("conv_id", "turn_idx").collect()
    assert got == _docs_rows(spark, out)


def test_full_rerun_over_published_output_rebootstraps(spark, base, tmp_path):
    """A full (non-virgin) run mutates buckets outside the delta protocol:
    the first wave write clears the correspondence; a publish on the same
    run bootstraps again."""
    inp, out, tbl, _ = base
    t = SnapshotTable(tbl)
    # force a pending bucket so the rerun actually writes
    mpath = os.path.join(out, "_checkpoint.json")
    m = CheckpointManifest.load_or_create(mpath)
    m.completed.discard(0)
    m.save()
    res = run_extraction_job(spark, inp, out, SETTINGS, publish_table=tbl)
    assert res["published"]["mode"] == "bootstrap"
    cols = [c for c in spark.read.parquet(os.path.join(out, "docs")).columns if c not in ("spans", "meta")]
    got = t.read(spark).select(*cols).orderBy("conv_id", "turn_idx").collect()
    assert got == _docs_rows(spark, out)


def test_apply_delta_unit(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(f"c{i}", j, f"v{i}-{j}") for i in range(4) for j in range(3)],
        "conv_id string, turn_idx int, text string",
    )
    t.overwrite(spark, df, cluster_by=("conv_id", "turn_idx"))
    up = spark.createDataFrame(
        [("c1", 0, "EDIT"), ("c9", 0, "NEW")], "conv_id string, turn_idx int, text string"
    )
    dele = spark.createDataFrame([("c2", 1)], "conv_id string, turn_idx int")
    hist = len(t.history())
    res = t.apply_delta(spark, up, dele, extra={"published_by": "unit"})
    assert len(t.history()) == hist + 1  # ONE commit for merge+delete
    got = {(r.conv_id, r.turn_idx): r.text for r in t.read(spark).collect()}
    assert got[("c1", 0)] == "EDIT" and got[("c9", 0)] == "NEW"
    assert ("c2", 1) not in got
    assert len(got) == 12  # 12 - 1 deleted + 1 inserted
    assert t.manifest()["published_by"] == "unit"
    assert 0 < res["files_rewritten"] <= res["files_total"]


def test_apply_delta_refuses_duplicate_upsert_keys(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame([("a", 0, "x")], "conv_id string, turn_idx int, text string")
    t.overwrite(spark, df)
    dup = spark.createDataFrame(
        [("a", 0, "y"), ("a", 0, "z")], "conv_id string, turn_idx int, text string"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        t.apply_delta(spark, dup, None)


def test_apply_delta_pure_delete_and_noop(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [("a", 0, "x"), ("b", 0, "y")], "conv_id string, turn_idx int, text string"
    )
    t.overwrite(spark, df, cluster_by=("conv_id",))
    res = t.apply_delta(
        spark, None, spark.createDataFrame([("a", 0)], "conv_id string, turn_idx int")
    )
    assert {r.conv_id for r in t.read(spark).collect()} == {"b"}
    # declarative no-op: keys that match nothing commit nothing
    before = t.current_id()
    res = t.apply_delta(
        spark, None, spark.createDataFrame([("zz", 9)], "conv_id string, turn_idx int")
    )
    assert res["files_rewritten"] == 0 and t.current_id() == before


def test_cli_publish_table_verb(spark, transcripts_dir, tmp_path):
    from fscrawler_spark.cli import main

    inp = os.path.join(transcripts_dir, "transcripts.parquet")
    out = str(tmp_path / "out")
    tbl = str(tmp_path / "tbl")
    rc = main(
        [
            "--input", inp, "--output", out, "--num-buckets", "8",
            "--publish-table", tbl,
        ],
        spark=spark,
    )
    assert rc == 0
    assert SnapshotTable(tbl).exists()
    rc = main(
        [
            "--input", inp, "--output", out, "--num-buckets", "8",
            "--incremental", "--publish-table", tbl,
        ],
        spark=spark,
    )
    assert rc == 0


def test_curation_verb_reads_published_table(spark, base, tmp_path, capsys):
    """The publish→curate loop: --clean-text consumes the published
    snapshot table directly (bare root with _snap/, or snap:ROOT[@N]
    with time travel), reading ONE consistent snapshot."""
    from fscrawler_spark.cli import main as cli_main

    inp, out, tbl, _ = base
    t = SnapshotTable(tbl)
    base_id = t.current_id()
    n_base = t.read(spark).count()

    # bare table root
    cur1 = str(tmp_path / "cur1")
    assert cli_main(["--input", tbl, "--output", cur1, "--clean-text"], spark=spark) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs"] == n_base
    assert spark.read.parquet(cur1).count() == n_base

    # advance the table with a tick, then time-travel back to the base
    inp_v2 = str(tmp_path / "v2.parquet")
    _mutate_input(spark, inp, inp_v2)
    run_incremental_update(spark, inp_v2, out, SETTINGS, publish_table=tbl)
    assert t.current_id() > base_id
    cur2 = str(tmp_path / "cur2")
    assert (
        cli_main(
            ["--input", f"snap:{tbl}@{base_id}", "--output", cur2, "--clean-text"],
            spark=spark,
        )
        == 0
    )
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2["docs"] == n_base  # pre-tick snapshot, not current

    # errors stay exit-2-with-message: missing table / expired snapshot
    assert (
        cli_main(
            ["--input", f"snap:{tmp_path}/nope", "--output", str(tmp_path / "x"), "--clean-text"],
            spark=spark,
        )
        == 2
    )
    assert "no snapshot table" in capsys.readouterr().err
    assert (
        cli_main(
            ["--input", f"snap:{tbl}@99", "--output", str(tmp_path / "y"), "--clean-text"],
            spark=spark,
        )
        == 2
    )
    assert "99" in capsys.readouterr().err
