"""Third round-5 self-review pass (adversarial review over the
snapshot-table tier diff). Fixes under test:

1. **Table lineage identity (``table_uuid``).** Snapshot ids are
   table-local, so a drop-and-recreate at the SAME root can reach a
   ``current_id()`` that coincidentally matches a recorded diff base or
   publish correspondence — the root+id check alone would then
   manifest-diff (or delta-publish onto) an unrelated lineage and
   silently corrupt the output. Every commit now carries a lineage uuid
   (minted at the first commit, carried forward verbatim), and both the
   tick's diff-base guard and ``_publish_to_table``'s in-sync check pin
   to it; legacy records/tables without the field keep the old check.
2. **NULL keys refuse loudly in every keyed mutation.** A range join /
   anti-join can never match NULL, so ``upsert`` silently DUPLICATED a
   NULL-key row on every call and ``delete_rows`` was a permanent no-op
   for it — now both raise, like the duplicate-key check.
3. **upsert/delete_rows delegate to apply_delta** — one implementation
   of the MERGE core (behavior pinned by the existing suites).
4. **GC verbs survive concurrent expiry**: ``remove_orphans`` /
   ``expire_unreferenced`` racing another expire no longer die on
   FileNotFoundError for a manifest that vanished between the listing
   and the read.
5. **Reserved manifest keys in ``extra`` refuse** instead of clobbering
   the file list / schema.
6. **CLI ``--table-keys`` that normalizes to empty exits 2** with a
   clear message (previously an IndexError traceback or a misleading
   "duplicate keys" error).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from fscrawler_spark.config import ExtractSettings
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
            dt.datetime(2026, 3, 1) + dt.timedelta(minutes=i),
        )
        for i in range(n)
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def _recreate(root, spark, rows_per_commit):
    """Drop the table at root and rebuild a NEW lineage with one commit
    per rows_per_commit entry (so current_id can be steered to collide
    with the old lineage's)."""
    import shutil

    shutil.rmtree(root)
    t = SnapshotTable(root)
    for rows in rows_per_commit:
        t.append(spark, _df(spark, rows).coalesce(1))
    return t


# -- 1. table_uuid lineage identity -------------------------------------


def test_table_uuid_minted_once_and_carried(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.overwrite(spark, _df(spark, _rows("a", 4)))
    u1 = t.table_uuid()
    assert u1
    t.append(spark, _df(spark, _rows("b", 3)))
    t.compact(spark)
    t.rollback(spark, 1)
    assert t.table_uuid() == u1
    # every historical manifest in the lineage carries the same uuid
    for sid in t.snapshot_ids():
        assert t.manifest(sid)["table_uuid"] == u1


def test_table_uuid_changes_on_recreate(spark, tmp_path):
    root = str(tmp_path / "t")
    t = SnapshotTable(root)
    t.overwrite(spark, _df(spark, _rows("a", 4)))
    u1 = t.table_uuid()
    t2 = _recreate(root, spark, [_rows("b", 4)])
    assert t2.table_uuid() and t2.table_uuid() != u1


def test_legacy_manifest_without_uuid_gets_one_on_next_commit(spark, tmp_path):
    import json

    t = SnapshotTable(str(tmp_path / "t"))
    t.overwrite(spark, _df(spark, _rows("a", 4)))
    # simulate a legacy lineage: strip the field from the current manifest
    p = t._manifest_path(1)
    m = json.load(open(p))
    del m["table_uuid"]
    json.dump(m, open(p, "w"))
    assert t.table_uuid() is None
    t.append(spark, _df(spark, _rows("b", 3)))
    assert t.table_uuid()  # minted on first contact


def test_tick_full_diffs_after_recreate_at_same_root(spark, tmp_path):
    """The corruption the uuid exists to stop: recreate the input table
    at the same root with MORE snapshots than the recorded base, tick —
    a root-only guard would diff(base, current) on the NEW lineage and
    miss every row that differs but lives in files untouched since the
    new lineage's snapshot <base>. The tick must detect the lineage
    change, full-diff, and leave the output == new table."""
    root = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    t = SnapshotTable(root)
    t.append(spark, _df(spark, _rows("old", 6)).coalesce(1))
    run_extraction_job(spark, f"snap:{root}", out, SETTINGS)
    base = CheckpointManifest.load_or_create(os.path.join(out, "_checkpoint.json")).input_snapshot
    assert base and base["snapshot_id"] == 1 and base.get("table_uuid")
    # new lineage: snapshot 1 = different rows, snapshot 2 = an append
    # whose files would be the ONLY thing a bogus diff(1, 2) reads
    t2 = _recreate(root, spark, [_rows("newA", 5), _rows("newB", 3)])
    res = run_incremental_update(spark, f"snap:{root}", out, SETTINGS)
    assert res["layout"] in ("parquet", "bucketed")  # NOT snapshot-diff
    got = sorted(
        (r.conv_id, r.turn_idx)
        for r in spark.read.parquet(os.path.join(out, "docs")).collect()
    )
    want = sorted(
        [("newA", i) for i in range(5)] + [("newB", i) for i in range(3)]
    )
    assert got == want  # no 'old' stragglers, nothing missing
    # correspondence re-recorded against the NEW lineage
    rec = CheckpointManifest.load_or_create(os.path.join(out, "_checkpoint.json")).input_snapshot
    assert rec["table_uuid"] == t2.table_uuid()
    # and the next tick snapdiffs again
    res2 = run_incremental_update(spark, f"snap:{root}", out, SETTINGS)
    assert res2["layout"] == "snapshot-diff"


def test_publish_bootstraps_after_results_table_recreate(spark, tmp_path):
    """Same hole on the publish side: recreate the RESULTS table at the
    same root and steer its current_id to match the recorded publish —
    the next publish must detect the lineage change and bootstrap (full
    overwrite), never delta-apply onto the impostor."""
    inp = str(tmp_path / "in.parquet")
    out = str(tmp_path / "out")
    tbl = str(tmp_path / "pub")
    _df(spark, _rows("a", 6)).write.parquet(inp)
    res = run_extraction_job(spark, inp, out, SETTINGS, publish_table=tbl)
    assert res["published"]["mode"] == "bootstrap"
    sid = res["published"]["snapshot_id"]
    # impostor with the SAME current_id but unrelated contents
    _recreate(tbl, spark, [_rows("imp", 2)][: sid])
    t2 = SnapshotTable(tbl)
    assert t2.current_id() == sid
    _df(spark, _rows("a", 6, text="EDIT")).write.mode("overwrite").parquet(inp)
    res2 = run_incremental_update(
        spark, inp, out, SETTINGS, publish_table=tbl
    )
    assert res2["published"]["mode"] == "bootstrap"
    got = {r.conv_id for r in t2.read(spark).select("conv_id").collect()}
    assert got == {"a"}  # impostor rows fully replaced


# -- 2. NULL-key refusal -------------------------------------------------


@pytest.fixture()
def small_table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.overwrite(spark, _df(spark, _rows("a", 4)))
    return t


def test_upsert_refuses_null_keys(spark, small_table):
    nullable = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    bad = spark.createDataFrame(
        [(None, 0, "user", "x", None, dt.datetime(2026, 3, 1))], nullable
    )
    with pytest.raises(ValueError, match="NULL in key column"):
        small_table.upsert(spark, bad)
    # mixed batch (valid rows + one NULL key) refuses too
    mixed = spark.createDataFrame(_rows("b", 2), nullable).unionByName(bad)
    with pytest.raises(ValueError, match="NULL in key column"):
        small_table.upsert(spark, mixed)


def test_delete_refuses_null_keys(spark, small_table):
    bad = spark.createDataFrame(
        [("a", None)], "conv_id string, turn_idx int"
    )
    with pytest.raises(ValueError, match="NULL in key column"):
        small_table.delete_rows(spark, bad)


def test_apply_delta_refuses_null_keys_on_either_side(spark, small_table):
    bad_keys = spark.createDataFrame([(None, 1)], "conv_id string, turn_idx int")
    with pytest.raises(ValueError, match="NULL in key column"):
        small_table.apply_delta(spark, None, bad_keys)
    bad_up = spark.createDataFrame(
        [(None, 0, "user", "x", None, dt.datetime(2026, 3, 1))],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    with pytest.raises(ValueError, match="NULL in key column"):
        small_table.apply_delta(spark, bad_up, None)


def test_duplicate_keys_still_refuse(spark, small_table):
    dup = _df(spark, _rows("a", 2) + _rows("a", 2))
    with pytest.raises(ValueError, match="duplicate keys"):
        small_table.upsert(spark, dup)


def test_empty_keys_refuse(spark, small_table):
    with pytest.raises(ValueError, match="at least one key"):
        small_table.upsert(spark, _df(spark, _rows("b", 2)), keys=())


# -- 3. delegation keeps the MERGE contract ------------------------------


def test_upsert_and_delete_still_prune_and_merge(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark, _df(spark, _rows("a", 4)).coalesce(1))
    t.append(spark, _df(spark, _rows("z", 4)).coalesce(1))
    res = t.upsert(
        spark, _df(spark, [("a", 1, "user", "EDIT", None, dt.datetime(2026, 3, 1))])
    )
    assert res["files_rewritten"] == 1  # stats-pruned: only a's file
    texts = {
        (r.conv_id, r.turn_idx): r.text for r in t.read(spark).collect()
    }
    assert texts[("a", 1)] == "EDIT" and len(texts) == 8
    res2 = t.delete_rows(
        spark, spark.createDataFrame([("z", 0)], "conv_id string, turn_idx int")
    )
    assert res2["files_rewritten"] == 1
    assert t.read(spark).count() == 7
    # declarative no-op: keys that hit nothing rewrite nothing
    res3 = t.delete_rows(
        spark, spark.createDataFrame([("q", 9)], "conv_id string, turn_idx int")
    )
    assert res3["files_rewritten"] == 0


# -- 4. GC verbs survive concurrent expiry --------------------------------


def test_remove_orphans_skips_concurrently_expired_manifest(
    spark, tmp_path, monkeypatch
):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark, _df(spark, _rows("a", 3)).coalesce(1))
    t.append(spark, _df(spark, _rows("b", 3)).coalesce(1))
    # stale listing: the racer expired v1 between our listdir and read
    real_ids = SnapshotTable.snapshot_ids

    def stale_ids(self):
        ids = real_ids(self)
        return ([1] + ids) if 1 not in ids else ids

    os.remove(t._manifest_path(1))
    monkeypatch.setattr(SnapshotTable, "snapshot_ids", stale_ids)
    # must not raise; v2's files stay referenced and survive
    t.remove_orphans(older_than_s=0)
    assert t.read(spark).count() == 6


def test_expire_unreferenced_skips_concurrently_expired_manifest(
    spark, tmp_path, monkeypatch
):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark, _df(spark, _rows("a", 3)).coalesce(1))
    t.append(spark, _df(spark, _rows("b", 3)).coalesce(1))
    t.append(spark, _df(spark, _rows("c", 3)).coalesce(1))
    real_files = SnapshotTable.files
    state = {"raced": False}

    def racing_files(self, snapshot_id=None, predicates=None):
        # the racer expires v1 right as WE go to read it
        if snapshot_id == 1 and not state["raced"]:
            state["raced"] = True
            os.remove(self._manifest_path(1))
        return real_files(self, snapshot_id, predicates)

    monkeypatch.setattr(SnapshotTable, "files", racing_files)
    t.expire_unreferenced(keep_snapshots=1)
    assert state["raced"]
    assert t.snapshot_ids() == [3]
    assert t.read(spark).count() == 9  # current snapshot intact


# -- 5. reserved extra keys ------------------------------------------------


def test_reserved_extra_keys_refuse(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    with pytest.raises(ValueError, match="reserved manifest key"):
        t.overwrite(spark, _df(spark, _rows("a", 2)), extra={"files": 12})
    t.overwrite(spark, _df(spark, _rows("a", 2)), extra={"run": "ok"})
    assert t.history()[-1]["summary"]["run"] == "ok"


# -- 6. CLI --table-keys validation ----------------------------------------


def test_cli_empty_table_keys_exits_2(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    t = SnapshotTable(str(tmp_path / "t"))
    t.overwrite(spark, _df(spark, _rows("a", 3)))
    delta = str(tmp_path / "delta.parquet")
    _df(spark, _rows("a", 1, text="EDIT")).write.parquet(delta)
    rc = main(
        [
            "--output",
            t.root,
            "--table-upsert",
            delta,
            "--table-keys",
            ",",
        ],
        spark=spark,
    )
    assert rc == 2
    assert "at least one column" in capsys.readouterr().err
