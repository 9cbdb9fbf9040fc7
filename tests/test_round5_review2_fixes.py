"""Second round-5 self-review pass (structured review over the full
round-5 diff). Five fixes:

1. The tick's manifest-diff base records TABLE IDENTITY ({root,
   snapshot_id}), not a bare snapshot id — ids are table-local (every
   table numbers from 1), so a tick pointed at a different ``snap:``
   root with a colliding id silently diffed the WRONG table's manifests
   and corrupted the output.
2. ``sft_examples(context_turns=None)``'s overflow guard is null-safe:
   a NULL-role turn past the limit used to fall through ``!=`` (NULL)
   into the raise even though the downstream target-role filter drops
   that row anyway.
3. ``SnapshotTable.read(snapshot_id=None)`` resolves "current" ONCE —
   previously the file list and the schema came from two separate
   manifest reads, so a commit racing in between bound snapshot N's
   files to snapshot N+1's schema.
4. Publishing a legitimately EMPTIED output (a tick's deletions removed
   the last rows) with a broken correspondence bootstraps an EMPTY
   table overwrite instead of wedging on "nothing to bootstrap" —
   which stranded the deleted rows in the table forever.
5. Timestamp footer stats are stored fixed-precision
   (``isoformat(timespec='microseconds')``) and predicate literals are
   normalized the same way — a whole-second max used to serialize
   without the ".000000" suffix, breaking the lexical==chronological
   ordering pruning relies on (a file containing the exact predicate
   instant could be pruned).
"""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.config import ExtractSettings
from fscrawler_spark.functions.assembly import sft_examples
from fscrawler_spark.plans.checkpoint import CheckpointManifest
from fscrawler_spark.plans.pipeline import run_extraction_job, run_incremental_update
from fscrawler_spark.plans.snapshot_table import SnapshotTable, file_may_match
from fscrawler_spark.sources.transcripts import TRANSCRIPT_SCHEMA

SETTINGS = ExtractSettings(num_buckets=8, skew_salt=4)


def _rows(conv, n, text="orig", role=None):
    return [
        (
            conv,
            i,
            role if role is not None else ("user" if i % 2 == 0 else "assistant"),
            f"{text} {conv} {i}",
            None,
            dt.datetime(2026, 2, 1) + dt.timedelta(minutes=i),
        )
        for i in range(n)
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def _docs_sorted(spark, out):
    return (
        spark.read.parquet(os.path.join(out, "docs"))
        .drop("spans", "meta")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )


def _manifest(out):
    return CheckpointManifest.load_or_create(os.path.join(out, "_checkpoint.json"))


# ---------------------------------------------------------------- 1 ----


def test_base_from_other_table_full_diffs_not_snapdiffs(spark, tmp_path):
    """Two tables, colliding snapshot ids: the tick must NOT manifest-diff
    table B against a base recorded for table A — it full-diffs,
    converges to extraction(B), and re-records the base against B."""
    a = SnapshotTable(str(tmp_path / "ta"))
    a.append(spark, _df(spark, _rows("a-conv0", 6)).coalesce(1))
    b = SnapshotTable(str(tmp_path / "tb"))
    b.append(spark, _df(spark, _rows("b-conv0", 5)).coalesce(1))
    assert a.current_id() == b.current_id()  # ids collide by construction

    out = str(tmp_path / "out")
    run_extraction_job(spark, f"snap:{a.root}", out, SETTINGS)
    rec = _manifest(out).input_snapshot
    assert rec == {
        "root": os.path.abspath(a.root),
        "snapshot_id": a.current_id(),
        "table_uuid": a.table_uuid(),
    }

    # same id, DIFFERENT table: a bare-int base would diff B's manifest 1
    # against itself -> empty delta -> output keeps A's rows (corrupt)
    res = run_incremental_update(spark, f"snap:{b.root}", out, SETTINGS)
    assert res["layout"] in ("parquet", "bucketed")  # forced full diff
    got = _docs_sorted(spark, out)
    assert got and all(r.conv_id == "b-conv0" for r in got)
    assert _manifest(out).input_snapshot == {
        "root": os.path.abspath(b.root),
        "snapshot_id": b.current_id(),
        "table_uuid": b.table_uuid(),
    }
    # and the re-recorded base snapdiffs on the next tick
    res2 = run_incremental_update(spark, f"snap:{b.root}", out, SETTINGS)
    assert res2["layout"] == "snapshot-diff"


def test_legacy_bare_int_base_is_discarded(spark, tmp_path):
    """A pre-fix checkpoint with a bare-int base carries no table
    identity: it must load as None (one full diff re-records)."""
    import json

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark, _df(spark, _rows("c0", 6)).coalesce(1))
    out = str(tmp_path / "out")
    run_extraction_job(spark, f"snap:{t.root}", out, SETTINGS)
    ck = os.path.join(out, "_checkpoint.json")
    d = json.load(open(ck))
    d["input_snapshot"] = t.current_id()  # legacy bare int
    json.dump(d, open(ck, "w"))
    assert _manifest(out).input_snapshot is None
    res = run_incremental_update(spark, f"snap:{t.root}", out, SETTINGS)
    assert res["layout"] in ("parquet", "bucketed")  # no usable base
    assert _manifest(out).input_snapshot == {
        "root": os.path.abspath(t.root),
        "snapshot_id": t.current_id(),
        "table_uuid": t.table_uuid(),
    }


def test_doctor_warns_on_vanished_or_expired_diff_base(spark, tmp_path):
    """--doctor surfaces a recorded diff base whose table is gone or whose
    snapshot was expired: self-healing (the tick full-diffs and
    re-records) but the operator should know a corpus-sized diff is
    coming."""
    import shutil

    from fscrawler_spark.plans.doctor import check_output

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark, _df(spark, _rows("c0", 6)).coalesce(1))
    out = str(tmp_path / "out")
    run_extraction_job(spark, f"snap:{t.root}", out, SETTINGS)
    assert not [
        f for f in check_output(spark, out)["findings"] if f["code"].startswith("diff_base")
    ]

    # expired snapshot (table still exists, base manifest gone)
    t.append(spark, _df(spark, _rows("c1", 3)).coalesce(1))
    t.expire_unreferenced(keep_snapshots=1)
    res = check_output(spark, out)
    assert "diff_base_snapshot_expired" in [f["code"] for f in res["findings"]]
    assert res["ok"]  # WARN, not ERROR

    # vanished table
    shutil.rmtree(t.root)
    res = check_output(spark, out)
    assert "diff_base_table_missing" in [f["code"] for f in res["findings"]]
    assert res["ok"]


# ---------------------------------------------------------------- 2 ----


def test_unbounded_overflow_guard_is_null_role_safe(spark):
    """A NULL-role turn past max_unbounded_context must not raise: it can
    never become an example (the target-role filter drops it)."""
    rows = _rows("c", 8) + [
        ("c", 8, None, "tool output", None, dt.datetime(2026, 2, 1, 1))
    ]
    df = _df(spark, rows)
    got = sft_examples(
        df, context_turns=None, max_unbounded_context=8
    ).collect()
    # assistant turns at idx 1,3,5,7 have prefixes of 1,3,5,7 turns — all
    # within the bound; the NULL-role turn at idx 8 (prefix 8) must be
    # silently excluded, not raised on
    assert {r.turn_idx for r in got} == {1, 3, 5, 7}


def test_unbounded_overflow_guard_still_raises_for_target(spark):
    """The guard still fires when an EMITTED example's prefix overflows."""
    from py4j.protocol import Py4JJavaError

    df = _df(spark, _rows("c", 12))  # assistant at idx 11: prefix 11 > 8
    with pytest.raises(Exception) as ei:
        sft_examples(df, context_turns=None, max_unbounded_context=8).collect()
    assert "max_unbounded_context" in str(ei.value)


# ---------------------------------------------------------------- 3 ----


def test_read_resolves_current_snapshot_once(spark, tmp_path, monkeypatch):
    """read(snapshot_id=None) must pass the RESOLVED id to read_entries —
    never None (which would re-resolve 'current' after a racing commit
    and bind this snapshot's files to a newer snapshot's schema)."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark, _df(spark, _rows("c0", 4)).coalesce(1))
    seen = {}
    real = SnapshotTable.read_entries

    def spy(self, sp, entries, snapshot_id=None):
        seen["sid"] = snapshot_id
        return real(self, sp, entries, snapshot_id=snapshot_id)

    monkeypatch.setattr(SnapshotTable, "read_entries", spy)
    assert t.read(spark).count() == 4
    assert seen["sid"] == t.current_id()  # resolved, not None


# ---------------------------------------------------------------- 4 ----


def test_publish_bootstraps_empty_table_from_emptied_output(spark, tmp_path):
    """Emptied output + broken correspondence (the crash window the
    pre-mutation clear leaves behind): publish must mirror the empty
    output — an empty overwrite — not wedge on 'nothing to bootstrap'."""
    inp = str(tmp_path / "in.parquet")
    _df(spark, _rows("c0", 6)).write.parquet(inp)
    out = str(tmp_path / "out")
    tbl = str(tmp_path / "tbl")
    run_extraction_job(spark, inp, out, SETTINGS, publish_table=tbl)
    t = SnapshotTable(tbl)
    assert t.read(spark).count() == 6

    # tick with an EMPTY input: every row vanishes; publish the deletion
    empty = str(tmp_path / "empty.parquet")
    _df(spark, []).write.parquet(empty)
    res = run_incremental_update(spark, empty, out, SETTINGS, publish_table=tbl)
    assert res["deleted"] == 6
    assert t.read(spark).count() == 0

    # simulate the crash window: correspondence gone, output still empty
    _manifest(out).set_published(None)
    res2 = run_incremental_update(spark, empty, out, SETTINGS, publish_table=tbl)
    assert res2["published"]["mode"] in ("bootstrap", "noop")
    assert t.read(spark).count() == 0
    # and the schema survives for later ticks to evolve from
    assert "conv_id" in [f.name for f in t.schema().fields]


# ---------------------------------------------------------------- 5 ----


def test_whole_second_ts_stats_store_fixed_precision(spark, tmp_path):
    """A ts max landing exactly on a whole second must store with the
    .000000 suffix, and an exact-match predicate (datetime object or
    fixed-precision string) must KEEP the file."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    ts = dt.datetime(2026, 2, 1, 0, 0, 0)  # microsecond == 0
    rows = [("c0", 0, "user", "x", None, ts)]
    t.append(spark, _df(spark, rows).coalesce(1))
    (entry,) = t.files()
    assert entry.stats["ts"]["max"].endswith(".000000")
    assert file_may_match(entry, [("ts", "=", ts)])
    assert file_may_match(entry, [("ts", "=", "2026-02-01T00:00:00.000000")])
    assert file_may_match(entry, [("ts", "between", (ts, ts))])
    # and pruning still prunes: a strictly-later instant misses
    assert not file_may_match(
        entry, [("ts", ">", dt.datetime(2026, 2, 1, 0, 0, 0, 1))]
    )
    # read()-level integration: exact-instant predicate returns the row
    assert t.read(spark, predicates=[("ts", "=", ts)]).count() == 1
