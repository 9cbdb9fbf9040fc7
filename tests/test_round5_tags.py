"""Named snapshot tags (Iceberg tag/ref analog): pin a snapshot under a
stable name, read it forever, and have retention FOLLOW the refs —
expire_unreferenced keeps tagged snapshots and their data files alive
regardless of the keep window, until the tag is dropped. The point at
100 TB: "the exact dataset v3 trained on" is a name, not a snapshot id
someone wrote down, and routine retention can't silently delete it."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.plans.snapshot_table import SnapshotTable

SCHEMA = "conv_id string, turn_idx int, text string"
KEYS = ("conv_id", "turn_idx")


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _base(spark, n=24):
    return spark.range(0, n).select(
        F.concat(F.lit("c"), (F.col("id") % 6).cast("string")).alias("conv_id"),
        (F.col("id") / 6).cast("int").alias("turn_idx"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
    )


def _table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.overwrite(spark, _base(spark), cluster_by=KEYS)
    return t


def test_tag_pins_across_later_commits(spark, tmp_path):
    t = _table(spark, tmp_path)
    assert t.tag("v1") == 1
    v1 = sorted(map(tuple, t.read(spark, tag="v1").collect()))
    t.upsert(spark, _df(spark, [("c0", 0, "edited")]), keys=KEYS)
    t.upsert(spark, _df(spark, [("c9", 0, "born")]), keys=KEYS)
    # the tag still reads the snapshot it pinned, not current
    assert sorted(map(tuple, t.read(spark, tag="v1").collect())) == v1
    assert t.read(spark).count() == 25
    assert t.read(spark, tag="v1").count() == 24
    # explicit pin of an older snapshot by id
    assert t.tag("mid", 2) == 2
    assert t.tags() == {"mid": 2, "v1": 1}
    assert t.resolve_tag("mid") == 2


def test_tag_validation_and_immutability(spark, tmp_path):
    t = _table(spark, tmp_path)
    for bad in ("", "1digitfirst", "has space", "a" * 65, "semi;colon"):
        with pytest.raises(ValueError, match="invalid tag name"):
            t.tag(bad)
    with pytest.raises(FileNotFoundError):  # snapshot must exist
        t.tag("v9", 99)
    t.tag("v1")
    with pytest.raises(ValueError, match="already exists"):
        t.tag("v1", 1)
    t.upsert(spark, _df(spark, [("c0", 0, "v2")]), keys=KEYS)
    assert t.tag("v1", force=True) == 2  # force moves it
    assert t.drop_tag("v1") == 2
    with pytest.raises(FileNotFoundError, match="no tag"):
        t.resolve_tag("v1")
    with pytest.raises(FileNotFoundError, match="no tag"):
        t.drop_tag("v1")
    with pytest.raises(ValueError, match="not both"):
        t.read(spark, snapshot_id=1, tag="x")


def test_expire_keeps_tagged_snapshots(spark, tmp_path):
    """Retention follows the refs: a tagged snapshot (and its files)
    survives any keep window; dropping the tag releases it."""
    t = _table(spark, tmp_path)
    t.tag("pinned")
    v1_files = {e.path for e in t.files(1)}
    for i in range(4):
        t.upsert(spark, _df(spark, [("c0", i, f"v{i}")]), keys=KEYS)
    t.expire_unreferenced(keep_snapshots=1)
    # snapshot 1 is retained by the tag: manifest + files + reads intact
    assert 1 in t.snapshot_ids()
    assert t.read(spark, tag="pinned").count() == 24
    for p in v1_files:
        assert os.path.exists(os.path.join(t.root, p)), p
    # intermediate untagged snapshots are gone
    assert set(t.snapshot_ids()) == {1, t.current_id()}
    # dropping the tag makes it expirable again
    t.drop_tag("pinned")
    t.expire_unreferenced(keep_snapshots=1)
    assert t.snapshot_ids() == [t.current_id()]
    with pytest.raises(FileNotFoundError):
        t.read(spark, snapshot_id=1).count()


def test_dangling_tag_reads_fail_and_doctor_reports(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.upsert(spark, _df(spark, [("c0", 0, "v2")]), keys=KEYS)
    t.tag("old", 1)
    # expire the tagged snapshot OUT-OF-BAND (simulates a forged ref /
    # an external tool's expire that ignores tags)
    os.remove(t._manifest_path(1))
    with pytest.raises(FileNotFoundError):
        t.read(spark, tag="old").count()
    from fscrawler_spark.plans.doctor import check_snapshot_table

    findings = check_snapshot_table(t.root)
    assert any(f["code"] == "table_tag_dangling" for f in findings)


def test_cli_tag_verbs(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    t = _table(spark, tmp_path)
    t.upsert(spark, _df(spark, [("c0", 0, "v2")]), keys=KEYS)
    # tag current
    rc = main(["--output", t.root, "--table-tag", "release"], spark=spark)
    line = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and line["tag"] == "release" and line["snapshot_id"] == 2
    # tag an explicit snapshot with NAME@N
    rc = main(["--output", t.root, "--table-tag", "genesis@1"], spark=spark)
    line = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and line["tag"] == "genesis" and line["snapshot_id"] == 1
    # duplicate refuses without --tag-force
    rc = main(["--output", t.root, "--table-tag", "release"], spark=spark)
    assert rc == 2 and "already exists" in capsys.readouterr().err
    rc = main(
        ["--output", t.root, "--table-tag", "release@1", "--tag-force"], spark=spark
    )
    assert rc == 0 and json.loads(capsys.readouterr().out.strip())["snapshot_id"] == 1
    # history lists tags
    rc = main(["--output", t.root, "--table-history"], spark=spark)
    hist = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and hist["tags"] == {"genesis": 1, "release": 1}
    # drop
    rc = main(["--output", t.root, "--table-drop-tag", "release"], spark=spark)
    line = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and line["dropped_tag"] == "release" and line["was_snapshot"] == 1
    # orphan --tag-force; drop of a missing tag; tag on a non-table
    rc = main(["--output", t.root, "--tag-force"], spark=spark)
    assert rc == 2 and "requires --table-tag" in capsys.readouterr().err
    rc = main(["--output", t.root, "--table-drop-tag", "release"], spark=spark)
    assert rc == 2 and "no tag" in capsys.readouterr().err
    rc = main(
        ["--output", str(tmp_path / "no"), "--table-tag", "x"], spark=spark
    )
    assert rc == 2 and "no snapshot table" in capsys.readouterr().err
    # conflicts with --sync-derived
    rc = main(
        ["--output", t.root, "--sync-derived", "up", "--table-tag", "x"], spark=spark
    )
    assert rc == 2 and "cannot combine" in capsys.readouterr().err


def test_curation_input_by_tag(spark, tmp_path, capsys):
    """snap:ROOT@TAG resolves a tag at --input: a curation pass binds to
    the pinned dataset version even after later ticks."""
    from fscrawler_spark.cli import main

    t = SnapshotTable(str(tmp_path / "t"))
    docs = spark.range(0, 30).select(
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("doc_id"),
        F.concat(F.lit("text  body "), F.col("id").cast("string")).alias("extracted"),
    )
    t.overwrite(spark, docs, cluster_by=("doc_id",))
    t.tag("train-v3")
    # the table moves on: 10 more docs
    t.upsert(
        spark,
        spark.range(30, 40).select(
            F.concat(F.lit("d"), F.col("id").cast("string")).alias("doc_id"),
            F.lit("later doc").alias("extracted"),
        ),
        keys=("doc_id",),
    )
    out = str(tmp_path / "cur")
    rc = main(
        ["--input", f"snap:{t.root}@train-v3", "--output", out, "--clean-text"],
        spark=spark,
    )
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and stats["docs"] == 30  # pinned version, not the 40-doc current
    # a missing tag errors with the tag list, not a confusing root error
    rc = main(
        ["--input", f"snap:{t.root}@nope", "--output", out, "--clean-text"],
        spark=spark,
    )
    assert rc == 2 and "no tag" in capsys.readouterr().err


def test_changelog_between_tags(spark, tmp_path, capsys):
    """--table-changes accepts tag names as range bounds: 'what changed
    between train-v2 and train-v3' without anyone writing ids down."""
    from fscrawler_spark.cli import main

    t = _table(spark, tmp_path)
    t.tag("train-v2")
    t.upsert(spark, _df(spark, [("c0", 0, "edited"), ("c9", 0, "born")]), keys=KEYS)
    t.tag("train-v3")
    t.upsert(spark, _df(spark, [("c1", 0, "later")]), keys=KEYS)
    rc = main(
        ["--output", t.root, "--table-changes", "train-v2:train-v3"], spark=spark
    )
    line = json.loads(capsys.readouterr().out.strip())
    assert rc == 0
    assert line["from_snapshot"] == 1 and line["to_snapshot"] == 2
    assert line["counts"] == {
        "insert": 1, "update_preimage": 1, "update_postimage": 1
    }
    # mixed bound: tag to current-by-default
    rc = main(["--output", t.root, "--table-changes", "train-v3"], spark=spark)
    line = json.loads(capsys.readouterr().out.strip())
    assert rc == 0 and line["from_snapshot"] == 2 and line["to_snapshot"] == 3
    # missing tag and invalid name both keep the exit-2 contract
    rc = main(["--output", t.root, "--table-changes", "nope:train-v3"], spark=spark)
    assert rc == 2 and "no tag" in capsys.readouterr().err
    rc = main(["--output", t.root, "--table-changes", "1:2:3"], spark=spark)
    assert rc == 2 and "FROM[:TO]" in capsys.readouterr().err


def test_torn_tag_surfaces_everywhere(spark, tmp_path, capsys):
    """A torn/empty tag file is NOT silently ignored: doctor reports it,
    resolve_tag raises the clean error class, and both CLI surfaces keep
    the exit-2-with-message contract (never a JSON traceback)."""
    from fscrawler_spark.cli import main
    from fscrawler_spark.plans.doctor import check_snapshot_table

    t = _table(spark, tmp_path)
    t.tag("ok")
    with open(t._tag_path("torn"), "w") as f:
        f.write("")  # torn: crashed writer / lost page cache
    assert t.tags() == {"ok": 1}  # listing skips it...
    findings = check_snapshot_table(t.root)
    assert any(f["code"] == "table_tag_torn" for f in findings)  # ...doctor doesn't
    with pytest.raises(ValueError, match="torn"):
        t.resolve_tag("torn")
    rc = main(["--output", t.root, "--table-changes", "torn"], spark=spark)
    assert rc == 2 and "torn" in capsys.readouterr().err
    # curation input via the torn tag: clean exit 2
    rc = main(
        ["--input", f"snap:{t.root}@torn", "--output", str(tmp_path / "c"),
         "--clean-text"],
        spark=spark,
    )
    assert rc == 2 and "torn" in capsys.readouterr().err


def test_tags_keyed_by_filename(spark, tmp_path):
    """The tag's NAME is its filename (the address resolve/drop use), so
    a copied tag file lists — and resolves — under its new name."""
    import shutil as _sh

    t = _table(spark, tmp_path)
    t.tag("a")
    _sh.copy(t._tag_path("a"), t._tag_path("b"))
    assert t.tags() == {"a": 1, "b": 1}
    assert t.resolve_tag("b") == 1
    assert t.drop_tag("b") == 1
    assert t.tags() == {"a": 1}


def test_tag_verb_exclusivity(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    t = _table(spark, tmp_path)
    for argv in (
        ["--output", t.root, "--table-tag", "x", "--table-drop-tag", "y"],
        ["--output", t.root, "--table-tag", "x", "--table-rollback", "1"],
        ["--output", t.root, "--table-drop-tag", "y", "--table-history"],
        ["--input", "docs", "--output", t.root, "--table-tag", "x"],
        ["--output", t.root, "--table-tag", "x", "--table-changes", "1"],
    ):
        rc = main(argv, spark=spark)
        err = capsys.readouterr().err
        assert rc == 2 and "cannot combine" in err, (argv, err)


def test_changes_arity_before_tag_lookup(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    t = _table(spark, tmp_path)
    t.tag("v2")
    rc = main(["--output", t.root, "--table-changes", "v2:x:3"], spark=spark)
    assert rc == 2 and "FROM[:TO]" in capsys.readouterr().err


def test_tag_expire_handshake(spark, tmp_path):
    """tag() re-verifies its snapshot after linking the ref: tagging a
    snapshot an expire deleted mid-call fails LOUDLY and leaves no
    dangling ref (simulated by deleting the manifest between the
    pre-check and the post-link check via a monkeypatched link)."""
    t = _table(spark, tmp_path)
    t.upsert(spark, _df(spark, [("c0", 0, "v2")]), keys=KEYS)

    import os as _os

    real_link = _os.link

    def race_link(src, dst):
        real_link(src, dst)
        _os.remove(t._manifest_path(1))  # concurrent expire wins the race

    _os.link = race_link
    try:
        with pytest.raises(FileNotFoundError, match="expired while tagging"):
            t.tag("late", 1)
    finally:
        _os.link = real_link
    assert "late" not in t.tags()  # no dangling ref left behind


def test_rest_table_route(spark, tmp_path):
    """GET /table serves the snapshot table's metadata (current, tags,
    history) read-only — monitor a publish target over HTTP while ticks
    keep committing."""
    import urllib.request

    from fscrawler_spark.rest import StatusServer

    t = _table(spark, tmp_path)
    t.tag("v1")
    t.upsert(spark, _df(spark, [("c0", 0, "v2")]), keys=KEYS)
    with StatusServer(str(tmp_path / "out"), table_root=t.root) as srv:
        url = f"http://{srv.host}:{srv.port}"
        d = json.loads(urllib.request.urlopen(f"{url}/table").read())
        assert d["current"] == 2 and d["tags"] == {"v1": 1}
        assert [h["snapshot_id"] for h in d["history"]] == [1, 2]
        # reference-path alias
        d2 = json.loads(urllib.request.urlopen(f"{url}/_crawler/table").read())
        assert d2 == d
    # no table at the root -> 404 with a message
    with StatusServer(str(tmp_path / "not_a_table")) as srv:
        try:
            urllib.request.urlopen(f"http://{srv.host}:{srv.port}/table")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
            assert "no snapshot table" in json.loads(e.read())["error"]
