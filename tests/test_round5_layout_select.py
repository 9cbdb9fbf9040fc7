"""Round 5: the incremental tick's diff layout is SELF-SELECTING.

The r4 verdict's top finding: the scale-correct bucketed diff was opt-in
(`layout="bucketed"`), so an operator who forgot the flag silently ran
the corpus-shuffling parquet anti-join. Resolution order for
``layout=None`` (the new default):

  1. the layout recorded in the checkpoint manifest wins;
  2. else a valid snapshot index on disk ⇒ bucketed;
  3. else parquet (with a logged scale warning).

Real ticks persist the resolved layout (one explicit choice is sticky);
dry runs never persist.
"""

import json
import os

import pytest

from fscrawler_spark.config import ExtractSettings
from fscrawler_spark.plans import bucketed as snap
from fscrawler_spark.plans.pipeline import run_extraction_job, run_incremental_update

SETTINGS = ExtractSettings(num_buckets=8, skew_salt=4)


def _stored(out):
    with open(os.path.join(out, "_checkpoint.json")) as f:
        return json.load(f).get("tick_layout")


def _set_stored(out, value):
    p = os.path.join(out, "_checkpoint.json")
    with open(p) as f:
        d = json.load(f)
    d["tick_layout"] = value
    with open(p, "w") as f:
        json.dump(d, f)


@pytest.fixture(scope="module")
def completed_out(spark, transcripts_dir, tmp_path_factory):
    inp = os.path.join(transcripts_dir, "transcripts.parquet")
    out = str(tmp_path_factory.mktemp("r5layout") / "out")
    run_extraction_job(spark, inp, out, SETTINGS)
    yield inp, out
    spark.sql(f"DROP TABLE IF EXISTS {snap.snapshot_table_name(out)}")


def test_fresh_output_defaults_to_parquet_and_records_it(spark, completed_out):
    inp, out = completed_out
    _set_stored(out, None)
    snap.invalidate_snapshot(out)
    res = run_incremental_update(spark, inp, out, SETTINGS)
    assert res["layout"] == "parquet"
    assert _stored(out) == "parquet"


def test_explicit_bucketed_is_sticky_for_later_default_ticks(spark, completed_out):
    inp, out = completed_out
    _set_stored(out, None)
    res = run_incremental_update(spark, inp, out, SETTINGS, layout="bucketed")
    assert res["layout"] == "bucketed"
    assert _stored(out) == "bucketed"
    # no flag on the next tick — the stored layout routes it bucketed
    res2 = run_incremental_update(spark, inp, out, SETTINGS)
    assert res2["layout"] == "bucketed"
    assert res2["changed"] == 0 and res2["deleted"] == 0


def test_valid_index_on_disk_selects_bucketed_without_stored_layout(spark, completed_out):
    inp, out = completed_out
    # bootstrap the index, then simulate a pre-round-5 manifest (no
    # tick_layout key): detection must fall through to the index probe
    run_incremental_update(spark, inp, out, SETTINGS, layout="bucketed")
    assert snap.snapshot_is_valid(spark, out, SETTINGS.num_buckets, SETTINGS.fingerprint())
    _set_stored(out, None)
    res = run_incremental_update(spark, inp, out, SETTINGS)
    assert res["layout"] == "bucketed"
    assert _stored(out) == "bucketed"


def test_explicit_parquet_overrides_and_rerecords(spark, completed_out):
    inp, out = completed_out
    _set_stored(out, "bucketed")
    res = run_incremental_update(spark, inp, out, SETTINGS, layout="parquet")
    assert res["layout"] == "parquet"
    assert _stored(out) == "parquet"


def test_dry_run_resolves_but_never_persists(spark, completed_out):
    inp, out = completed_out
    _set_stored(out, None)
    snap.invalidate_snapshot(out)
    res = run_incremental_update(spark, inp, out, SETTINGS, dry_run=True)
    assert res["layout"] == "parquet"
    assert _stored(out) is None
    # stored layout steers the dry run too — but stays unpersisted when
    # the preview has to fall back (bucketed stored, index invalidated)
    _set_stored(out, "bucketed")
    res2 = run_incremental_update(spark, inp, out, SETTINGS, dry_run=True)
    assert res2["layout"] == "parquet"  # read-only preview cannot rebuild
    assert _stored(out) == "bucketed"


def test_bad_layout_still_refuses(spark, completed_out):
    inp, out = completed_out
    with pytest.raises(ValueError, match="layout"):
        run_incremental_update(spark, inp, out, SETTINGS, layout="iceberg")
