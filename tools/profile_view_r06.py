#!/usr/bin/env python3
"""Round-6 derived-view sync phase profile at bench scale: replicate
bench_tick's publish + derived-view legs (120k turns) and time each
Spark action inside sync_derived_table. Scratch-only."""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    from fscrawler_spark.config import ExtractSettings
    from fscrawler_spark.datagen import generate_transcripts
    from fscrawler_spark.plans.pipeline import run_extraction_job, run_incremental_update
    from fscrawler_spark.plans.snapshot_table import SnapshotTable
    from fscrawler_spark.plans.derived import sync_derived_table
    from fscrawler_spark.session import get_spark

    scratch = tempfile.mkdtemp(prefix="viewprof_")
    spark = get_spark(app="view-prof", master="local[32]", shuffle_partitions=32)
    try:
        data = os.path.join(scratch, "data")
        paths = generate_transcripts(data, n_turns=120_000, seed=1234, write_expected=False)
        settings = ExtractSettings(num_buckets=32, skew_salt=8, checkpoint_waves=1)
        base = spark.read.parquet(paths["transcripts"])
        stbl = SnapshotTable(os.path.join(scratch, "snaptbl"))
        stbl.overwrite(spark, base.repartitionByRange(32, "conv_id", "turn_idx"))
        out = os.path.join(scratch, "out")
        run_extraction_job(spark, f"snap:{stbl.root}", out, settings)
        pub_root = os.path.join(scratch, "pubtbl")
        r = run_incremental_update(spark, f"snap:{stbl.root}", out, settings, publish_table=pub_root)
        assert r["published"]["mode"] == "bootstrap", r
        pub_tbl = SnapshotTable(pub_root)

        def _view(df):
            return df.filter(F.col("error").isNull()).select(
                "conv_id", "turn_idx", F.length("extracted").alias("n_chars")
            )

        view_root = os.path.join(scratch, "view")
        t0 = time.perf_counter()
        sync_derived_table(spark, pub_tbl, view_root, _view)
        print(json.dumps({"leg": "view_bootstrap", "sec": round(time.perf_counter() - t0, 3)}), flush=True)

        vcols = pub_tbl.read(spark).columns
        vdelta = (
            pub_tbl.read(spark)
            .filter((F.abs(F.xxhash64("conv_id", "turn_idx")) % 200) == 0)
            .filter(F.col("extracted").isNotNull())
            .withColumn("extracted", F.concat(F.col("extracted"), F.lit(" v3")))
            .select(*vcols)
        )
        t0 = time.perf_counter()
        up_res = pub_tbl.upsert(spark, vdelta, keys=("conv_id", "turn_idx"))
        print(json.dumps({"leg": "upstream_upsert", "sec": round(time.perf_counter() - t0, 3), "files": up_res}), flush=True)

        # instrument read_changes + apply_delta + localCheckpoint spans
        import fscrawler_spark.plans.derived as dv
        import fscrawler_spark.plans.snapshot_table as st
        spans = []

        def wrap(obj, name):
            orig = getattr(obj, name)

            def timed(*a, **k):
                t0 = time.perf_counter()
                r = orig(*a, **k)
                spans.append((name, round(time.perf_counter() - t0, 3)))
                return r

            setattr(obj, name, timed)

        wrap(st.SnapshotTable, "read_changes")
        wrap(st.SnapshotTable, "apply_delta")
        wrap(st.SnapshotTable, "_touched_files")
        wrap(st.SnapshotTable, "replace")
        wrap(st.SnapshotTable, "_stage_data_files")
        # staticmethods need re-wrapping as staticmethod
        for sname in ("_validate_changelog_keys", "_validate_mutation_keys"):
            orig = getattr(st.SnapshotTable, sname)

            def mk(orig, sname):
                def timed(*a, **k):
                    t0 = time.perf_counter()
                    r = orig(*a, **k)
                    spans.append((sname, round(time.perf_counter() - t0, 3)))
                    return r
                return staticmethod(timed)

            setattr(st.SnapshotTable, sname, mk(orig, sname))

        # time the two localCheckpoints by wrapping DataFrame.localCheckpoint
        from pyspark.sql import DataFrame as _DF
        orig_lc = _DF.localCheckpoint

        def timed_lc(self, eager=True):
            t0 = time.perf_counter()
            r = orig_lc(self, eager)
            spans.append(("localCheckpoint", round(time.perf_counter() - t0, 3)))
            return r

        _DF.localCheckpoint = timed_lc
        orig_count = _DF.count

        def timed_count(self):
            t0 = time.perf_counter()
            r = orig_count(self)
            spans.append(("count", round(time.perf_counter() - t0, 3)))
            return r

        _DF.count = timed_count

        t0 = time.perf_counter()
        res = sync_derived_table(spark, pub_tbl, view_root, _view)
        wall = time.perf_counter() - t0
        _DF.localCheckpoint = orig_lc
        _DF.count = orig_count
        print(json.dumps({"leg": "view_delta_sync", "sec": round(wall, 3), "res": {k: v for k, v in res.items() if k != 'mode'} | {"mode": res["mode"]}, "spans": spans}), flush=True)
    finally:
        spark.stop()
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
