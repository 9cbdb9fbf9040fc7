#!/usr/bin/env python3
"""Round-6 tick profiling: replicate bench_tick's parquet + snapshot
legs at bench scale (120k turns, 32 buckets) and time every Spark
ACTION inside run_incremental_update / sync_derived_table /
assembly_tick by wrapping the hot entry points. Prints one JSON line
per phase. Scratch-only; not part of the bench."""
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
    from fscrawler_spark.session import get_spark

    which = set(sys.argv[1:]) or {"parquet", "snap", "view", "assembly"}
    scratch = tempfile.mkdtemp(prefix="tickprof_")
    spark = get_spark(app="tick-prof", master="local[32]", shuffle_partitions=32)
    sc = spark.sparkContext

    phases = []
    t_last = [time.perf_counter()]

    def mark(label):
        now = time.perf_counter()
        phases.append((label, round(now - t_last[0], 3)))
        t_last[0] = now

    # job-level timing via job-group hook: wrap setJobDescription? simpler:
    # wall between explicit marks around library calls.
    try:
        data = os.path.join(scratch, "data")
        paths = generate_transcripts(data, n_turns=120_000, seed=1234, write_expected=False)
        input_path = paths["transcripts"]
        settings = ExtractSettings(num_buckets=32, skew_salt=8, checkpoint_waves=1)
        base = spark.read.parquet(input_path)
        victim = base.select("conv_id").orderBy("conv_id").first()["conv_id"]
        v2 = (
            base.filter(F.col("conv_id") != victim)
            .withColumn(
                "text",
                F.when(
                    F.col("turn_idx") % 97 == 3,
                    F.concat(F.col("text"), F.lit(" tick-changed")),
                ).otherwise(F.col("text")),
            )
        )
        v2_path = os.path.join(scratch, "v2.parquet")
        v2.write.mode("overwrite").parquet(v2_path)
        pristine = os.path.join(scratch, "out_pristine")
        mark("setup")
        run_extraction_job(spark, input_path, pristine, settings)
        mark("full-run")

        if "parquet" in which:
            # instrument: monkeypatch time around the sub-calls
            import fscrawler_spark.plans.pipeline as pl
            import fscrawler_spark.operators.deletes as dels
            import fscrawler_spark.operators.incremental as inc
            import fscrawler_spark.session as sess

            spans = []

            def wrap(mod, name):
                orig = getattr(mod, name)

                def timed(*a, **k):
                    t0 = time.perf_counter()
                    out = orig(*a, **k)
                    spans.append((name, round(time.perf_counter() - t0, 3)))
                    return out

                setattr(mod, name, timed)
                return orig

            saved = [
                (pl, "materialize", wrap(pl, "materialize")),
                (dels, "apply_deletes", wrap(dels, "apply_deletes")),
                (dels, "stage_and_swap_buckets", wrap(dels, "stage_and_swap_buckets")),
                (dels, "recover_stale_stage", wrap(dels, "recover_stale_stage")),
                (pl, "_write_lineage", wrap(pl, "_write_lineage")),
            ]
            import fscrawler_spark.plans.bucketed as bk

            saved.append((bk, "refresh_snapshot_buckets", wrap(bk, "refresh_snapshot_buckets")))
            for k in range(2):
                out_a = os.path.join(scratch, f"out_parquet_{k}")
                shutil.copytree(pristine, out_a)
                spans.clear()
                t0 = time.perf_counter()
                res = run_incremental_update(spark, v2_path, out_a, settings, layout="parquet")
                wall = time.perf_counter() - t0
                print(json.dumps({"leg": f"parquet_tick_{k}", "wall": round(wall, 3),
                                  "changed": res["changed"], "spans": spans}), flush=True)
            for mod, name, orig in saved:
                setattr(mod, name, orig)
            mark("parquet-leg")
    finally:
        spark.stop()
        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps({"phases": phases}), flush=True)


if __name__ == "__main__":
    main()
