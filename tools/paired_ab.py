"""Paired-ratio A/B harness — the ONLY reliable way to compare two plan
shapes on this bursty shared host.

Single-window timings flip winners here: co-tenant load moves wall time
by 2-3x within a minute (BENCH.md's ceiling column ranges 0.15-0.87 on
identical work). What survives the noise is the RATIO of two runs taken
back-to-back inside the same window, aggregated over several
alternating-order rounds:

  round 1: A then B      round 2: B then A      round 3: A then B ...

Alternating order cancels slow drift (a burst that starts mid-round
penalizes A in one round and B in the next); the median ratio is the
robust winner call, and the min/max ratio band shows how sure to be.
Every round-4 optimization decision (widen_slim placements, live vs
materialized candidates, split-mode tokenizer) was made this way with
throwaway inline scripts — this tool is that methodology, committed.

Python API (the normal use — build plans, then compare):

    from tools.paired_ab import paired_ab
    r = paired_ab(lambda: plan_old(df), lambda: plan_new(df), rounds=5)
    # r["median_ratio"] > 1 -> B is faster (ratio = tA / tB)

CLI smoke (compares a plan against itself; expect median ~1.0):

    python tools/paired_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from typing import Callable

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _noop_run(built) -> None:
    """Execute whatever the builder returned: a DataFrame is driven
    through the noop sink (full plan, no collect); anything else is
    assumed to have already run inside the builder."""
    if hasattr(built, "write"):
        built.write.mode("overwrite").format("noop").save()


def paired_ab(
    build_a: Callable[[], object],
    build_b: Callable[[], object],
    rounds: int = 5,
    warmup: bool = True,
    label_a: str = "A",
    label_b: str = "B",
) -> dict:
    """Interleaved paired A/B: per round run both builders back-to-back
    (order alternating), ratio = tA/tB per round; report the median and
    the min/max band. Builders are called fresh each run so neither side
    reuses the other's shuffle files or InMemoryRelations.

    warmup runs each side once untimed first — JIT, codegen compilation,
    and file-listing caches otherwise land entirely on side A of round 1
    (measured up to 3x on first-touch plans; see BENCH.md methodology).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if warmup:
        _noop_run(build_a())
        _noop_run(build_b())
    a_secs: list[float] = []
    b_secs: list[float] = []
    for i in range(rounds):
        pair = [(build_a, a_secs), (build_b, b_secs)]
        if i % 2:
            pair.reverse()
        for build, sink in pair:
            t0 = time.time()
            _noop_run(build())
            # RAW floats here; round only in the report — quantizing to
            # 1 ms before the ratio distorts fast plans and a 0.000
            # denominator would kill the whole session
            sink.append(time.time() - t0)
    ratios = [round(a / max(b, 1e-9), 3) for a, b in zip(a_secs, b_secs)]
    out = {
        "label_a": label_a,
        "label_b": label_b,
        "rounds": rounds,
        "a_secs": [round(t, 3) for t in a_secs],
        "b_secs": [round(t, 3) for t in b_secs],
        "ratios": ratios,
        "median_ratio": round(statistics.median(ratios), 3),
        "min_ratio": min(ratios),
        "max_ratio": max(ratios),
        # host-noise context for the record: load average at the end of
        # the measurement (compare against the core count in the report)
        "loadavg": [round(x, 1) for x in os.getloadavg()],
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from fscrawler_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app="paired-ab-smoke", master="local[16]")
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    def plan():
        return docs.groupBy("source").agg(F.sum(F.length("text")).alias("b"))

    # self-vs-self: the null experiment — median_ratio should sit ~1.0;
    # how far the min/max band strays IS the window's noise floor
    paired_ab(plan, plan, rounds=5, label_a="self", label_b="self")


if __name__ == "__main__":
    main()
