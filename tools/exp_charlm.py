#!/usr/bin/env python3
"""Scratch experiment: decompose train_char_lm's cost at a given SF and
try alternative shapes. Not part of the bench."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fscrawler_spark.functions.text_analysis import normalized_text
from fscrawler_spark.session import get_spark, widen_slim


def t(label, fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best:.3f}s", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/bench_sf/sf1.0"
    spark = get_spark(app="exp-charlm", master="local[32]", shuffle_partitions=32)
    d = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    n = 3
    tcol = normalized_text(F.col("text"))
    length = F.length(tcol)
    idx = F.when(length >= n, F.sequence(F.lit(1), length - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    wide = widen_slim(d, "text")
    noop(wide.select(F.length("text")))  # warm

    # stage 0: widen + normalize only
    t("normalize-only", lambda: noop(wide.select(tcol.alias("_t"))))

    # stage 1: explode positions, no substr, count(*) only
    ex = wide.select(tcol.alias("_t"), F.explode(idx).alias("_i"))
    t("explode-count*", lambda: ex.count())

    # stage 2: explode + substr project, noop (no agg)
    grams = ex.select(F.col("_t").substr(F.col("_i"), F.lit(n)).alias("g"))
    t("explode+substr noop", lambda: noop(grams))

    # stage 3: full current shape: explode + substr + groupBy count
    t("current groupBy(g)", lambda: noop(grams.groupBy("g").agg(F.count(F.lit(1)).alias("c"))))

    # alt A: two-level agg: first (g) partial via repartition? skip

    # alt B: per-doc gram-array via transform, explode, groupBy
    arr = F.transform(
        F.sequence(F.lit(1), F.greatest(length - (n - 1), F.lit(1))),
        lambda i: tcol.substr(i, F.lit(n)),
    )
    altb = wide.select(F.explode(arr).alias("g"))
    t("HOF-array explode groupBy", lambda: noop(altb.groupBy("g").agg(F.count(F.lit(1)).alias("c"))))

    # alt C: aggregate per-doc into a count-map via HOF? skipped (interpreted)

    # alt D: mapInArrow python Counter over bytes (exactness caveat ignored here,
    # just measuring the ceiling)
    import pyarrow as pa

    def count_batches(it):
        from collections import Counter

        c = Counter()
        for b in it:
            for s in b.column(0).to_pylist():
                if s is None:
                    continue
                for i in range(len(s) - (n - 1)):
                    c[s[i : i + n]] += 1
        yield pa.RecordBatch.from_arrays(
            [pa.array(list(c.keys()), type=pa.string()), pa.array(list(c.values()), type=pa.int64())],
            ["g", "c"],
        )

    norm_df = wide.select(tcol.alias("_t"))
    altd = norm_df.mapInArrow(count_batches, "g string, c long")
    t("python Counter partial + groupBy", lambda: noop(altd.groupBy("g").agg(F.sum("c").alias("c"))))

    spark.stop()


if __name__ == "__main__":
    main()
