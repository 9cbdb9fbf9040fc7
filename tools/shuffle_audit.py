"""A/B shuffle-byte audit for the round-3 candidate-shuffle slimming.

Measures per-query shuffle WRITE bytes (Spark UI REST API, stage totals)
for the round-2 plan shapes vs the round-3 ones:

  * lsh_topk: dedup exchange carried (qv, cv) vectors  -> ids + sim only
  * cosine_near_dup_pairs: dedup carried (va, vb)      -> ids + sim only
  * verify_candidates: joins shipped string shingles   -> xxhash64 arrays

The round-2 shapes are re-created inline (labeled *_r2) purely for the
A/B: they produce identical results, just with fatter exchanges.

Usage: python tools/shuffle_audit.py [sf_dir]  (default /root/testdata/sf0.1)
Appends one JSON line per case to stdout; paste the table into PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fscrawler_spark.functions import dedup, embeddings  # noqa: E402
from fscrawler_spark.session import get_spark  # noqa: E402


def shuffle_write_bytes(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.loads(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages").read()
    )
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def measure(spark, name: str, df) -> dict:
    before = shuffle_write_bytes(spark)
    t0 = time.time()
    rows = df.count()
    out = {
        "case": name,
        "rows": rows,
        "shuffle_write_bytes": shuffle_write_bytes(spark) - before,
        "sec": round(time.time() - t0, 2),
    }
    print(json.dumps(out), flush=True)
    return out


# --- round-2 shapes (identical results, fatter exchanges) -------------------


def lsh_topk_r2(corpus, queries, k=5, bits=8, tables=4, seed=42, max_bucket=20_000, dim=None):
    dim = embeddings._infer_dim(queries, "embedding", dim)
    planes = embeddings.random_hyperplanes(dim, bits, tables, seed)
    q = embeddings._bucketed(queries, "vec_id", "embedding", planes, "query_id", "qv")
    c = embeddings._cap_buckets(
        embeddings._bucketed(corpus, "vec_id", "embedding", planes, "neighbor_id", "cv"),
        max_bucket,
    )
    cand = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])  # <- vectors ride this exchange
    )
    scored = cand.withColumn("sim", embeddings.cosine(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def near_dup_pairs_r2(df, threshold, bits=8, tables=4, seed=42, max_bucket=20_000, dim=None):
    dim = embeddings._infer_dim(df, "embedding", dim)
    planes = embeddings.random_hyperplanes(dim, bits, tables, seed)
    v = embeddings._cap_buckets(
        embeddings._bucketed(df, "vec_id", "embedding", planes, "id", "v"), max_bucket
    )
    pairs = (
        v.alias("a")
        .join(
            v.alias("b"),
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])  # <- both vectors ride this exchange
    )
    return (
        pairs.withColumn("sim", embeddings.cosine(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("sim"))
    )


def verify_candidates_r2(df, candidates, shingle_k=3, threshold=0.8):
    sh = df.select(
        F.col("doc_id").alias("id"),
        dedup.word_shingles(F.col("text"), shingle_k).alias("sh"),  # <- string arrays
    )
    return (
        candidates.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("common") / (F.size("sh_a") + F.size("sh_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(master="local[16]", extra={"spark.ui.enabled": "true"})
    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    q = e.filter(F.col("vec_id") < 50)

    n_e = e.count()
    measure(spark, "lsh_topk_r2", lsh_topk_r2(e, q))
    # corpus_count: keep the A/B clean — the r2 shape never counted, so
    # the r3 measurement must not include the validation count job
    measure(spark, "lsh_topk_r3", embeddings.lsh_topk(e, q, bits=8, corpus_count=n_e))

    dup = e.withColumn("vec_id", F.col("vec_id") + 100000)
    both = e.unionByName(dup)
    measure(spark, "near_dup_r2", near_dup_pairs_r2(both, threshold=0.999999))
    measure(
        spark,
        "near_dup_r3",
        embeddings.cosine_near_dup_pairs(
            both, threshold=0.999999, bits=8, corpus_count=2 * n_e
        ),
    )

    sigs = dedup.minhash_signatures_fast(docs)
    cands = dedup.lsh_candidate_pairs(sigs).localCheckpoint(eager=True)
    # at fixture scale these joins lower to broadcast-hash joins (zero
    # shuffle bytes); at 100 TB neither side broadcasts — disable
    # auto-broadcast so the measured exchange is the scale-path one
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        measure(spark, "verify_r2", verify_candidates_r2(docs, cands, threshold=0.5))
        measure(spark, "verify_r3", dedup.verify_candidates(docs, cands, threshold=0.5))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


if __name__ == "__main__":
    main()
