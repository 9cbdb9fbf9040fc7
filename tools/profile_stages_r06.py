#!/usr/bin/env python3
"""Round-6 stage-level profiling of the eager pipelines (near-dup, SemDeDup,
perplexity) whose driver-visible cost happens at query-construction time —
the .explain of the final frame is a trivial localCheckpoint scan, so the
guide-§1 measurement has to time the stages directly.

Usage: python tools/profile_stages_r06.py [sf_dir] [which ...]
Prints one JSON line per stage: {"stage": ..., "sec": ...}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(json.dumps({"stage": label, "sec": round(time.perf_counter() - t0, 3)}), flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = set(sys.argv[2:]) or {"neardup", "semdedup", "ppl"}
    import __spark_entry__ as entry_mod
    from fscrawler_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app="profile-r06", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    try:
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        noop(docs.groupBy("lang").count())  # warm

        if "neardup" in which:
            from fscrawler_spark.functions import dedup

            corpus = entry_mod._dup_corpus(spark, sf)
            sigs = t("nd.sigs.build+noop", lambda: None) or dedup.minhash_signatures_fast(corpus, id_col="id")
            t("nd.sigs", lambda: noop(sigs))
            cands = dedup.lsh_candidate_pairs(sigs, num_hashes=16, bands=4)
            t("nd.cands", lambda: noop(cands))
            verified = dedup.verify_candidates(corpus, cands, id_col="id", text_col="text", threshold=0.5)
            t("nd.verified", lambda: noop(verified))
            clusters = t("nd.cc(construct=edges-mat+iters)", lambda: dedup.connected_components(verified))
            t("nd.cc.final-noop", lambda: noop(clusters))
            t("nd.full", lambda: noop(dedup.near_dup_pipeline(corpus, id_col="id", threshold=0.5)))

        if "semdedup" in which:
            from fscrawler_spark.functions import embeddings

            emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
            both = emb.unionByName(emb.withColumn("vec_id", F.col("vec_id") + 1_000_000))
            cents = t("sd.centroids", lambda: embeddings.sampled_centroids(both, 64))
            cells = embeddings.cell_assignments(both, cents, with_cent_sim=False)
            t("sd.cells", lambda: noop(cells))
            pairs = embeddings.semantic_pairs(cells, 0.99)
            t("sd.pairs", lambda: noop(pairs))
            t("sd.full", lambda: noop(embeddings.semantic_dedup(both, n_cells=64, threshold=0.99)))

        if "ppl" in which:
            from fscrawler_spark.functions import lm_quality

            wlm = t("ppl.train_word", lambda: lm_quality.train_word_lm(docs, "text"))
            t("ppl.score_word", lambda: noop(lm_quality.add_perplexity(docs, wlm, "text")))
            t("ppl.buckets_word", lambda: noop(lm_quality.perplexity_buckets(docs, wlm, "text")))
            clm = t("ppl.train_char", lambda: lm_quality.train_char_lm(docs, "text"))
            t("ppl.score_char", lambda: noop(lm_quality.add_perplexity(docs, clm, "text")))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
