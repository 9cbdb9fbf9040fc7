"""Round-3 fixes: ANN auto-sized bits (the empty-result footgun), slim
candidate shuffles, hashed-shingle verify, SimHash bits=64 banding.

Reference parity notes: the footgun was VERDICT r2 "What's wrong #1" —
DEFAULT_BITS=8 with a 20k bucket cap silently returned empty results
past ~5M vectors because _cap_buckets drops WHOLE buckets.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fscrawler_spark.functions import dedup, embeddings


def _random_corpus(spark, n: int, dim: int = 8, seed: int = 7):
    rng = np.random.default_rng(seed)
    rows = [(i, [float(x) for x in rng.normal(0, 1, dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_auto_bits_sizing_math():
    # below the crossover: the floor holds
    assert embeddings.auto_bits(500, 20_000) == embeddings.DEFAULT_BITS
    # past the crossover: bits grow so expected bucket <= cap / headroom
    b = embeddings.auto_bits(100_000_000, 20_000)
    assert 100_000_000 / (1 << b) <= 20_000 / embeddings.AUTO_BITS_HEADROOM
    # uncapped or empty corpora keep the floor
    assert embeddings.auto_bits(10**12, None) == embeddings.DEFAULT_BITS
    assert embeddings.auto_bits(0, 20_000) == embeddings.DEFAULT_BITS
    # past the int32-packing ceiling: clamped while the cap still holds...
    n_clamp = 20_000 * (1 << embeddings.MAX_BITS)
    assert embeddings.auto_bits(n_clamp, 20_000) == embeddings.MAX_BITS
    # ...but RAISES (never a silent all-dropped sizing) when even
    # MAX_BITS cannot bring the expected bucket under the cap
    with pytest.raises(ValueError, match="even at 30 bits"):
        embeddings.auto_bits(10**15, 2)


def test_lsh_topk_auto_bits_survives_cap_crossover(spark):
    """The r2 footgun reproduced in miniature: n=3000 with max_bucket=2
    puts the EXPECTED bucket (3000/256 ~= 12) far over the cap, so the
    old fixed bits=8 dropped every bucket and returned an empty frame.
    Auto-sizing must instead raise bits and return real neighbors."""
    corpus = _random_corpus(spark, 3000)
    queries = corpus.filter(F.col("vec_id") < 3)
    out = embeddings.lsh_topk(corpus, queries, k=3, max_bucket=2, tables=8)
    assert out.count() > 0


def test_lsh_topk_explicit_bits_past_crossover_warns_not_raises(spark, caplog):
    """Explicit bits are an expert override: a cardinality past the cap
    crossover WARNS (a skewed corpus can still return valid tail-bucket
    neighbors) instead of hard-failing; the supplied corpus_count is
    trusted, so no count job runs at plan time."""
    import logging

    corpus = _random_corpus(spark, 200)
    queries = corpus.filter(F.col("vec_id") < 2)
    with caplog.at_level(logging.WARNING, logger="fscrawler_spark.functions.embeddings"):
        out = embeddings.lsh_topk(
            corpus, queries, bits=8, max_bucket=2, corpus_count=3000
        )
    assert any("EXPECTED bucket" in r.message for r in caplog.records)
    out.count()  # plan executes; result may be truncated but never errors


def test_near_dup_pairs_auto_bits_survives_cap_crossover(spark):
    base = _random_corpus(spark, 1500)
    dup = base.withColumn("vec_id", F.col("vec_id") + 10_000)
    both = base.unionByName(dup)
    pairs = embeddings.cosine_near_dup_pairs(
        both, threshold=0.999999, max_bucket=2, tables=8
    )
    # every vector has an exact duplicate; with auto-sized bits the pair
    # set must be found despite the tiny cap (identical vectors share
    # every bucket, and buckets are now small enough to survive it)
    assert pairs.count() > 0


def test_bits_validation_bounds():
    with pytest.raises(ValueError, match=r"bits must be in \[1, 30\]"):
        embeddings.random_hyperplanes(dim=8, bits=31)
    with pytest.raises(ValueError, match=r"bits must be in \[1, 30\]"):
        embeddings.random_hyperplanes(dim=8, bits=0)


def test_lsh_dedup_exchange_carries_no_vectors(spark):
    """VERDICT r2 'What's wrong #2': the candidate-dedup exchange used to
    shuffle the full qv/cv arrays. Now sim is computed inside the bucket
    join and only (ids, sim) ride the dedup exchange."""
    corpus = _random_corpus(spark, 300)
    queries = corpus.filter(F.col("vec_id") < 3)
    out = embeddings.lsh_topk(corpus, queries, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    blocks = [b for b in plan.split("Exchange") if b.startswith(" hashpartitioning(query_id")]
    assert blocks, f"expected a dedup exchange on (query_id, neighbor_id):\n{plan}"
    for b in blocks:
        head = b.split("\n", 1)[0]
        assert "qv#" not in head and "cv#" not in head, head


def test_verify_candidates_hashed_shingles_exact_jaccard(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.verify_candidates(docs, cands, threshold=0.0).collect()
    }
    # 9 words -> 7 trigram shingles each; docs 1/2 share the first 6
    assert got[(1, 2)] == pytest.approx(6 / 8)
    assert got[(1, 3)] == pytest.approx(0.0)


def test_simhash_pairs_bits64(spark):
    """ADVICE r2: bits=64 used to fail at plan build (top band mask
    exceeded signed int64). shiftrightunsigned banding accepts it."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "unrelated totally separate vocabulary set here"),
        ],
        "doc_id long, text string",
    )
    sims = dedup.simhash(docs, bits=64)
    pairs = dedup.simhash_near_dup_pairs(sims, max_hamming=3, bits=64).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in pairs] == [(1, 2, 0)]


def test_simhash_pairs_rejects_too_many_bands(spark):
    sims = spark.createDataFrame([(1, 5)], "id long, simhash long")
    with pytest.raises(ValueError, match="needs at least"):
        dedup.simhash_near_dup_pairs(sims, max_hamming=64, bits=64)


def test_semantic_search_over_string_ids(spark):
    """ADVICE r2 (medium): the semantic query hardcoded a LONG query id;
    against a sha256 STRING doc_id the neighbor_id != query_id compare
    blew up with CAST_INVALID_INPUT under ANSI. The query row id is now
    typed from the corpus id column."""
    from fscrawler_spark.operators.search import SearchRequest, Semantic, execute_search

    rng = np.random.default_rng(3)
    rows = [
        (f"sha-{i:03d}", [float(x) for x in rng.normal(0, 1, 8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id string, emb array<float>")
    qvec = tuple(float(x) for x in rng.normal(0, 1, 8))
    hits = execute_search(
        df, SearchRequest(query=Semantic(field="emb", vector=qvec, k=5, id_col="doc_id"))
    ).collect()
    assert 0 < len(hits) <= 5
    assert all(h["doc_id"].startswith("sha-") for h in hits)
    # exact path too (brute force broadcasts the query row)
    hits2 = execute_search(
        df,
        SearchRequest(
            query=Semantic(field="emb", vector=qvec, k=5, id_col="doc_id", exact=True)
        ),
    ).collect()
    assert len(hits2) == 5


def test_incremental_tick_uses_reliable_checkpoint_when_set(spark, transcripts_dir, tmp_path):
    """VERDICT r2 'What's wrong #4': the tick materialized its delta with
    localCheckpoint (executor-local blocks — an executor loss kills a
    100-TB tick). With a checkpoint dir set, session.materialize must use
    reliable checkpoints instead: rdd-* payloads land INSIDE the dir."""
    import os

    from fscrawler_spark.config import ExtractSettings
    from fscrawler_spark.plans.pipeline import run_extraction_job, run_incremental_update

    st = ExtractSettings(num_buckets=4)
    inp = os.path.join(transcripts_dir, "transcripts.parquet")
    out = str(tmp_path / "job")
    run_extraction_job(spark, inp, out, st)

    v2 = str(tmp_path / "v2.parquet")
    spark.read.parquet(inp).withColumn(
        "text",
        F.when(F.col("turn_idx") == 0, F.concat(F.col("text"), F.lit(" v2"))).otherwise(
            F.col("text")
        ),
    ).write.parquet(v2)

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    try:
        sc.setCheckpointDir(str(tmp_path / "ckpt"))
        res = run_incremental_update(spark, v2, out, st)
        assert res["changed"] > 0
        rdd_dirs = [
            e.name
            for u in os.scandir(str(tmp_path / "ckpt"))
            for e in os.scandir(u.path)
        ]
        assert any(n.startswith("rdd-") for n in rdd_dirs), rdd_dirs
    finally:
        sc._jsc.sc().setCheckpointDir(None)
