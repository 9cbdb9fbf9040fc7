"""Round-3 scale-core review fixes: zero-vector cosine, null-text dedup
exclusion, LSH band validation, quality NULL semantics, sampler
resolution, IVF id typing.
"""

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.functions import dedup, embeddings


def test_zero_vector_neither_crashes_nor_ranks_first(spark):
    """A zero-norm embedding under ANSI used to throw DIVIDE_BY_ZERO for
    the whole query; now its sim is NULL — excluded from thresholds and
    ranked last."""
    corpus = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame([(9, [1.0, 0.0])], "vec_id long, embedding array<float>")
    rows = embeddings.brute_force_topk(corpus, q, k=3).collect()
    assert [r["neighbor_id"] for r in rows[:2]] == [2, 3]  # real sims first
    # near-dup threshold never passes a NULL sim
    dup = corpus.withColumn("vec_id", F.col("vec_id") + 10)
    pairs = embeddings.cosine_near_dup_pairs(
        corpus.unionByName(dup), threshold=0.9, bits=2, tables=2
    ).collect()
    assert all({p["id_a"], p["id_b"]} != {1, 11} for p in pairs)


def test_null_text_docs_are_not_duplicates_of_each_other(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "same text"), (4, "same text")],
        "doc_id long, text string",
    )
    ex = dedup.exact_duplicates(df).collect()
    assert len(ex) == 1 and ex[0]["dup_count"] == 2  # only the real pair
    # fast minhash family: null-text docs produce NO signature at all
    sigs = dedup.minhash_signatures_fast(df).collect()
    assert {r["id"] for r in sigs} == {3, 4}


def test_banded_rejects_bad_bands(spark):
    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    sigs = dedup.minhash_signatures_fast(df, num_hashes=16)
    with pytest.raises(ValueError, match="bands must be in"):
        dedup.lsh_candidate_pairs(sigs, num_hashes=16, bands=20)
    with pytest.raises(ValueError, match="divide num_hashes"):
        dedup.lsh_candidate_pairs(sigs, num_hashes=16, bands=5)


def test_simhash_validates_bits():
    # validation runs before any Spark work, so df is never touched
    with pytest.raises(ValueError, match=r"bits must be in \[1, 64\]"):
        dedup.simhash(None, bits=65)
    with pytest.raises(ValueError, match=r"bits must be in \[1, 64\]"):
        dedup.simhash(None, bits=0)


def test_quality_score_null_is_null(spark):
    from fscrawler_spark.functions import text_analysis as ta

    df = spark.createDataFrame([(None,), ("real text here",)], "text string")
    got = [r[0] for r in df.select(ta.quality_score(F.col("text"))).collect()]
    assert got[0] is None and got[1] is not None


def test_deterministic_sample_sub_resolution_rate_raises(spark):
    from fscrawler_spark.functions.curation import deterministic_sample

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="resolution"):
        deterministic_sample(df, rate=1e-9, key_col="k")
    # a representable rate still works
    deterministic_sample(df, rate=0.5, key_col="k").count()


def test_ivf_rejects_string_ids_with_clear_error(spark):
    corpus = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])], "vec_id string, embedding array<float>"
    )
    with pytest.raises(TypeError, match="INTEGER"):
        embeddings.ivf_topk(corpus, corpus.limit(1), k=1, n_centroids=2)


def test_ivf_cells_are_int64(spark):
    """int64 vec_ids used as centroid ids must not wrap through int32."""
    big = 2**40
    corpus = spark.createDataFrame(
        [(big + i, [float(i), 1.0]) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    out = embeddings.ivf_topk(
        corpus, corpus.filter(F.col("vec_id") == big), k=2, n_centroids=2, nprobe=2
    ).collect()
    assert out and all(r["neighbor_id"] >= big for r in out)
