"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the exact baseline: broadcast the (small)
  query set against the corpus, JVM-side dot products via zip_with +
  aggregate, window top-k. Correct at any corpus size as long as the
  QUERY side is broadcastable.
* sign-LSH bucketed top-k — the scale path: an 8-bit sign-bucket coarse
  quantizer (IVF-style); candidates only join within their bucket, so the
  shuffle is keyed and bounded instead of a cross join.
* embedding-cosine near-duplicate pairs — dedup by cosine >= threshold
  within LSH buckets.

No Python UDFs: dot products run in whole-stage codegen via
higher-order functions (zip_with/aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double")))


def cosine(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, neighbor_id, sim).

    queries MUST be small (broadcast side). Ties break on neighbor id for
    determinism. Self-matches excluded.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def sign_bucket(vec_col, dims: int = 8) -> F.Column:
    """IVF-style coarse bucket: sign bits of the first ``dims`` components.
    Cheap, deterministic, expressible in any engine."""
    bucket = F.lit(0)
    for i in range(dims):
        bucket = bucket + F.when(F.element_at(vec_col, i + 1) > 0, F.lit(1 << i)).otherwise(0)
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_dims: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket.
    Same output shape as brute_force_topk; recall < 1 by design — the
    candidate join is keyed on bucket instead of a cross join, which is
    what survives a 10^9-vector corpus."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sign_bucket(F.col(vec_col), bucket_dims).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_bucket(F.col(vec_col), bucket_dims).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_dims: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within sign buckets."""
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        sign_bucket(F.col(vec_col), bucket_dims).alias("bucket"),
    )
    return (
        v.alias("a")
        .join(v.alias("b"), (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .withColumn("sim", cosine(F.col("a.v"), F.col("b.v")))
        .filter(F.col("sim") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), F.round("sim", 6).alias("sim"))
    )
