"""Round 4: spherical k-means IVF centroid training
(embeddings.kmeans_centroids / ivf_topk(train="kmeans")). Oracle is an
independent numpy Lloyd loop sharing ONLY the deterministic init (the
hash-sampled vectors, which sampled_centroids already pins against its
own DuckDB twin in the ANN suite).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fscrawler_spark.functions.embeddings import (
    brute_force_topk,
    ivf_topk,
    kmeans_centroids,
    sampled_centroids,
)

DIM = 8
N_BLOBS = 4


def _blobs(n_per=30, spread=0.05, seed=7):
    """Well-separated unit blobs: one axis-aligned center per blob."""
    rng = np.random.default_rng(seed)
    rows = []
    for b in range(N_BLOBS):
        center = np.zeros(DIM)
        center[b] = 1.0
        for i in range(n_per):
            v = center + rng.normal(0, spread, DIM)
            rows.append((b * n_per + i, [float(x) for x in v]))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _oracle_lloyd(vecs_by_id, init, iters):
    """Independent spherical Lloyd: cosine assignment (ties -> lower
    cid), raw-mean update renormalized to the unit sphere, empty cells
    keep their centroid. float32 round-trip on the inputs mirrors the
    parquet/Arrow float storage."""

    def unit(m):
        n = np.linalg.norm(m, axis=-1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    ids = sorted(vecs_by_id)
    X = np.asarray(
        [np.asarray(vecs_by_id[i], dtype=np.float32) for i in ids], dtype=np.float64
    )
    C = unit(np.asarray([v for _cid, v in init], dtype=np.float64))
    for _ in range(iters):
        sims = unit(X) @ C.T
        assign = np.argmax(sims, axis=1)  # first max == lower cid on ties
        nxt = C.copy()
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                nxt[c] = unit(members.mean(axis=0))
        C = nxt
    return C


def test_matches_independent_numpy_lloyd(spark):
    rows = _blobs()
    df = _df(spark, rows)
    init = sampled_centroids(df, n_centroids=N_BLOBS + 1)
    got = kmeans_centroids(df, n_centroids=N_BLOBS + 1, iters=4)
    exp = _oracle_lloyd(dict(rows), init, iters=4)
    assert [cid for cid, _ in got] == list(range(N_BLOBS + 1))
    np.testing.assert_allclose(
        np.asarray([v for _, v in got]), exp, atol=1e-9
    )


def test_converges_to_blob_centers(spark):
    rows = _blobs()
    got = kmeans_centroids(_df(spark, rows), n_centroids=N_BLOBS, iters=6)
    # every blob center (a unit axis vector) is ~some centroid
    cents = np.asarray([v for _, v in got])
    for b in range(N_BLOBS):
        center = np.zeros(DIM)
        center[b] = 1.0
        sims = cents @ center
        assert sims.max() > 0.99, (b, sims)


def test_zero_iters_is_normalized_init(spark):
    df = _df(spark, _blobs())
    init = sampled_centroids(df, n_centroids=3)
    got = kmeans_centroids(df, n_centroids=3, iters=0)
    exp = np.asarray([v for _, v in init], dtype=np.float64)
    exp = exp / np.linalg.norm(exp, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray([v for _, v in got]), exp, atol=1e-12)


def test_partitioning_stable(spark):
    rows = _blobs()
    a = kmeans_centroids(_df(spark, rows), n_centroids=4, iters=3)
    b = kmeans_centroids(_df(spark, rows).repartition(7), n_centroids=4, iters=3)
    np.testing.assert_allclose(
        np.asarray([v for _, v in a]), np.asarray([v for _, v in b]), atol=1e-9
    )


def test_empty_cell_keeps_previous_centroid(spark):
    # 2 real clusters, 3 centroids: at least one cell must empty out;
    # its centroid must remain a (normalized) init vector, not NaN
    rows = _blobs(n_per=10)[: 2 * 10]
    df = _df(spark, rows)
    init = sampled_centroids(df, n_centroids=3)
    got = kmeans_centroids(df, n_centroids=3, iters=3)
    cents = np.asarray([v for _, v in got])
    assert np.isfinite(cents).all()
    assert not np.isnan(cents).any()
    exp = _oracle_lloyd(dict(rows), init, iters=3)
    np.testing.assert_allclose(cents, exp, atol=1e-9)


def test_ivf_kmeans_recall_on_clustered_data(spark):
    rows = _blobs(n_per=40)
    df = _df(spark, rows)
    queries = df.filter(F.col("vec_id") % 40 == 3)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(df, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            df, queries, k=5, n_centroids=N_BLOBS, nprobe=1,
            train="kmeans", train_iters=4,
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    # trained cells align with the blobs, so nprobe=1 is near-exact
    assert recall > 0.95, recall


def test_validation(spark):
    df = _df(spark, _blobs(n_per=3))
    with pytest.raises(ValueError):
        kmeans_centroids(df, iters=-1)
    with pytest.raises(ValueError):
        ivf_topk(df, df.limit(1), train="bogus")
