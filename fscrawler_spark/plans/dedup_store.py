"""Persisted near-dup store under an extraction output — the wiring
that turns functions/incremental_dedup into a steady-state pipeline
feature: each call diffs the docs table against what was signed last,
re-signs ONLY the delta, and upserts three small partitioned tables.

Layout (under ``<output_dir>/dedup/``):

  state/       (id, content_sha, db)   what was signed last tick
  band_index/  (id, band, bucket, db)  the persisted LSH index
  clusters/    (id, cluster_id, db)    accumulated assignments
  _dedup_meta.json                     params fingerprint + dirty marker

``db = pmod(xxhash64(id), store_buckets)`` partitions all three tables
so an upsert rewrites only the partitions holding touched ids (dynamic
partition overwrite — the same mechanism as the docs buckets). At 100
TB swap the three parquet dirs for Iceberg tables and the upserts
become MERGE INTO; the diff/sign/cluster dataflow is unchanged.

Safety contract (mirrors the pipeline's manifest guards):
  * params are fingerprinted — a tick with different (num_hashes,
    bands, threshold, hash_family, store_buckets) REFUSES instead of
    silently mixing incompatible signatures.
  * a dirty marker brackets the multi-table upsert — a tick that finds
    it refuses (the store may be torn); delete the dedup/ dir to
    re-bootstrap.
  * the per-output job lock serializes against extraction ticks.

The first call auto-bootstraps (everything is a delta), so there is no
separate build step. Deleted docs: their state/band/cluster rows are
purged (ghost bands would waste candidates); assignments of SURVIVING
members of their clusters keep their labels — cluster splits are
full-sweep territory (see functions/incremental_dedup docstring).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fscrawler_spark.functions.incremental_dedup import incremental_near_dup
from fscrawler_spark.session import dynamic_partition_overwrite, materialize

_META = "_dedup_meta.json"
_PARAM_KEYS = ("num_hashes", "bands", "threshold", "max_bucket", "hash_family", "store_buckets")
# bump when the signature math changes (band rows become incomparable):
# 2 = the 2^31-1 permutation-modulus fix. Rides the params fingerprint,
# so a store signed under the old math refuses loudly instead of
# silently mixing incompatible buckets.
_SIG_VERSION = 2


def _paths(output_dir: str) -> dict[str, str]:
    root = os.path.join(output_dir, "dedup")
    return {
        "root": root,
        "state": os.path.join(root, "state"),
        "band_index": os.path.join(root, "band_index"),
        "clusters": os.path.join(root, "clusters"),
        "meta": os.path.join(root, _META),
    }


def _db_col(id_col: str, store_buckets: int):
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(store_buckets)).cast("int").alias("db")


def _load_meta(meta_path: str) -> dict | None:
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        return json.load(f)


def _check_meta(meta_path: str, params: dict, root: str, noun: str, dirname: str) -> None:
    """Shared store-safety gate (dedup + assembly stores): refuse a dirty
    store (a prior tick died mid-upsert — it may be torn) and refuse
    params drift (mixing incompatible rows would corrupt silently)."""
    meta = _load_meta(meta_path)
    if meta is None:
        return
    if meta.get("dirty"):
        raise RuntimeError(
            f"{noun} store at {root} is DIRTY (a prior tick died "
            f"mid-upsert); delete the {dirname}/ dir to re-bootstrap"
        )
    if meta.get("params") != params:
        raise ValueError(
            f"{noun} store params drifted: store has {meta.get('params')}, "
            f"tick asked for {params}; delete the {dirname}/ dir to "
            "re-bootstrap with the new params"
        )


def _write_meta(meta_path: str, params: dict, dirty: bool) -> None:
    os.makedirs(os.path.dirname(meta_path), exist_ok=True)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"params": params, "dirty": dirty}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, meta_path)


def _upsert(
    spark: SparkSession,
    path: str,
    delta: DataFrame | None,
    retired_ids: DataFrame,
    id_col: str,
    store_buckets: int,
    exists: bool,
    key: str = "id",
) -> None:
    """Partition-scoped upsert: within the ``db`` partitions holding any
    retired id, keep rows whose id is NOT retired, add the delta rows,
    and dynamic-overwrite only those partitions. The merged content is
    materialized first — Spark refuses to overwrite a path it is
    reading, and the touched partitions are delta-proportional.
    ``key`` names the id column IN THE STORED TABLE (the assembly store
    keeps its user-facing conv_id name; the dedup tables use 'id')."""
    retired = retired_ids.select(F.col(id_col).alias(key), _db_col(id_col, store_buckets))
    merged = delta
    touched: set[int] = set()
    if exists:
        touched = {r["db"] for r in retired.select("db").distinct().collect()}
        keep = (
            spark.read.parquet(path)
            .filter(F.col("db").isin(list(touched)) if touched else F.lit(False))
            .join(F.broadcast(retired.select(key)), key, "left_anti")
        )
        merged = keep if merged is None else merged.unionByName(keep)
    if merged is None:
        return
    merged = materialize(merged)
    written: set[int] = set()
    if merged.head(1):
        # force dynamic mode: under Spark's default 'static' a partitioned
        # overwrite drops EVERY existing partition, not just the written
        # ones — a caller-supplied session must not decide that
        with dynamic_partition_overwrite(spark):
            merged.write.mode("overwrite").partitionBy("db").parquet(path)
        written = {r["db"] for r in merged.select("db").distinct().collect()}
    # an all-retired merge writes NOTHING (an empty overwrite would
    # leave a footer-less dir that poisons every later read) — the
    # emptied-partition sweep below does the whole purge
    # dynamic overwrite replaces only partitions PRESENT in the write: a
    # touched partition whose every row was retired gets no file and
    # would keep its stale rows (ghost state desynchronizes the three
    # tables — a re-added doc could look signed while its bands are
    # gone). Remove emptied partition dirs explicitly.
    emptied = touched - written
    if emptied:
        from fscrawler_spark.operators.deletes import _fs_for

        HPath, fs = _fs_for(spark, path)
        for db in sorted(emptied):
            hp = HPath(f"{path}/db={db}")
            if fs.exists(hp):
                fs.delete(hp, True)


def dedup_tick(
    spark: SparkSession,
    output_dir: str,
    corpus: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "extracted",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    max_bucket: int | None = 1000,
    hash_family: str = "fast",
    store_buckets: int = 32,
) -> dict:
    """One dedup tick over ``corpus`` (default: the docs table at
    ``output_dir``). Signs/banded-indexes only docs whose content sha
    changed since the last tick, clusters them against the persisted
    store, and upserts state/band_index/clusters in place. Returns
    ``{bootstrap, delta_docs, removed_docs, assignments_upserted,
    verified_pairs, clusters_total}``. The first call over a fresh
    output IS the bootstrap (delta = everything).

    Reference analog: none — the reference's tick (FsParser.java:
    1200-1215) updates its index incrementally; this does the same for
    the dedup tier the reference lacks.
    """
    from fscrawler_spark.plans.pipeline import _JobLock

    with _JobLock(output_dir, "dedup-tick"):
        return _dedup_tick_impl(
            spark, output_dir, corpus, id_col, text_col, num_hashes,
            bands, threshold, max_bucket, hash_family, store_buckets,
        )


def _dedup_tick_impl(
    spark: SparkSession,
    output_dir: str,
    corpus: DataFrame | None,
    id_col: str,
    text_col: str,
    num_hashes: int,
    bands: int,
    threshold: float,
    max_bucket: int | None,
    hash_family: str,
    store_buckets: int,
) -> dict:
    from fscrawler_spark.operators.deletes import has_parquet_files

    p = _paths(output_dir)
    params = {
        k: v
        for k, v in zip(
            _PARAM_KEYS,
            (num_hashes, bands, threshold, max_bucket, hash_family, store_buckets),
        )
    }
    params["sig_version"] = _SIG_VERSION
    _check_meta(p["meta"], params, p["root"], "dedup", "dedup")
    if corpus is None:
        docs_path = os.path.join(output_dir, "docs")
        if not has_parquet_files(spark, docs_path):
            raise FileNotFoundError(
                f"no docs table at {docs_path} — run run_extraction_job first"
            )
        corpus = spark.read.parquet(docs_path)

    # content diff vs the signed state: sha never NULL so the anti-join
    # can't leak null-text docs past the delta
    cur = corpus.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.sha2(F.col(text_col).cast("string"), 256), F.lit("<null>")).alias(
            "content_sha"
        ),
    )
    has_state = has_parquet_files(spark, p["state"])
    if has_state:
        state = spark.read.parquet(p["state"]).select("id", "content_sha")
        delta_ids = materialize(
            cur.join(state, ["id", "content_sha"], "left_anti").select("id")
        )
        gone_ids = materialize(
            state.select("id").join(cur.select("id"), "id", "left_anti")
        )
    else:
        delta_ids = materialize(cur.select("id"))
        gone_ids = spark.createDataFrame([], delta_ids.schema)
    n_delta = delta_ids.count()
    n_gone = gone_ids.count()
    if n_delta == 0 and n_gone == 0:
        clusters_total = (
            spark.read.parquet(p["clusters"]).count()
            if has_parquet_files(spark, p["clusters"])
            else 0
        )
        return {
            "bootstrap": not has_state,
            "delta_docs": 0,
            "removed_docs": 0,
            "assignments_upserted": 0,
            "verified_pairs": 0,
            "clusters_total": clusters_total,
        }

    changed_docs = corpus.join(
        delta_ids.withColumnRenamed("id", id_col), id_col, "left_semi"
    )
    has_bands = has_parquet_files(spark, p["band_index"])
    has_clusters = has_parquet_files(spark, p["clusters"])
    band_index = (
        spark.read.parquet(p["band_index"]).select("id", "band", "bucket")
        if has_bands
        else None
    )
    clusters = (
        spark.read.parquet(p["clusters"]).select("id", "cluster_id")
        if has_clusters
        else None
    )
    res = incremental_near_dup(
        changed_docs, corpus, band_index, clusters,
        id_col=id_col, text_col=text_col, num_hashes=num_hashes,
        bands=bands, threshold=threshold, max_bucket=max_bucket,
        hash_family=hash_family,
    )
    # materialize EVERYTHING that reads the store paths before any
    # overwrite below replaces them
    assignments = materialize(res["assignments"].select("id", "cluster_id"))
    band_delta = materialize(res["band_delta"])
    n_pairs = res["verified_pairs"].count()
    n_assign = assignments.count()

    retired = delta_ids.unionByName(gone_ids).distinct()
    _write_meta(p["meta"], params, dirty=True)
    _upsert(
        spark, p["state"],
        cur.join(delta_ids, cur.id == delta_ids.id, "left_semi").select(
            "id", "content_sha", _db_col("id", store_buckets)
        ),
        retired, "id", store_buckets, has_state,
    )
    _upsert(
        spark, p["band_index"],
        band_delta.select("id", "band", "bucket", _db_col("id", store_buckets)),
        retired, "id", store_buckets, has_bands,
    )
    _upsert(
        spark, p["clusters"],
        assignments.select("id", "cluster_id", _db_col("id", store_buckets)),
        # delta_ids must retire too: a CHANGED doc whose new text is a
        # singleton gets NO assignments row, and without retirement its
        # stale cluster membership would survive the tick
        assignments.select("id").unionByName(delta_ids).unionByName(gone_ids).distinct(),
        "id", store_buckets, has_clusters,
    )
    _write_meta(p["meta"], params, dirty=False)
    clusters_total = (
        spark.read.parquet(p["clusters"]).count()
        if has_parquet_files(spark, p["clusters"])
        else 0
    )
    return {
        "bootstrap": not has_state,
        "delta_docs": n_delta,
        "removed_docs": n_gone,
        "assignments_upserted": n_assign,
        "verified_pairs": n_pairs,
        "clusters_total": clusters_total,
    }
