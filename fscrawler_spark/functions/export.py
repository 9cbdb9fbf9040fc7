"""Training-data export: deterministic global shuffle order, sized
shards, and a verifiable manifest — the tier that hands a curated corpus
to the trainer.

Reference scope: FSCrawler stops at the search sink (its bulk writer,
``elasticsearch/.../FsCrawlerDocumentService.java``); a training-data
engine additionally needs the corpus laid out the way data loaders
consume it: a fixed number of shard files, each an unbiased sample of
the corpus, rows within a shard in a reproducible pseudo-random order,
plus a manifest the loader can verify before burning GPU hours.

Scale design — the whole point is avoiding a global sort:

* ``order_key = md5(seed || id)`` is a deterministic pseudo-random
  permutation key. ``shard = order_key % n_shards`` assigns each row to
  a shard; hash uniformity makes every shard an unbiased ~1/n sample of
  the corpus, so any subset of shards is itself an unbiased subsample
  (loaders can stream shards independently and still see a well-mixed
  stream).
* The write is ONE hash-partition exchange on ``shard`` plus an
  in-partition sort — Spark never runs the sample-range global sort a
  naive ``orderBy(order_key)`` would cost, and the layout is identical
  at any parallelism (pinned by tests).
* A new epoch is a new ``seed``: a completely different permutation for
  free, no state carried between epochs.
* The manifest is one tiny groupBy(shard) aggregate: row count, an
  order-insensitive XOR checksum of the order keys (overflow-free,
  engine-agnostic), key range, and optional byte totals. A loader (or
  doctor) re-derives it from the shards to detect truncated/duplicated
  files before training starts.

The md5-based key is the same cross-engine hash the sampling/split
operators use (dedup._md5_int), so the DuckDB oracle reproduces shard
assignment and checksums value-for-value.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from .dedup import _md5_key


def order_key(id_col, seed: int = 0) -> F.Column:
    """Deterministic pseudo-random permutation key for one epoch:
    non-negative int64 md5 of ``order:<seed>:<id>``, built on the shared
    salted hash (dedup._md5_key, which owns the NULL-as-'<null>'
    sentinel convention)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return _md5_key(col, salt=f"order:{seed}:")


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    n_shards: int | None = None,
) -> DataFrame:
    """Append ``order_key`` (epoch permutation key) and, when
    ``n_shards`` is given, ``shard`` (uniform hash shard in
    [0, n_shards)). Pure codegen projection — no shuffle; consumers sort
    WITHIN shards, never globally."""
    if n_shards is not None and n_shards < 1:
        raise ValueError(f"n_shards must be >= 1 (got {n_shards})")
    out = df.withColumn("order_key", order_key(id_col, seed))
    if n_shards is not None:
        out = out.withColumn(
            "shard", (F.col("order_key") % F.lit(int(n_shards))).cast("int")
        )
    return out


def curriculum_key(stage_col, id_col, seed: int = 0) -> F.Column:
    """Deterministic curriculum-order key: ``stage * 2^52 + order_key``
    packed into one int64, so sorting by this single column yields
    stages in ascending order with a seeded pseudo-random permutation
    WITHIN each stage — the standard easy-to-hard curriculum layout
    (stage = a difficulty bin the caller computes: quality decile,
    length bucket, perplexity cut). One column instead of a composite
    sort key so it drops into ``training_order``-shaped consumers
    (shard-local sorts, manifests) unchanged.

    ``order_key`` is 52 bits here (md5 key masked down from 60) so the
    pack never overflows int64 for stage < 2^11 = 2048 stages — far
    beyond any curriculum's bin count; stages outside [0, 2048) raise
    at runtime via the overflow guard below.
    """
    stage = (stage_col if not isinstance(stage_col, str) else F.col(stage_col)).cast(
        "long"
    )
    # pmod-masked 52-bit permutation key; same cross-engine md5 family
    perm = F.pmod(order_key(id_col, seed), F.lit(1 << 52))
    guarded = F.when(
        (stage >= 0) & (stage < (1 << 11)), stage
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("curriculum stage out of [0, 2048): "), stage.cast("string")
            )
        )
    )
    return (guarded * F.lit(1 << 52) + perm).alias("curriculum_key")


def curriculum_order(
    df: DataFrame,
    stage_col,
    id_col: str = "doc_id",
    seed: int = 0,
    n_shards: int | None = None,
) -> DataFrame:
    """Append ``order_key`` (= the curriculum key: stage-major,
    seeded-permutation minor) and, with ``n_shards``, a ``shard``
    assignment that is stage-stratified: the shard comes from the
    PERMUTATION bits only, so every shard holds an unbiased ~1/n sample
    of EVERY stage and a loader reading shards in parallel still sees
    the curriculum ramp inside each shard after its in-shard sort.
    Pure codegen projection, no shuffle — same contract as
    ``training_order``."""
    if n_shards is not None and n_shards < 1:
        raise ValueError(f"n_shards must be >= 1 (got {n_shards})")
    out = df.withColumn("order_key", curriculum_key(stage_col, id_col, seed))
    if n_shards is not None:
        out = out.withColumn(
            "shard",
            (F.pmod(F.col("order_key"), F.lit(1 << 52)) % F.lit(int(n_shards))).cast(
                "int"
            ),
        )
    return out


def shard_manifest(
    ordered: DataFrame,
    text_col: str | None = None,
) -> DataFrame:
    """Manifest over a ``training_order(..., n_shards=...)`` frame: one
    row per shard with ``n_rows``, ``key_xor`` (order-insensitive XOR of
    the order keys — overflow-free, unlike a sum, and identical in any
    engine), ``min_key``/``max_key``, and ``bytes`` when ``text_col`` is
    given. ONE hash aggregate with map-side combine; output is n_shards
    rows — driver-safe at any corpus size."""
    if "shard" not in ordered.columns or "order_key" not in ordered.columns:
        raise ValueError(
            "shard_manifest needs the 'shard' and 'order_key' columns — "
            "build the input with training_order(df, n_shards=...)"
        )
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(order_key)").alias("key_xor"),
        F.min("order_key").alias("min_key"),
        F.max("order_key").alias("max_key"),
    ]
    if text_col is not None:
        aggs.append(
            F.sum(F.coalesce(F.octet_length(F.col(text_col)), F.lit(0)))
            .alias("bytes")
        )
    return ordered.groupBy("shard").agg(*aggs)


EXPORT_FORMATS = ("parquet", "json")


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
    text_col: str | None = None,
    fmt: str = "parquet",
    stage_col: str | None = None,
) -> dict:
    """Write the corpus as ``path/shards/shard=K/`` files plus
    ``path/manifest/`` (always parquet). Rows land in their hash shard
    sorted by (order_key, id) — the reproducible training stream — via
    ONE repartition(n_shards, shard) exchange + sortWithinPartitions (no
    global sort). ``fmt``: 'parquet' (columnar, the default) or 'json'
    (JSONL shard files, the format most training loaders stream
    directly). With ``stage_col`` the order key is the CURRICULUM key
    (``curriculum_order``): each shard's in-shard stream ramps through
    the stages easy-to-hard with a seeded permutation within each stage,
    and shard assignment stays stage-stratified. Returns summary stats.

    Idempotent: same (corpus, seed, n_shards, fmt, stage_col) produces
    byte-identical shard contents at any parallelism. ``verify_export``
    needs no flag — the manifest checksums the written keys, whichever
    family built them.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1 (got {n_shards})")
    if fmt not in EXPORT_FORMATS:
        raise ValueError(f"fmt must be one of {EXPORT_FORMATS}, got {fmt!r}")
    if stage_col is not None:
        ordered = curriculum_order(
            df, stage_col, id_col=id_col, seed=seed, n_shards=n_shards
        )
    else:
        ordered = training_order(df, id_col=id_col, seed=seed, n_shards=n_shards)
    writer = (
        ordered.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "order_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    writer.format(fmt).save(os.path.join(path, "shards"))
    manifest = shard_manifest(ordered, text_col=text_col)
    manifest.orderBy("shard").write.mode("overwrite").parquet(
        os.path.join(path, "manifest")
    )
    spark = df.sparkSession
    m = spark.read.parquet(os.path.join(path, "manifest"))
    agg = m.agg(
        F.sum("n_rows").alias("rows"), F.count(F.lit(1)).alias("shards")
    ).collect()[0]
    return {
        "shards": int(agg["shards"]),
        "rows": int(agg["rows"] or 0),
        "seed": seed,
        "curriculum": stage_col,
        "path": path,
    }


def _read_shards(spark, path: str) -> DataFrame:
    """Read shards back in whichever format they were exported (the data
    files' extension says which; mixed dirs don't occur — export always
    overwrites the whole shards/ tree)."""
    sp = os.path.join(path, "shards")
    for root, _dirs, files in os.walk(sp):
        for f in files:
            if f.endswith(".json"):
                # read the key columns with an explicit schema — JSON
                # inference could narrow types on small shards (shard
                # itself resolves from the partition dirs)
                return spark.read.schema("order_key long, shard int").json(sp)
            if f.endswith(".parquet"):
                return spark.read.parquet(sp)
    return spark.read.parquet(sp)  # empty export: let the reader error


def verify_export(spark, path: str) -> list[str]:
    """Recompute the manifest FROM the written shards and diff it against
    the stored one — the pre-training integrity gate (truncated shard
    files, duplicated rows, a stale manifest after a partial rewrite).
    Returns a list of human-readable findings; empty = clean."""
    findings: list[str] = []
    shards = _read_shards(spark, path)
    # bytes (when present) was derived from a caller-named text column at
    # export time; the self-derivable columns are the integrity surface
    stored = spark.read.parquet(os.path.join(path, "manifest")).drop("bytes")
    recomputed = shard_manifest(shards).select(stored.columns)
    delta = recomputed.exceptAll(stored).unionByName(stored.exceptAll(recomputed))
    for r in delta.collect():
        findings.append(
            f"shard {r['shard']}: manifest mismatch "
            f"(n_rows={r['n_rows']}, key_xor={r['key_xor']})"
        )
    return findings
