"""Incremental near-duplicate detection: dedup a tick's NEW/CHANGED
docs against a persisted LSH band index instead of re-running
full-corpus MinHash every tick.

Why it exists: near_dup_pipeline is one-shot — at 100 TB its signature
pass alone re-scans the corpus. The steady-state workload (the
reference's whole reason to exist, core/.../FsParser.java:1200-1215) is
"a 0.1% delta arrived"; dedup must cost O(delta), not O(corpus). This
module keeps two small persisted tables between ticks:

* band index  — (id, band, bucket) rows, what LSH buckets each doc
  landed in (band_index_for builds it; append band_delta per tick)
* clusters    — (id, cluster_id) assignments accumulated so far
  (upsert the returned assignments per tick)

Per-tick shuffle shape (everything is delta-keyed):

1. signatures + banding run over the DELTA only (one explode + one
   codegen hash-agg, same as the batch path).
2. the store side is probed with a semi-join on the delta's (band,
   bucket) set — the index is scanned but never exploded or
   re-hashed; persist it partitioned/bucketed by `bucket` and the probe
   prunes to delta buckets.
3. candidate pairs require at least one NEW side (store-store pairs
   were settled in their own ticks); the shared giant-bucket cap
   applies to the combined bucket population.
4. exact-Jaccard verification reuses dedup.verify_candidates, whose
   semi-join prefilter keeps the corpus's shingle shuffle candidate-
   sized.
5. cluster MERGES are handled exactly: matched store docs contribute a
   "star edge" to their existing representative (cluster_id = min id
   reachable, so the rep is the cluster's min member); min-label
   propagation over delta edges + stars therefore reproduces the
   global min label, and members of merged clusters that never touched
   the delta are relabeled via a broadcast (old_rep -> new_label) map.

Known limitation (documented, standard for incremental dedup): cluster
SPLITS are not detected — a CHANGED doc is re-evaluated as new (its old
band rows are retired), but the cluster it previously held together is
not re-examined, and DELETED docs leave their clusters untouched.
A corollary: surviving members still point at their recorded
representative, so if the REP itself changed/left, a later tick's star
edge can pull the departed id back into a cluster it no longer belongs
to. Schedule a periodic full near_dup_pipeline sweep to reconcile,
the same way compaction reconciles streaming sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fscrawler_spark.functions.dedup import (
    _banded,
    cap_groups,
    connected_components,
    minhash_signatures,
    minhash_signatures_fast,
    verify_candidates,
)


def _sig_fn(hash_family: str):
    if hash_family not in ("fast", "md5"):
        raise ValueError(f"hash_family must be 'fast' or 'md5', got {hash_family!r}")
    return minhash_signatures_fast if hash_family == "fast" else minhash_signatures


def band_index_for(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    hash_family: str = "fast",
) -> DataFrame:
    """(id, band, bucket) LSH index rows for ``df`` — the persistable
    band index. Bootstrap the store with this over the initial corpus;
    per tick, append the returned ``band_delta`` instead."""
    sigs = _sig_fn(hash_family)(df, id_col=id_col, text_col=text_col, num_hashes=num_hashes)
    return _banded(sigs, num_hashes, bands)


def incremental_near_dup(
    new_docs: DataFrame,
    corpus: DataFrame,
    band_index: DataFrame | None = None,
    clusters: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    max_bucket: int | None = 1000,
    hash_family: str = "fast",
) -> dict[str, DataFrame]:
    """Near-dup the tick's ``new_docs`` against the persisted store.

    ``corpus`` is the POST-tick docs table (old + new texts — the
    verification step looks both sides' texts up there, behind a
    candidate-id semi-join). ``band_index``/``clusters`` are the
    persisted tables from prior ticks (None = first tick).

    Returns:
      assignments — (id, cluster_id, is_keeper) for every doc whose
        assignment this tick creates OR changes (new clustered docs,
        matched store docs, and members of merged clusters); upsert
        into the clusters table. Singleton new docs are absent, same
        contract as near_dup_pipeline.
      band_delta — (id, band, bucket) rows for the new docs; upsert
        into the band index (delete rows for these ids first — a
        CHANGED doc's old bands are stale; this function already
        ignores them on the probe side).

    With additions-only ticks the accumulated clusters table is
    EXACTLY what a full near_dup_pipeline over the final corpus
    produces (tests/test_round4_incremental_dedup.py proves it,
    merge case included).
    """
    from fscrawler_spark.session import materialize

    new_ids = new_docs.select(F.col(id_col).alias("id")).distinct()
    # band_new is referenced by BOTH sides of the candidate self-join,
    # the store probe's bucket set, and the returned band_delta — live,
    # the delta's signature pass (explode + hash agg + store scans)
    # would re-execute per reference. It is delta-sized by construction:
    # materialize once. (Measured at 10k docs / 100-doc delta, local[8]:
    # live 28.7s vs materialized 11.3s — the live tick re-ran the
    # delta signature subtree for every one of its ~5 references.)
    band_new = materialize(
        band_index_for(
            new_docs, id_col=id_col, text_col=text_col,
            num_hashes=num_hashes, bands=bands, hash_family=hash_family,
        )
    )
    banded = band_new.withColumn("is_new", F.lit(True))
    if band_index is not None:
        # retire the changed docs' old bands, then probe ONLY the
        # delta's buckets (left_semi: the index never rides a shuffle
        # wider than the delta's bucket set)
        store = band_index.join(new_ids, "id", "left_anti").join(
            band_new.select("band", "bucket").distinct(),
            ["band", "bucket"],
            "left_semi",
        )
        banded = banded.unionByName(store.withColumn("is_new", F.lit(False)))
    capped = cap_groups(banded, ["band", "bucket"], max_bucket)
    left, right = capped.alias("l"), capped.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id"))
            & (F.col("l.is_new") | F.col("r.is_new")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    verified = verify_candidates(
        corpus, pairs, id_col=id_col, text_col=text_col, threshold=threshold
    ).select("id_a", "id_b")

    edges = verified
    if clusters is not None:
        # star edges: matched store docs pull their existing
        # representative (== the cluster's min id) into the component,
        # so min-label propagation yields the same label a full
        # recompute would — including transitive merges of old clusters
        # a CHANGED doc may still sit in the clusters table from a prior
        # tick; its membership is stale (the new text is what's being
        # evaluated), so only OLD matched docs contribute star edges
        matched = (
            verified.select(F.explode(F.array("id_a", "id_b")).alias("id"))
            .distinct()
            .join(new_ids, "id", "left_anti")
        )
        stars = (
            clusters.join(matched, "id", "left_semi")
            .filter(F.col("id") != F.col("cluster_id"))
            .select(F.col("id").alias("id_a"), F.col("cluster_id").alias("id_b"))
        )
        edges = edges.unionByName(stars)
    labels = connected_components(edges)

    if clusters is not None:
        # members of merged old clusters that never touched the delta:
        # relabel via the (old_rep -> new_label) map. The map is
        # delta-sized; AQE broadcasts it into the clusters scan.
        # only OLD docs' prior memberships witness a merge — a CHANGED
        # doc joining labels must not relabel the cluster it LEFT
        involved = (
            labels.join(new_ids, "id", "left_anti")
            .alias("n")
            .join(clusters.alias("o"), "id")
            .select(
                F.col("o.cluster_id").alias("old_rep"),
                F.col("n.cluster_id").alias("new_label"),
            )
        )
        rep_relabel = (
            involved.groupBy("old_rep")
            .agg(F.min("new_label").alias("new_label"))
            .filter(F.col("new_label") != F.col("old_rep"))
        )
        bystanders = (
            clusters.join(labels.select("id"), "id", "left_anti")
            .join(rep_relabel, clusters.cluster_id == rep_relabel.old_rep)
            .select("id", F.col("new_label").alias("cluster_id"))
        )
        labels = labels.unionByName(bystanders)

    assignments = labels.withColumn("is_keeper", F.col("id") == F.col("cluster_id"))
    # verified_pairs rides along for audit/metrics (how many dup edges
    # the tick found, and the live plan the shape tests pin — the
    # assignments lineage is truncated by connected_components'
    # checkpoint)
    return {"assignments": assignments, "band_delta": band_new, "verified_pairs": verified}
