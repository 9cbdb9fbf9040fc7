"""Persisted conversation-assembly store under an extraction output —
the steady-state tick for the assembly tier: each call diffs
per-CONVERSATION content fingerprints against what was assembled last,
re-assembles ONLY the changed conversations, and upserts the assembled
table in place. At 10^12 turns a tick's assembly work scales with the
changed-conversation set, never the corpus — the same delta-shaped
contract as the extraction tick (plans/pipeline.run_incremental_update)
and the dedup store (plans/dedup_store), applied to the derived
training-document table.

Layout (under ``<output_dir>/assembled/``):

  state/  (conv_id, conv_sha, db)             per-conv content fingerprint
  docs/   (conv_id, doc, n_turns, n_chars, db) the assembled table
  _assembly_meta.json                          params fingerprint + dirty

``db = pmod(xxhash64(conv_id), store_buckets)`` partitions both tables
so an upsert rewrites only the partitions holding touched conversations
(dynamic partition overwrite; emptied partitions swept). At 100 TB swap
the parquet dirs for Iceberg tables and the upserts become MERGE INTO.

The per-conv fingerprint is a sha256 over the SORTED (turn_idx, role,
sha(text)) lines of the conversation — order- and partition-independent,
and sensitive to exactly what assembly renders (a role or text edit, a
new/removed turn). Computing it is one corpus-scale scan + one shuffle
of a single short row per conversation — the same
"one content-diff pass per tick" budget as dedup_store's sha join; the
expensive part (building the documents) runs on the delta only.

Safety contract (mirrors dedup_store): params fingerprint refusal on
drift, a dirty marker bracketing the two-table upsert, and the
per-output job lock. First call auto-bootstraps (everything is a
delta). ``asm_version`` rides the fingerprint — bump it when the render
template changes, so stores assembled under old markup refuse loudly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fscrawler_spark.functions.assembly import assemble_conversations
from fscrawler_spark.plans.dedup_store import (
    _check_meta,
    _db_col,
    _upsert,
    _write_meta,
)
from fscrawler_spark.session import materialize

_META = "_assembly_meta.json"
_PARAM_KEYS = ("max_turns", "store_buckets", "tool_col")
# bump when the render template (assembly.ROLE_OPEN/CLOSE/TURN_SEP) or
# the fingerprint recipe changes: stored docs become incomparable
_ASM_VERSION = 1


def _paths(output_dir: str) -> dict[str, str]:
    root = os.path.join(output_dir, "assembled")
    return {
        "root": root,
        "state": os.path.join(root, "state"),
        "docs": os.path.join(root, "docs"),
        "meta": os.path.join(root, _META),
    }


def conversation_fingerprints(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str | None = None,
) -> DataFrame:
    """(conv_id, conv_sha): a deterministic per-conversation content
    fingerprint over exactly the fields assembly renders. Turn lines
    hash map-side (short strings ride the shuffle, never the text);
    sort_array makes the digest independent of partitioning and task
    order — same stability argument as assemble_conversations itself."""
    # every variable-content field enters the line as a fixed-alphabet
    # token (decimal digits / hex sha / a 0|1 null flag), so neither the
    # \x1f field separator nor the \n line joiner can occur inside a
    # field — no crafted role/text can shift boundaries and collide two
    # different conversations. Null flags (not sentinel strings) keep
    # NULL distinct from any real value, and idx coalesces under its
    # flag because concat_ws would silently SKIP a NULL field.
    def _flagged(col):
        return F.when(col.isNull(), F.lit("0")).otherwise(F.lit("1"))

    line = F.concat_ws(
        "\x1f",
        _flagged(F.col(idx_col)),
        F.coalesce(F.col(idx_col).cast("string"), F.lit("")),
        _flagged(F.col(role_col)),
        F.sha2(F.coalesce(F.col(role_col), F.lit("")), 256),
        _flagged(F.col(text_col)),
        F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256),
        *(
            [
                _flagged(F.col(tool_col)),
                F.sha2(F.coalesce(F.col(tool_col), F.lit("")), 256),
            ]
            if tool_col is not None
            else []
        ),
    )
    return (
        turns.select(F.col(conv_col).alias("conv_id"), line.alias("_l"))
        .groupBy("conv_id")
        .agg(
            F.sha2(F.array_join(F.sort_array(F.collect_list("_l")), "\n"), 256).alias(
                "conv_sha"
            )
        )
    )


def assembly_tick(
    spark: SparkSession,
    output_dir: str,
    corpus: DataFrame | None = None,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "extracted",
    tool_col: str | None = None,
    max_turns: int | None = None,
    store_buckets: int = 32,
) -> dict:
    """One assembly tick over ``corpus`` (default: the docs table at
    ``output_dir``). Re-assembles only conversations whose fingerprint
    changed since the last tick; purges assembled rows of conversations
    that vanished. Returns ``{bootstrap, changed_convs, removed_convs,
    convs_total}``. The first call IS the bootstrap.

    Reference analog: the reference re-runs its folder rollup per scan
    (FsParser.java:214-260); this keeps the conversation-level rollup
    incremental instead."""
    from fscrawler_spark.plans.pipeline import _JobLock

    with _JobLock(output_dir, "assembly-tick"):
        return _assembly_tick_impl(
            spark, output_dir, corpus, conv_col, idx_col, role_col,
            text_col, tool_col, max_turns, store_buckets,
        )


def _assembly_tick_impl(
    spark: SparkSession,
    output_dir: str,
    corpus: DataFrame | None,
    conv_col: str,
    idx_col: str,
    role_col: str,
    text_col: str,
    tool_col: str | None,
    max_turns: int | None,
    store_buckets: int,
) -> dict:
    from fscrawler_spark.operators.deletes import has_parquet_files

    p = _paths(output_dir)
    params = dict(zip(_PARAM_KEYS, (max_turns, store_buckets, tool_col)))
    params["asm_version"] = _ASM_VERSION
    _check_meta(p["meta"], params, p["root"], "assembly", "assembled")
    if corpus is None:
        docs_path = os.path.join(output_dir, "docs")
        if not has_parquet_files(spark, docs_path):
            raise FileNotFoundError(
                f"no docs table at {docs_path} — run run_extraction_job first"
            )
        corpus = spark.read.parquet(docs_path)
    needed = [conv_col, idx_col, role_col, text_col] + (
        [tool_col] if tool_col is not None else []
    )
    missing = [c for c in needed if c not in corpus.columns]
    if missing:
        # a clean library-level refusal (the CLI's except clause turns it
        # into exit 2), not an AnalysisException traceback mid-plan
        raise ValueError(
            f"assembly tick needs columns {needed} on the docs table; "
            f"missing {missing} (has {corpus.columns})"
        )

    # materialize the fingerprints ONCE (one short row per conversation):
    # the changed/gone diffs AND the state upsert all consume them, and a
    # lazy plan would re-run the corpus scan + conv shuffle per consumer
    cur = materialize(
        conversation_fingerprints(
            corpus, conv_col, idx_col, role_col, text_col, tool_col
        )
    )
    has_state = has_parquet_files(spark, p["state"])
    if has_state:
        # ONE full-outer diff replaces the former changed-anti-join +
        # gone-anti-join pair (two materializes + two count jobs → one
        # delta-sized materialize + one aggregate): a conv is CHANGED
        # when present in cur with no matching (conv_id, conv_sha) in
        # state, GONE when present only in state — identical sets.
        state = spark.read.parquet(p["state"]).select(
            "conv_id", F.col("conv_sha").alias("_state_sha")
        )
        j = cur.join(state, "conv_id", "full_outer")
        changed_f = F.col("conv_sha").isNotNull() & ~F.col("conv_sha").eqNullSafe(
            F.col("_state_sha")
        )
        gone_f = F.col("conv_sha").isNull()
        diff = materialize(
            j.filter(changed_f | gone_f).select(
                "conv_id", changed_f.alias("_chg"), gone_f.alias("_gone")
            )
        )
        counts = diff.agg(
            F.sum(F.col("_chg").cast("long")).alias("c"),
            F.sum(F.col("_gone").cast("long")).alias("g"),
        ).first()
        n_changed, n_gone = int(counts["c"] or 0), int(counts["g"] or 0)
        changed_ids = diff.filter(F.col("_chg")).select("conv_id")
        gone_ids = diff.filter(F.col("_gone")).select("conv_id")
    else:
        changed_ids = materialize(cur.select("conv_id"))
        gone_ids = spark.createDataFrame([], changed_ids.schema)
        n_changed = changed_ids.count()
        n_gone = 0
    has_docs = has_parquet_files(spark, p["docs"])
    if n_changed == 0 and n_gone == 0:
        total = spark.read.parquet(p["docs"]).count() if has_docs else 0
        return {
            "bootstrap": not has_state,
            "changed_convs": 0,
            "removed_convs": 0,
            "convs_total": total,
        }

    # the delta-sized work: assemble ONLY the changed conversations.
    # Broadcast the key set when small so the semi-join never shuffles
    # the corpus (same shape as the extraction tick's changed-keys join).
    keys = changed_ids.withColumnRenamed("conv_id", conv_col)
    if n_changed <= 100_000:
        keys = F.broadcast(keys)
    delta_turns = corpus.join(keys, conv_col, "left_semi")
    assembled = assemble_conversations(
        delta_turns,
        conv_col=conv_col,
        idx_col=idx_col,
        role_col=role_col,
        text_col=text_col,
        tool_col=tool_col,
        max_turns=max_turns,
    ).withColumnRenamed(conv_col, "conv_id")
    # materialize everything that reads the store paths before the
    # overwrites below replace them
    assembled = materialize(
        assembled.select("conv_id", "doc", "n_turns", "n_chars")
    )

    retired = changed_ids.unionByName(gone_ids).distinct()
    _write_meta(p["meta"], params, dirty=True)
    _upsert(
        spark, p["docs"],
        assembled.select(
            "conv_id", "doc", "n_turns", "n_chars", _db_col("conv_id", store_buckets)
        ),
        retired, "conv_id", store_buckets, has_docs,
        key="conv_id",
    )
    _upsert(
        spark, p["state"],
        cur.join(changed_ids, "conv_id", "left_semi").select(
            "conv_id", "conv_sha", _db_col("conv_id", store_buckets)
        ),
        retired, "conv_id", store_buckets, has_state,
        key="conv_id",
    )
    _write_meta(p["meta"], params, dirty=False)
    total = (
        spark.read.parquet(p["docs"]).count()
        if has_parquet_files(spark, p["docs"])
        else 0
    )
    return {
        "bootstrap": not has_state,
        "changed_convs": n_changed,
        "removed_convs": n_gone,
        "convs_total": total,
    }
