"""Corpus statistics report — one aggregation pass over a docs table.

The curation counterpart of the run-stats operator (reference:
FsCrawler's FsJobStats / run statistics surface,
``core/.../FsParserAbstract.java`` stat accounting): where run stats
describe a CRAWL, this describes the CORPUS an extraction output holds
— per-group and total document counts, null/error rates, char and word
volumes — the numbers a training-data pipeline checks before spending
GPU-time on the data.

Scale shape: ONE ``rollup(group_col)`` hash aggregate (codegen,
map-side partial combine; the rollup adds the grand-total grouping set
to the same shuffle, not a second pass). Output is ``n_groups + 1``
rows — driver-safe by construction at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fscrawler_spark.functions.text_analysis import token_count

ALL = "<all>"
NULL_GROUP = "<null>"


def corpus_report(
    docs: DataFrame,
    text_col: str = "extracted",
    group_col: str = "mime",
) -> DataFrame:
    """Per-``group_col`` + grand-total corpus statistics, one row each.

    Columns: group, docs, null_text, chars, words, plus errors (when an
    ``error`` column exists) and convs (when ``conv_id`` exists). The
    grand-total row carries group=``<all>``; a NULL group value becomes
    ``<null>`` (distinguished from the rollup total via GROUPING, which
    both Spark and the DuckDB twin expose).
    """
    if text_col not in docs.columns:
        raise ValueError(
            f"report text column {text_col!r} not in table (has {docs.columns})"
        )
    if group_col not in docs.columns:
        raise ValueError(
            f"report group column {group_col!r} not in table (has {docs.columns})"
        )
    t = F.col(text_col)
    aggs = [
        F.count(F.lit(1)).alias("docs"),
        F.sum(t.isNull().cast("long")).alias("null_text"),
        F.coalesce(F.sum(F.length(t)), F.lit(0)).cast("long").alias("chars"),
        F.coalesce(F.sum(token_count(t)), F.lit(0)).cast("long").alias("words"),
    ]
    if "error" in docs.columns:
        aggs.append(F.sum(F.col("error").isNotNull().cast("long")).alias("errors"))
    if "conv_id" in docs.columns:
        aggs.append(F.count_distinct("conv_id").cast("long").alias("convs"))
    return (
        docs.rollup(group_col)
        # grouping() is only legal inside the rollup's aggregate list —
        # a downstream select() can no longer tell the total row apart
        # from a NULL group value
        .agg(F.grouping(group_col).alias("_g"), *aggs)
        .select(
            F.when(F.col("_g") == 1, F.lit(ALL))
            .otherwise(
                F.coalesce(F.col(group_col).cast("string"), F.lit(NULL_GROUP))
            )
            .alias("group"),
            *[F.col(c) for c in
              ["docs", "null_text", "chars", "words"]
              + (["errors"] if "error" in docs.columns else [])
              + (["convs"] if "conv_id" in docs.columns else [])],
        )
    )
