"""Predicate operators F1–F5 (SURVEY §2.2), expressed as Catalyst-friendly
column predicates so they push down to the parquet scan.

Ordering discipline (reference: early size gate before expensive parse,
FsParser.java:960-974): apply these BEFORE the extraction UDF so Catalyst
keeps them below the Python boundary; content-regex filters (F2) must run
AFTER extraction by definition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fscrawler_spark.config import ExtractSettings, glob_to_regex


def include_exclude_predicate(
    path_col: Column, includes: tuple[str, ...], excludes: tuple[str, ...]
) -> Column:
    """Case-insensitive glob include/exclude on a virtual-path-like column
    (FsCrawlerUtil.java:100-183). Excludes win; empty includes = match all."""
    pred = F.lit(True)
    for g in excludes:
        pred = pred & ~path_col.rlike(glob_to_regex(g))
    if includes:
        inc = F.lit(False)
        for g in includes:
            inc = inc | path_col.rlike(glob_to_regex(g))
        pred = pred & inc
    return pred


def size_gate_predicate(text_col: Column, ignore_above: int | None) -> Column:
    """F3 — skip payloads larger than ``ignore_above`` BYTES
    (FsParser.java:960-974 gates on file byte size; octet_length, not
    character length — a 1500-char CJK payload is ~4.5KB UTF-8)."""
    if ignore_above is None:
        return F.lit(True)
    # null text is a first-class input (extract(None) is supported):
    # octet_length(NULL) <= N is NULL and a bare filter would silently
    # drop the row — keep nulls explicitly, like apply_post_filters
    return text_col.isNull() | (F.octet_length(text_col) <= F.lit(ignore_above))


def content_filter_predicate(extracted_col: Column, filters: tuple[str, ...]) -> Column:
    """F2 — keep only if extracted content matches ALL regexes
    (FsCrawlerUtil.java:192-216; MULTILINE semantics via (?m))."""
    pred = F.lit(True)
    for rx in filters:
        pred = pred & extracted_col.rlike(f"(?m){rx}")
    return pred


def apply_pre_filters(df: DataFrame, settings: ExtractSettings, path_col: str = "conv_id") -> DataFrame:
    """Everything push-down-able before extraction: globs + size gate."""
    pred = include_exclude_predicate(F.col(path_col), settings.includes, settings.excludes)
    pred = pred & size_gate_predicate(F.col("text"), settings.ignore_above)
    return df.filter(pred)


def apply_post_filters(df: DataFrame, settings: ExtractSettings) -> DataFrame:
    """Content-regex gate after extraction (FsParser.java:1346-1370).
    Null-extracted rows (errors) are kept — parity with the reference,
    which indexes docs with null content rather than dropping them."""
    if not settings.filters:
        return df
    return df.filter(
        F.col("extracted").isNull()
        | content_filter_predicate(F.col("extracted"), settings.filters)
    )
