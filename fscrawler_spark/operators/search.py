"""Typed search surface: the analog of the reference's ES query algebra.

The reference builds a small query DSL (term/match/prefix/range/bool)
plus size/sort/terms-aggregations and lowers it to an ES _search JSON
body (/root/reference/elasticsearch-client/.../ESSearchRequest.java:27-95,
ESQuery subclasses, JSON lowering ElasticsearchClient.java:1313-1368,
request build 1180-1232, response parse incl. terms buckets 1250-1310).

Here the same algebra lowers to Catalyst column predicates — filters
push down to the scan, terms aggregations become hash aggregates, and
"search" over the extracted-docs table is plain DataFrame execution.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Term:
    """Exact value match (ES `term`)."""

    field: str
    value: object

    def to_column(self) -> Column:
        return F.col(self.field) == F.lit(self.value)


@dataclass(frozen=True)
class Match:
    """Analyzed full-text match — lowered to case-insensitive token
    containment over whitespace analysis (ES `match` with OR operator)."""

    field: str
    query: str

    def to_column(self) -> Column:
        tokens = [t for t in self.query.lower().split() if t]
        if not tokens:
            return F.lit(True)
        words = F.split(F.lower(F.col(self.field)), r"\s+")
        pred = F.lit(False)
        for t in tokens:
            pred = pred | F.array_contains(words, t)
        return pred


@dataclass(frozen=True)
class Prefix:
    field: str
    value: str

    def to_column(self) -> Column:
        return F.col(self.field).startswith(self.value)


@dataclass(frozen=True)
class Range:
    """ES `range`: any of gt/gte/lt/lte."""

    field: str
    gt: object = None
    gte: object = None
    lt: object = None
    lte: object = None

    def to_column(self) -> Column:
        c, pred = F.col(self.field), F.lit(True)
        if self.gt is not None:
            pred = pred & (c > self.gt)
        if self.gte is not None:
            pred = pred & (c >= self.gte)
        if self.lt is not None:
            pred = pred & (c < self.lt)
        if self.lte is not None:
            pred = pred & (c <= self.lte)
        return pred


@dataclass(frozen=True)
class Bool:
    """ES `bool`: must AND, should OR (min 1), must_not NOT."""

    must: tuple = ()
    should: tuple = ()
    must_not: tuple = ()

    def to_column(self) -> Column:
        pred = F.lit(True)
        for q in self.must:
            pred = pred & q.to_column()
        if self.should:
            s = F.lit(False)
            for q in self.should:
                s = s | q.to_column()
            pred = pred & s
        for q in self.must_not:
            pred = pred & ~q.to_column()
        return pred


@dataclass(frozen=True)
class SearchRequest:
    """ESSearchRequest analog: query + size/sort/fields/terms-aggs."""

    query: object = None
    size: int = 10  # ES default (ElasticsearchClient.java:1194)
    sort: tuple[tuple[str, str], ...] = ()  # (field, 'asc'|'desc')
    fields: tuple[str, ...] = ()
    aggregations: tuple[str, ...] = ()  # terms aggs by field


def execute_search(df: DataFrame, req: SearchRequest) -> DataFrame:
    """Lower a SearchRequest to a DataFrame plan (the hits side)."""
    out = df
    if req.query is not None:
        out = out.filter(req.query.to_column())
    if req.sort:
        # one orderBy with all keys — chained orderBy calls would each
        # REPLACE the previous global sort, keeping only the last key
        out = out.orderBy(
            *[
                F.col(fld).desc() if direction == "desc" else F.col(fld).asc()
                for fld, direction in req.sort
            ]
        )
    if req.fields:
        out = out.select(*req.fields)
    return out.limit(req.size)


def execute_terms_aggs(df: DataFrame, req: SearchRequest) -> dict[str, DataFrame]:
    """Terms aggregations (ES bucket aggs -> hash aggregates), computed on
    the filtered set like ES does (A3, ESTermsAggregation)."""
    base = df.filter(req.query.to_column()) if req.query is not None else df
    return {
        fld: base.groupBy(F.col(fld).alias("key")).agg(F.count(F.lit(1)).alias("doc_count"))
        for fld in req.aggregations
    }
