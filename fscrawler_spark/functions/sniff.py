"""Spark-native (JVM-side) MIME sniff expression.

Column-expression twin of extractors.sniff_mime — used where sniffing is
needed WITHOUT paying the Python UDF boundary (e.g. routing, stats,
predicate pushdown-friendly pre-filters). Keep the two in lockstep; the
unit test test_sniff_expr_matches_python asserts equality on the fixture
corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from fscrawler_spark.functions.extractors import (
    IMAGE_MAGICS,
    MIME_BINARY,
    MIME_HTML,
    MIME_JSON,
    MIME_PDF,
    MIME_PLAIN,
    MIME_XML,
)


def sniff_mime_col(text: Column) -> Column:
    head = F.substring(text, 1, 64)  # SNIFF_WINDOW twin
    low = F.lower(F.substring(F.regexp_replace(head, r"^[\s\x0b\x0c]+", ""), 1, 16))
    image = F.lit(None).cast("string")
    # build the image-magic chain in reverse so evaluation order matches
    # the Python tuple order (first magic wins)
    for magic, mime in reversed(IMAGE_MAGICS):
        image = F.when(head.startswith(magic), F.lit(mime)).otherwise(image)
    return (
        F.when(text.isNull() | (text == ""), F.lit(MIME_PLAIN))
        .when(image.isNotNull(), image)
        .when(head.startswith("ENC:") | head.contains("\x00"), F.lit(MIME_BINARY))
        .when(low.startswith("<!doctype html") | low.startswith("<html"), F.lit(MIME_HTML))
        .when(low.startswith("<?xml"), F.lit(MIME_XML))
        .when(head.startswith("%PDF-"), F.lit(MIME_PDF))
        .when(F.substring(low, 1, 1).isin("{", "["), F.lit(MIME_JSON))
        .otherwise(F.lit(MIME_PLAIN))
    )
