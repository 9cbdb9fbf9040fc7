from fscrawler_spark.functions.extractors import (  # noqa: F401
    ExtractResult,
    extract,
    sniff_mime,
)
