"""Extractor registry — the plugin-SPI analog (SURVEY §2.10).

The reference lets users swap parse behavior per type via PF4J plugins
(/root/reference/plugin/.../FsCrawlerPlugin.java, FsCrawlerPluginsManager)
and a custom Tika config (fs.tika_config_path, TikaInstance.java:120-134).
Here the same extension point is a MIME -> extractor-callable map captured
by value into the Arrow UDF closure: register a handler for a mime type
(or override a built-in) and every worker uses it — no shared mutable
state, per-job isolation for free.

Handler contract: ``(text: str, limit: int) -> ExtractResult`` — total
(never raises); spans must satisfy the verbatim-slice invariant.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
from pyspark.sql import functions as F

from fscrawler_spark.config import ExtractSettings
from fscrawler_spark.functions.extractors import (
    IMAGE_MAGICS,
    MIME_BINARY,
    MIME_HTML,
    MIME_JSON,
    MIME_PDF,
    MIME_PLAIN,
    MIME_XML,
    ExtractResult,
    extract_binary,
    extract_html,
    extract_image,
    extract_json,
    extract_pdfish,
    extract_plain,
    extract_xml,
    sniff_mime,
)
from fscrawler_spark.functions.udfs import EXTRACT_TYPE, build_extract_batch, limit_for

Handler = Callable[[str, int], ExtractResult]

BUILTIN_HANDLERS: dict[str, Handler] = {
    MIME_HTML: extract_html,
    MIME_XML: extract_xml,
    MIME_PDF: extract_pdfish,
    MIME_JSON: extract_json,
    MIME_PLAIN: extract_plain,
    MIME_BINARY: lambda t, lim: extract_binary(t),
}
# image mimes dispatch to the needs_ocr branch by default; an OCR plugin
# registers an override for exactly these keys (TikaInstance OCR analog)
for _m in {mime for _, mime in IMAGE_MAGICS}:
    BUILTIN_HANDLERS[_m] = (lambda m: (lambda t, lim: extract_image(t, m)))(_m)


def make_registry_udf(
    settings: ExtractSettings,
    overrides: dict[str, Handler] | None = None,
    sniffer: Callable[[str | None], str] | None = None,
):
    """Dispatch UDF with user handlers. ``overrides`` replace/extend the
    builtin per-mime handlers; ``sniffer`` replaces the mime sniffer."""
    handlers = dict(BUILTIN_HANDLERS)
    handlers.update(overrides or {})
    sniff = sniffer or sniff_mime

    def _one(t: str | None) -> ExtractResult:
        if t is None:
            return ExtractResult(MIME_PLAIN, None, [], None)
        if t == "":
            return ExtractResult(MIME_PLAIN, "", [], None)
        mime = sniff(t)
        handler = handlers.get(mime, extract_plain)
        try:
            return handler(t, limit_for(settings, t))
        except Exception:
            return ExtractResult(mime, None, [], "parse_error")

    @F.arrow_udf(EXTRACT_TYPE)
    def registry_udf(text: pa.Array) -> pa.Array:
        return build_extract_batch(((t, _one(t)) for t in text.to_pylist()), settings)

    return registry_udf
