"""The extraction operator: transcripts rows -> Doc-analog rows.

Column plan (all JVM-side except the single extraction UDF):

  pre-filters (pushed to scan) -> salted bucket id -> extract UDF ->
  doc_id/checksum/file metadata columns -> post content filter

Doc-analog output schema (SURVEY §1.4):
  conv_id, turn_idx, role, tool, ts        passthrough identity
  doc_id: string                           sha256(conv_id '/' turn_idx) (T11)
  mime, extracted, spans, error            extraction results (T1-T14)
  file: struct<filesize, checksum, indexing_date>   (T10, File bean analog)
  meta: struct<language>                   (T9, optional)
  part_bucket: int                         salted conv-hash output bucket
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fscrawler_spark.config import ExtractSettings
from fscrawler_spark.functions.udfs import make_extract_udf
from fscrawler_spark.operators.filters import apply_post_filters, apply_pre_filters


def salted_bucket(num_buckets: int, skew_salt: int):
    """Salted output bucket: hash(conv_id, turn_idx % skew_salt) % buckets.

    A mega-conversation fans out over ``skew_salt`` distinct buckets instead
    of pinning one task (north_rule skew requirement; the reference is
    single-threaded and has no answer here, FsParser.java:81). Extraction is
    per-turn so no grouping ever needs to undo the salt.
    """
    return F.pmod(
        F.xxhash64(F.col("conv_id"), F.pmod(F.col("turn_idx"), F.lit(skew_salt))),
        F.lit(num_buckets),
    ).cast("int")


def extract_transcripts(
    df: DataFrame,
    settings: ExtractSettings | None = None,
    indexing_date: str = "2026-01-01T00:00:00Z",
) -> DataFrame:
    """Full per-turn extraction plan. Embarrassingly parallel: no shuffle is
    introduced between scan and sink (verified in tests via .explain)."""
    settings = settings or ExtractSettings()
    df = apply_pre_filters(df, settings)
    extract_udf = make_extract_udf(settings)

    out = (
        df.withColumn("part_bucket", salted_bucket(settings.num_buckets, settings.skew_salt))
        .withColumn("ex", extract_udf(F.col("text")))
        .withColumn(
            "doc_id",
            F.sha2(F.concat_ws("/", F.col("conv_id"), F.col("turn_idx").cast("string")), 256),
        )
        .withColumn(
            "file",
            F.struct(
                F.octet_length(F.col("text")).alias("filesize"),
                (
                    F.sha2(F.col("text"), 256)
                    if settings.checksum_algo == "sha256"
                    else F.md5(F.col("text"))
                ).alias("checksum"),
                F.lit(indexing_date).cast("timestamp").alias("indexing_date"),
            ),
        )
    )
    if settings.index_content:
        extracted_col = F.col("ex.extracted").alias("extracted")
        spans_col = F.col("ex.spans").alias("spans")
    else:
        # reference Fs.index_content=false: metadata only — the parse
        # still runs (mime/title/meta/error need it) but no content or
        # span offsets are stored (FsParser indexedChars/content gating)
        extracted_col = F.lit(None).cast("string").alias("extracted")
        spans_col = F.array().cast("array<bigint>").alias("spans")
    cols = [
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "ts",
        "doc_id",
        F.col("ex.mime").alias("mime"),
        extracted_col,
        spans_col,
        F.col("ex.error").alias("error"),
        "file",
        "part_bucket",
    ]
    if settings.parse_object:
        # T13/T14 Doc.object analog: parsed JSON/XML payload as a
        # flattened path->scalar map (FsParser.java:1494-1555)
        cols.append(F.col("ex.object").alias("object"))
    if settings.store_source:
        # T15 store-source: base64 of the original payload (TikaDocParser.java:471-487)
        cols.append(F.base64(F.encode(F.col("text"), "UTF-8")).alias("attachment"))
    # T7 metadata projection: meta struct (Meta bean analog) — title from
    # the parse, language optional (T9, TikaDocParser.java:336-355)
    if settings.lang_detect:
        from fscrawler_spark.functions.text_analysis import langid_udf

        language = (
            F.when(F.col("ex.extracted").isNotNull(), langid_udf()(F.col("ex.extracted")))
            .otherwise(F.lit(None))
            .alias("language")
        )
    else:
        language = F.lit(None).cast("string").alias("language")
    cols.append(
        F.struct(
            F.col("ex.title").alias("title"),
            language,
            F.col("ex.mime").alias("format"),
            F.col("ex.raw").alias("raw"),
        ).alias("meta")
    )
    if not settings.index_content and settings.filters:
        # F2 content filters must see the PARSE output: the stored
        # `extracted` column was just nulled (metadata-only mode), and
        # apply_post_filters' null-keep arm would turn the filter into a
        # keep-all no-op — gate on ex.extracted here instead
        from fscrawler_spark.operators.filters import content_filter_predicate

        out = out.filter(
            F.col("ex.extracted").isNull()
            | content_filter_predicate(F.col("ex.extracted"), settings.filters)
        )
        return out.select(*cols)
    out = out.select(*cols)
    return apply_post_filters(out, settings)
