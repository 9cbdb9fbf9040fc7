"""Driver contract for the spark-graft builder (PySpark target).

queries() — one entry per implemented operator from SURVEY.md §2 plus the
training-data ops (dedup / ANN / text analysis). oracle_sql() — DuckDB
twins. Payload-constructing queries wrap ``documents.text`` in
deterministic HTML/JSON/XML/PDF-like templates keyed on doc_id % 6, run
the REAL extraction UDFs, and the oracle independently derives the
expected answer from the embedded content — so a pass means the
extractor recovered the content exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fscrawler_spark.config import ExtractSettings
from fscrawler_spark.functions import dedup, embeddings
from fscrawler_spark.functions.sniff import sniff_mime_col
from fscrawler_spark.functions.text_analysis import (
    LANG_PROFILES,
    fingerprint,
    normalized_text,
    token_count,
)
from fscrawler_spark.functions.udfs import make_extract_udf
from fscrawler_spark.operators.extract import extract_transcripts
from fscrawler_spark.operators.filters import include_exclude_predicate
from fscrawler_spark.operators.incremental import deleted_keys

# ---------------------------------------------------------------------------
# deterministic payload templates (class = doc_id % 6)
#   0 html / 1 plain / 2 json / 3 xml / 4 pdfish / 5 encrypted
# ---------------------------------------------------------------------------

HTML_PRE = (
    '<!DOCTYPE html><html><head><title>t</title><script>var a=1;</script></head>'
    '<body><nav><a href="/">Home</a> <a href="/d">Docs</a></nav><article><p>'
)
HTML_POST = '</p></article><footer>(c) footer</footer></body></html>'
JSON_PRE = '{"content": "'
JSON_POST = '", "tag": "v"}'
XML_PRE = '<?xml version="1.0"?><doc><body>'
XML_POST = "</body></doc>"
PDF_PRE = "%PDF-SYNTH 1.0\n%%Page: 1\n"

MIME_BY_CLS = [
    "text/html",
    "text/plain",
    "application/json",
    "application/xml",
    "application/pdf",
    "application/octet-stream",
]


def _payload_col():
    t = F.col("text")
    c = F.col("doc_id") % 6
    return (
        F.when(c == 0, F.concat(F.lit(HTML_PRE), t, F.lit(HTML_POST)))
        .when(c == 1, t)
        .when(c == 2, F.concat(F.lit(JSON_PRE), t, F.lit(JSON_POST)))
        .when(c == 3, F.concat(F.lit(XML_PRE), t, F.lit(XML_POST)))
        .when(c == 4, F.concat(F.lit(PDF_PRE), t, F.lit("\n")))
        .otherwise(F.concat(F.lit("ENC:"), t))
    )


# oracle-side: what the extractor must recover, derived from the raw text
SQL_EXTRACTED_CASE = """CASE doc_id % 6
      WHEN 0 THEN trim(text)
      WHEN 1 THEN text
      WHEN 2 THEN text || chr(10) || 'v'
      WHEN 3 THEN trim(text)
      WHEN 4 THEN trim(text)
      ELSE NULL END"""

SQL_MIME_CASE = """CASE doc_id % 6
      WHEN 0 THEN 'text/html' WHEN 1 THEN 'text/plain'
      WHEN 2 THEN 'application/json' WHEN 3 THEN 'application/xml'
      WHEN 4 THEN 'application/pdf' ELSE 'application/octet-stream' END"""


def _ship(spark: SparkSession) -> None:
    """Make UDF closures importable on Python workers regardless of how
    the caller built the session (the driver creates its own)."""
    if not getattr(spark, "_fscrawler_shipped", False):
        try:
            from fscrawler_spark.artifact import ensure_shipped

            ensure_shipped(spark)
            spark._fscrawler_shipped = True
        except Exception as e:  # don't latch: retry next call, stay visible
            import warnings

            warnings.warn(f"fscrawler_spark py-files shipping failed: {e!r}", RuntimeWarning)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ship(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ship(spark)
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _role_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule transcript shape over documents, with a
    deterministic user/assistant role alternation so the assembly
    operators exercise both roles (the extraction queries' turn template
    keeps role='assistant' everywhere; identity stays (conv_id,
    turn_idx)). Module-level so bench.py measures exactly the workload
    the driver oracle validates."""
    d = _docs(spark, sf_dir)
    return d.select(
        F.concat(F.lit("conv-"), (F.col("doc_id") % 50).cast("string")).alias("conv_id"),
        F.expr("CAST(doc_id DIV 50 AS INT)").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.col("text"),
    )


_EMB_COUNT_CACHE: dict = {}


def _emb_count(spark: SparkSession, sf_dir: str) -> int:
    """Embedding-table cardinality, counted ONCE per sf dir per process:
    the ANN queries pin bits=8 (oracle plane literals) and pass this as
    corpus_count so the crossover guard never re-runs a count job inside
    a timed bench iteration."""
    if sf_dir not in _EMB_COUNT_CACHE:
        _EMB_COUNT_CACHE[sf_dir] = _emb(spark, sf_dir).count()
    return _EMB_COUNT_CACHE[sf_dir]


def _extracted(spark: SparkSession, sf_dir: str, limit: int = 100_000) -> DataFrame:
    """documents -> constructed payloads -> REAL extraction UDF."""
    udf = make_extract_udf(ExtractSettings(indexed_chars=limit))
    return (
        _docs(spark, sf_dir)
        .withColumn("payload", _payload_col())
        .withColumn("ex", udf(F.col("payload")))
    )


def _dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ near-dup mutation (last word dropped, id+100000)."""
    d = _docs(spark, sf_dir).select(F.col("doc_id").alias("id"), "text")
    mut = d.select(
        (F.col("id") + 100000).alias("id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    return d.unionByName(mut)

SQL_DUP_CORPUS = """(
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS id, regexp_replace(text, '\\s+\\S+$', '') AS text FROM documents
)"""

SQL_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"

# UTF-8 bytes of this string mis-decoded as cp1252 — the mojibake that
# q_normalize_clean weaves into the fixture; clean_text must restore it
# exactly, so the oracle can assert the repaired literal.
_CLEAN_SRC = "café — naïve"
_MOJI = _CLEAN_SRC.encode("utf-8").decode("cp1252")


def _sql_shingles(norm_expr: str = SQL_NORM, k: int = 3) -> str:
    w = f"string_split({norm_expr}, ' ')"
    return f"""CASE WHEN len({w}) < {k} THEN [array_to_string({w}, ' ')]
      ELSE list_distinct([array_to_string(list_slice({w}, i, i + {k - 1}), ' ')
                          for i in generate_series(1, len({w}) - {k - 1})]) END"""


def _sql_minhash_sig(num_hashes: int = 16) -> str:
    mins = ", ".join(
        f"list_min([('0x' || substr(md5('{s}:' || sh), 1, 15))::BIGINT for sh in shingles])"
        for s in range(num_hashes)
    )
    return f"[{mins}]"


# --- XXH64 in pure DuckDB SQL ----------------------------------------------
# Round-5 close of the last rows-only driver row: `q_minhash_lsh_fast` uses
# Spark's F.xxhash64 (seed 42), which plain DuckDB lacks. The spec
# (github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) is pure 64-bit
# arithmetic, so it IS expressible in SQL: strings are decomposed to UTF-8
# byte lists via unicode() code points, 64-bit wraparound multiplication is
# emulated over HUGEINT with a 32-bit split (no 128-bit overflow), and the
# variable-length stripe/tail loops run as recursive CTEs. Bit-identity with
# F.xxhash64 is pinned by tests/test_round4_fasthash_oracle.py's Python twin
# (itself proven identical to Spark) plus a 232-case random unicode sweep in
# tests/test_round5_sql_xxh64.py. The emitted SQL is machine-built here
# (~85 KB expanded) — the builders below are the readable source of truth.

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_XXSEED = 42  # Spark's default xxhash64 seed
_M64 = 1 << 64


def _sql_mul64(a: str, b: str) -> str:
    """(a*b) mod 2^64 over HUGEINT via 32-bit split: every partial product
    stays under 2^96, inside signed-128 HUGEINT range."""
    return (
        f"(((({a}) % 4294967296) * (({b}) % 4294967296)"
        f" + (((({a}) // 4294967296) * (({b}) % 4294967296)"
        f" + (({a}) % 4294967296) * (({b}) // 4294967296)) % 4294967296) * 4294967296)"
        f" % 18446744073709551616::HUGEINT)"
    )


def _sql_rotl(x: str, r: int) -> str:
    lo = 1 << (64 - r)
    return f"((({x}) % {lo}) * {1 << r} + ({x}) // {lo})"


def _sql_u64le(bs: str, pos: str) -> str:
    """Little-endian uint64 read from a 1-based byte-int list at 0-based pos."""
    terms = " + ".join(
        f"({bs})[({pos}) + {i + 1}]::HUGEINT * {1 << (8 * i)}" for i in range(8)
    )
    return f"({terms})"


def _sql_u32le(bs: str, pos: str) -> str:
    terms = " + ".join(
        f"({bs})[({pos}) + {i + 1}]::HUGEINT * {1 << (8 * i)}" for i in range(4)
    )
    return f"({terms})"


# UTF-8 encoding of one code point `cp` as a list of byte ints (RFC 3629)
_SQL_UTF8 = (
    "CASE WHEN cp < 128 THEN [cp] "
    "WHEN cp < 2048 THEN [192 + cp // 64, 128 + cp % 64] "
    "WHEN cp < 65536 THEN [224 + cp // 4096, 128 + (cp // 64) % 64, 128 + cp % 64] "
    "ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64, 128 + (cp // 64) % 64, 128 + cp % 64] END"
)


def _sql_xxh64_ctes(src: str) -> str:
    """CTE chain computing xxh64(utf8(s), seed=42) for every row of ``src``
    (a CTE with one VARCHAR column ``s``; pass distinct strings). The final
    CTE ``xh`` yields (s, h) with h the SIGNED int64 hash, matching Spark's
    F.xxhash64 column output. Must be spliced into a WITH RECURSIVE.

    Shape: one recursive CTE folds the 32-byte stripe loop with the four
    accumulator lanes as ROWS (one mul64 expansion in the body instead of
    four); the merge rounds and final avalanche are stacked non-recursive
    CTEs (inlining them would blow up textually — each mul64 references its
    operand three times); the 8/1-byte tail loops are two more recursive
    CTEs whose terminal row per string is selected by the loop predicate.
    """
    stripe_u64 = _sql_u64le("bs", "(blk * 32 + (lane - 1) * 8)")
    add = f"((v + {_sql_mul64(stripe_u64, str(_XXP2))}) % 18446744073709551616::HUGEINT)"
    stripe_v = _sql_mul64(_sql_rotl(add, 31), str(_XXP1))

    def merge_round(acc: str, v: str) -> str:
        lane = _sql_mul64(_sql_rotl(_sql_mul64(v, str(_XXP2)), 31), str(_XXP1))
        return (
            f"(({_sql_mul64(f'xor(({acc}), {lane})', str(_XXP1))} + {_XXP4})"
            f" % 18446744073709551616::HUGEINT)"
        )

    t8_k = _sql_mul64(_sql_rotl(_sql_mul64(_sql_u64le("bs", "i"), str(_XXP2)), 31), str(_XXP1))
    t8_acc = (
        f"((({_sql_mul64(_sql_rotl(f'xor(acc, {t8_k})', 27), str(_XXP1))}) + {_XXP4})"
        f" % 18446744073709551616::HUGEINT)"
    )
    u32 = _sql_u32le("bs", "i")
    # u32 < 2^32 and the byte < 2^8, so (u32*P1) and (byte*P5) fit HUGEINT
    # directly — no mul64 split needed on the inner product.
    t4_acc = (
        f"((({_sql_mul64(_sql_rotl(f'xor(acc, ({u32} * {_XXP1}) % 18446744073709551616::HUGEINT)', 23), str(_XXP2))})"
        f" + {_XXP3}) % 18446744073709551616::HUGEINT)"
    )
    t1_acc = _sql_mul64(
        _sql_rotl(f"xor(acc, (bs[i + 1]::HUGEINT * {_XXP5}) % 18446744073709551616::HUGEINT)", 11),
        str(_XXP1),
    )
    v_init = (
        f"CASE lane WHEN 1 THEN {(_XXSEED + _XXP1 + _XXP2) % _M64}"
        f" WHEN 2 THEN {(_XXSEED + _XXP2) % _M64}"
        f" WHEN 3 THEN {_XXSEED}"
        f" ELSE {(_XXSEED - _XXP1) % _M64} END::HUGEINT"
    )
    return f"""
    xb AS (
      SELECT s, flatten([{_SQL_UTF8} for cp in
                         [unicode(substr(s, ci, 1)) for ci in range(1, length(s) + 1)]]) AS bs
      FROM {src}
    ),
    xn AS (SELECT s, bs, len(bs) AS n FROM xb),
    lane_fold AS (
      SELECT s, bs, n, lane, {v_init} AS v, 0 AS blk
      FROM xn, (SELECT unnest([1, 2, 3, 4]) AS lane) lanes
      WHERE n >= 32
      UNION ALL
      SELECT s, bs, n, lane, {stripe_v} AS v, blk + 1
      FROM lane_fold WHERE blk < n // 32
    ),
    lanes AS (SELECT s, lane, v FROM lane_fold WHERE blk = n // 32),
    lmerged AS (
      SELECT s,
             max(CASE WHEN lane = 1 THEN v END) AS v1,
             max(CASE WHEN lane = 2 THEN v END) AS v2,
             max(CASE WHEN lane = 3 THEN v END) AS v3,
             max(CASE WHEN lane = 4 THEN v END) AS v4
      FROM lanes GROUP BY s
    ),
    m0 AS (SELECT s, ({_sql_rotl('v1', 1)} + {_sql_rotl('v2', 7)} + {_sql_rotl('v3', 12)} + {_sql_rotl('v4', 18)})
                     % 18446744073709551616::HUGEINT AS acc, v1, v2, v3, v4 FROM lmerged),
    m1 AS (SELECT s, {merge_round('acc', 'v1')} AS acc, v2, v3, v4 FROM m0),
    m2 AS (SELECT s, {merge_round('acc', 'v2')} AS acc, v3, v4 FROM m1),
    m3 AS (SELECT s, {merge_round('acc', 'v3')} AS acc, v4 FROM m2),
    m4 AS (SELECT s, {merge_round('acc', 'v4')} AS acc FROM m3),
    acc0 AS (
      SELECT x.s, x.bs, x.n, (m4.acc + x.n) % 18446744073709551616::HUGEINT AS acc,
             (x.n // 32) * 32 AS i
      FROM xn x JOIN m4 ON m4.s = x.s
      UNION ALL
      SELECT s, bs, n, ({(_XXSEED + _XXP5) % _M64}::HUGEINT + n) % 18446744073709551616::HUGEINT AS acc, 0 AS i
      FROM xn WHERE n < 32
    ),
    t8 AS (
      SELECT s, bs, n, acc, i FROM acc0
      UNION ALL
      SELECT s, bs, n, {t8_acc} AS acc, i + 8 FROM t8 WHERE i <= n - 8
    ),
    t8f AS (SELECT s, bs, n, acc, i FROM t8 WHERE i > n - 8),
    t4f AS (
      SELECT s, bs, n, CASE WHEN i <= n - 4 THEN {t4_acc} ELSE acc END AS acc,
             CASE WHEN i <= n - 4 THEN i + 4 ELSE i END AS i
      FROM t8f
    ),
    t1 AS (
      SELECT s, bs, n, acc, i FROM t4f
      UNION ALL
      SELECT s, bs, n, {t1_acc} AS acc, i + 1 FROM t1 WHERE i < n
    ),
    t1f AS (SELECT s, acc FROM t1 WHERE i = n),
    av1 AS (SELECT s, xor(acc, acc // 8589934592) AS acc FROM t1f),
    av2 AS (SELECT s, {_sql_mul64('acc', str(_XXP2))} AS acc FROM av1),
    av3 AS (SELECT s, xor(acc, acc // 536870912) AS acc FROM av2),
    av4 AS (SELECT s, {_sql_mul64('acc', str(_XXP3))} AS acc FROM av3),
    av5 AS (SELECT s, xor(acc, acc // 4294967296) AS acc FROM av4),
    xh AS (SELECT s, (CASE WHEN acc >= 9223372036854775808 THEN acc - 18446744073709551616::HUGEINT
                           ELSE acc END)::BIGINT AS h FROM av5)"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full transcripts extraction pipeline on sf0.001."""
    return queries()["q_pipeline_transcripts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- extraction core (T1-T14) -------------------------------------------

    def q_html_extract(spark, sf):
        return _extracted(spark, sf).filter(F.col("doc_id") % 6 == 0).select(
            "doc_id", F.col("ex.extracted").alias("extracted")
        )

    def q_pdf_extract(spark, sf):
        return _extracted(spark, sf).filter(F.col("doc_id") % 6 == 4).select(
            "doc_id", F.col("ex.extracted").alias("extracted")
        )

    def q_json_extract(spark, sf):
        return _extracted(spark, sf).filter(F.col("doc_id") % 6 == 2).select(
            "doc_id", F.col("ex.extracted").alias("extracted")
        )

    def q_xml_extract(spark, sf):
        return _extracted(spark, sf).filter(F.col("doc_id") % 6 == 3).select(
            "doc_id", F.col("ex.extracted").alias("extracted")
        )

    def q_mime_sniff(spark, sf):
        return (
            _docs(spark, sf)
            .withColumn("payload", _payload_col())
            .select(sniff_mime_col(F.col("payload")).alias("mime"))
            .groupBy("mime")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def q_indexed_chars_truncation(spark, sf):
        # plain passthrough with indexed_chars=100 (T2 WriteLimitReached)
        udf = make_extract_udf(ExtractSettings(indexed_chars=100))
        d = _docs(spark, sf).withColumn("ex", udf(F.col("text")))
        return d.select(
            "doc_id",
            F.col("ex.extracted").alias("extracted"),
            # try_element_at + coalesce: ANSI element_at([], -1) THROWS,
            # and an empty/whitespace text yields zero spans (span_end 0
            # matches the oracle's least(length, 100) = 0 for empty)
            F.coalesce(F.try_element_at(F.col("ex.spans"), F.lit(-1)), F.lit(0))
            .bitwiseAND(F.lit(0xFFFFFFFF))
            .alias("span_end"),
        )

    def q_doc_identity(spark, sf):
        # T10 checksum (sha2/md5 built-ins, TikaDocParser.java:93,162-232)
        # + T11 stable doc id (SignTool.sign analog) in ONE projection —
        # merged so the driver's 50-query battery checks every entry
        return _docs(spark, sf).select(
            "doc_id",
            F.sha2(F.col("text"), 256).alias("sha256_hex"),
            F.md5(F.col("text")).alias("md5_hex"),
            F.sha2(F.concat_ws("/", F.col("doc_id").cast("string"), F.lit("0")), 256).alias(
                "stable_id"
            ),
        )

    def q_run_stats(spark, sf):
        from fscrawler_spark.operators.stats import parse_failure_flag

        return _extracted(spark, sf).agg(
            F.count(F.lit(1)).cast("long").alias("turn_count"),
            # needs_ocr rows are excluded (they have their own counter);
            # the fixture's error class (doc_id % 6 = 5) is a genuine
            # parse failure, so the SQL twin is unchanged
            F.sum(parse_failure_flag(F.col("ex.error")))
            .cast("long")
            .alias("parse_failures"),
            F.sum(F.coalesce(F.octet_length("ex.extracted"), F.lit(0))).cast("long").alias("bytes_out"),
            F.sum(F.size("ex.spans")).cast("long").alias("span_count"),
        )

    def q_pipeline_transcripts(spark, sf):
        # flagship: documents -> synthetic transcript turns -> FULL
        # pipeline. ONE turns construction shared with the full-schema /
        # summary siblings (_pipeline_full) so the oracles can never
        # desynchronize on the synthetic-turn template.
        return _pipeline_full(spark, sf).select(
            "conv_id", "turn_idx", "mime", "extracted", "error"
        )

    def q_parsed_object(spark, sf):
        # T13 JSON Doc.object + T14 XML -> map (FsParser.java:1494-1525;
        # XmlDocParser.java:44-82, text nodes keyed '$') in ONE query over
        # both payload classes; the oracle independently derives the
        # expected map entries from the payload templates.
        # try_element_at: the two classes have different keys and ANSI
        # element_at raises on a missing map key.
        udf = make_extract_udf(ExtractSettings(parse_object=True))
        cls = F.col("doc_id") % 6
        d = (
            _docs(spark, sf)
            .filter((cls == 2) | (cls == 3))
            .withColumn("ex", udf(_payload_col()))
        )
        return d.select(
            "doc_id",
            F.when(cls == 2, F.lit("json")).otherwise(F.lit("xml")).alias("fmt"),
            F.coalesce(
                F.try_element_at(F.col("ex.object"), F.lit("content")),
                F.try_element_at(F.col("ex.object"), F.lit("doc.body.$")),
            ).alias("val"),
            F.try_element_at(F.col("ex.object"), F.lit("tag")).alias("tag_val"),
            F.size(F.col("ex.object")).cast("long").alias("n_keys"),
        )

    q.update(
        q_html_extract=q_html_extract,
        q_pdf_extract=q_pdf_extract,
        q_json_extract=q_json_extract,
        q_xml_extract=q_xml_extract,
        q_parsed_object=q_parsed_object,
        q_mime_sniff=q_mime_sniff,
        q_indexed_chars_truncation=q_indexed_chars_truncation,
        q_doc_identity=q_doc_identity,
        q_run_stats=q_run_stats,
        q_pipeline_transcripts=q_pipeline_transcripts,
    )

    # --- filters / joins (F1-F3, J1-J3) --------------------------------------

    def q_size_gate(spark, sf):
        from fscrawler_spark.operators.filters import size_gate_predicate

        return (
            _docs(spark, sf)
            .filter(size_gate_predicate(F.col("text"), 300))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def q_include_exclude_glob(spark, sf):
        return (
            _docs(spark, sf)
            .filter(include_exclude_predicate(F.col("source"), ("src1*",), ("*7",)))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def q_content_filter(spark, sf):
        d = _docs(spark, sf)
        return d.filter(
            F.col("text").rlike("(?m)spark") & F.col("text").rlike("(?m)data")
        ).agg(F.count(F.lit(1)).alias("n"))

    def q_change_detection(spark, sf):
        ev = spark.read.parquet(f"{sf}/events.parquet")
        from fscrawler_spark.operators.incremental import changed_since

        return changed_since(ev, "2024-01-15 00:00:00").groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        )

    def q_deletion_detection(spark, sf):
        orders = spark.read.parquet(f"{sf}/orders.parquet").select(
            F.col("o_orderkey").alias("conv_id"), F.lit(0).alias("turn_idx")
        )
        li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
            F.col("l_orderkey").alias("conv_id"), F.lit(0).alias("turn_idx")
        )
        return deleted_keys(orders, li).select(F.col("conv_id").alias("o_orderkey"))

    def q_tag_merge_deep(spark, sf):
        # J3 nested variant: DocUtils.merge semantics (tags win scalars,
        # doc-only keys copied); oracle reconstructs the exact merged JSON
        from fscrawler_spark.operators.incremental import merge_tags_deep

        d = _docs(spark, sf).select(
            F.col("source").alias("conv_id"),
            "doc_id",
            F.concat(
                F.lit('{"n": '),
                F.col("n_chars").cast("string"),
                F.lit(', "source": "'),
                F.col("source"),
                F.lit('"}'),
            ).alias("external"),
        )
        tags = (
            _docs(spark, sf)
            .select("source")
            .distinct()
            .select(
                F.col("source").alias("conv_id"),
                F.concat(
                    F.lit('{"n": 999, "owner": "'), F.upper("source"), F.lit('"}')
                ).alias("tags_json"),
            )
        )
        return merge_tags_deep(d, tags).select("doc_id", "external")

    def q_changed_vs_snapshot(spark, sf):
        # J1 content variant: re-extract only new-or-changed turns vs the
        # previous run's checksums (FsParser.java:1147-1215 analog)
        from fscrawler_spark.operators.incremental import changed_vs_snapshot

        d = _docs(spark, sf)
        cur = d.select(
            F.col("doc_id").cast("string").alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            "text",
        )
        prev = (
            d.filter(F.col("doc_id") % 7 != 0)  # %7==0 rows are "new"
            .withColumn(
                "prev_text",
                F.when(F.col("doc_id") % 10 == 0, F.concat("text", F.lit(" CHANGED"))).otherwise(
                    F.col("text")
                ),
            )
            .select(
                F.col("doc_id").cast("string").alias("conv_id"),
                F.lit(0).alias("turn_idx"),
                F.struct(F.sha2("prev_text", 256).alias("checksum")).alias("file"),
            )
        )
        return changed_vs_snapshot(cur, prev).select("conv_id")

    def _pipeline_full(spark, sf):
        # full Doc-schema output of the flagship pipeline (shared by the
        # flattened oracle query and the conversation summary)
        d = _docs(spark, sf)
        turns = d.select(
            F.concat(F.lit("conv-"), (F.col("doc_id") % 50).cast("string")).alias("conv_id"),
            F.expr("CAST(doc_id DIV 50 AS INT)").alias("turn_idx"),
            F.lit("assistant").alias("role"),
            _payload_col().alias("text"),
            F.lit(None).cast("string").alias("tool"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.expr("doc_id * INTERVAL 1 SECOND")
            ).alias("ts"),
        )
        return extract_transcripts(turns)

    def q_conversation_summary(spark, sf):
        from fscrawler_spark.operators.stats import conversation_summary

        return conversation_summary(_pipeline_full(spark, sf)).select(
            "conv_id",
            F.col("turn_count").cast("long").alias("turn_count"),
            "first_turn",
            "last_turn",
            "bytes_in",
            "bytes_out",
            "parse_failures",
            "mime_kinds",
        )

    def q_pipeline_transcripts_full(spark, sf):
        """Flagship FULL Doc schema, hash-checked end-to-end: identity +
        extraction + packed spans + file(checksum/filesize/indexing_date)
        + meta(title/language/format), flattened to scalars for the
        driver's canonicalizer (arrays/structs are unhashable there):
        spans encode as comma-joined packed int64s, timestamps as strings.
        part_bucket is excluded — it is pmod(xxhash64(...)) which DuckDB
        cannot reproduce; its semantics are pinned by the pipeline tests
        (test_skew_salting_spreads_megaconv, resume byte-identity)."""
        out = _pipeline_full(spark, sf)
        return out.select(
            "conv_id",
            "turn_idx",
            "role",
            "tool",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "doc_id",
            "mime",
            "extracted",
            F.array_join(F.transform("spans", lambda x: x.cast("string")), ",").alias(
                "spans_packed"
            ),
            "error",
            F.col("file.filesize").cast("long").alias("filesize"),
            F.col("file.checksum").alias("checksum"),
            F.date_format("file.indexing_date", "yyyy-MM-dd HH:mm:ss").alias("indexing_date"),
            F.col("meta.title").alias("title"),
            F.col("meta.language").alias("language"),
            F.col("meta.format").alias("format"),
        )

    q.update(
        q_size_gate=q_size_gate,
        q_include_exclude_glob=q_include_exclude_glob,
        q_content_filter=q_content_filter,
        q_change_detection=q_change_detection,
        q_deletion_detection=q_deletion_detection,
        q_changed_vs_snapshot=q_changed_vs_snapshot,
        q_tag_merge_deep=q_tag_merge_deep,
        q_conversation_summary=q_conversation_summary,
        q_pipeline_transcripts_full=q_pipeline_transcripts_full,
    )

    # --- aggregations / sorts (A1/A3, O2, S9) --------------------------------

    def q_terms_agg(spark, sf):
        return _docs(spark, sf).groupBy("lang").agg(F.count(F.lit(1)).alias("n"))

    def q_search_bool(spark, sf):
        # ES query algebra analog: bool(must=[term, range], must_not=[prefix])
        from fscrawler_spark.operators.search import (
            Bool,
            Prefix,
            Range,
            SearchRequest,
            Term,
            execute_search,
        )

        req = SearchRequest(
            query=Bool(
                must=(Term("lang", "en"), Range("n_chars", gte=100, lt=400)),
                must_not=(Prefix("source", "src1"),),
            ),
            size=1_000_000,
            fields=("doc_id", "source", "n_chars"),
        )
        return execute_search(_docs(spark, sf), req)

    # q_search_terms_agg was a driver-registry row through round 4's
    # mid-round state; demoted to tests/test_analytics_queries.py (same
    # DuckDB value oracle) so the assembly operators could take driver
    # slots within the 50-query cap. A3 stays driver-checked via
    # q_terms_agg; the search-request plumbing via q_search_bool.

    def q_search_highlight(spark, sf):
        # ES highlighter analog (ESSearchRequest.java:27-95): query terms
        # wrapped in <em>..</em>, whole-field fragments
        from fscrawler_spark.operators.search import Match, SearchRequest, execute_search

        req = SearchRequest(
            query=Match("text", "spark data"),
            size=1_000_000,
            fields=("doc_id",),
            highlight=("text",),
        )
        return execute_search(_docs(spark, sf), req)

    def q_search_semantic(spark, sf):
        # ES semantic/knn query analog (ElasticsearchClient.java:800-900):
        # exact scoring for the oracle twin; the LSH route shares the
        # operators verified by q_ann_lsh
        from fscrawler_spark.operators.search import SearchRequest, Semantic, execute_search

        e = _emb(spark, sf)
        vec = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
        req = SearchRequest(
            query=Semantic("embedding", tuple(vec), k=5, id_col="vec_id", exact=True),
            size=5,
            fields=("vec_id",),
        )
        return execute_search(e, req).select(
            "vec_id", F.col("rank").cast("long").alias("rank")
        )

    q.update(
        q_terms_agg=q_terms_agg,
        q_search_bool=q_search_bool,
        q_search_highlight=q_search_highlight,
        q_search_semantic=q_search_semantic,
    )

    # --- text analysis ---------------------------------------------------------

    def q_langid_hits(spark, sf):
        words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        cols = ["doc_id"]
        for lang in sorted(LANG_PROFILES):
            sw = F.array(*[F.lit(w) for w in sorted(LANG_PROFILES[lang])])
            cols.append(
                F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
                .cast("long")
                .alias(f"{lang}_hits")
            )
        return _docs(spark, sf).select(*cols)

    # q_fingerprint (bag-of-words doc fingerprint) was a driver-registry
    # row through round 4; demoted to tests/test_analytics_queries.py
    # (same Spark code + DuckDB twin) in the export-tier registry swap.

    def q_quality_stats(spark, sf):
        # ONE regexp pass: every ASCII whitespace char is outside the
        # punct class (all < 0x21), so the former strip-\s-first chain's
        # first pass removed only chars the second pass removes anyway —
        # value-identical (oracle-checked), half the regexp scans
        punct = F.regexp_replace(F.col("text"), r"[^!-/:-@\[-`{-~]", "")
        return _docs(spark, sf).select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars2"),
            token_count(F.col("text")).cast("long").alias("n_words"),
            F.length(punct).cast("long").alias("n_punct"),
        )

    # --- curation (training-data pipeline ops) -------------------------------

    def q_sample_split(spark, sf):
        # deterministic hash sampling + leakage-free split assignment
        from fscrawler_spark.functions.curation import (
            deterministic_sample,
            train_val_test_split,
        )

        d = train_val_test_split(_docs(spark, sf), key_col="source", weights=(0.8, 0.1, 0.1))
        sampled = deterministic_sample(d, rate=0.5, key_col="doc_id")
        return sampled.groupBy("split").agg(
            F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_id")
        )

    def q_pack_sequences(spark, sf):
        from fscrawler_spark.functions.curation import pack_sequences
        from fscrawler_spark.functions.text_analysis import token_count

        d = _docs(spark, sf).withColumn("tok", token_count(F.col("text")).cast("long"))
        packed = pack_sequences(
            d, token_col="tok", max_tokens=256, part_col="source", order_cols=("doc_id",)
        )
        return packed.groupBy("source", "pack_id").agg(
            F.sum("tok").cast("long").alias("pack_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )

    def q_redact_pii(spark, sf):
        from fscrawler_spark.functions.curation import pii_counts, redact_pii

        # synthetic PII woven deterministically into fixture text
        d = _docs(spark, sf).withColumn(
            "pii_text",
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-123-4567 ssn 123-45-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        red = d.select(
            "doc_id",
            redact_pii(F.col("pii_text")).alias("redacted"),
            F.element_at(pii_counts(F.col("pii_text")), "email").alias("n_email"),
            F.element_at(pii_counts(F.col("pii_text")), "ssn").alias("n_ssn"),
        )
        return red

    def q_repetition(spark, sf):
        from fscrawler_spark.functions.curation import repetition_stats

        return repetition_stats(_docs(spark, sf), n=2).select(
            "id", "ngram_total", "top_ngram_count", "rep_fraction"
        )

    def q_contamination(spark, sf):
        from fscrawler_spark.functions.curation import contamination_check

        d = _docs(spark, sf)
        # benchmark = 8-word windows lifted from every 10th doc (doc_id%10==0)
        bench = d.filter(F.col("doc_id") % 10 == 0).select(
            F.col("doc_id").alias("bench_id"),
            F.array_join(F.slice(F.split(F.trim(F.lower("text")), r"\s+"), 3, 12), " ").alias(
                "text"
            ),
        )
        return contamination_check(d, bench, n=8, min_hits=2)

    q.update(
        q_langid_hits=q_langid_hits,
        q_quality_stats=q_quality_stats,
        q_sample_split=q_sample_split,
        q_pack_sequences=q_pack_sequences,
        q_redact_pii=q_redact_pii,
        q_repetition=q_repetition,
        q_contamination=q_contamination,
    )

    # --- dedup -------------------------------------------------------------------

    def q_dedup_exact(spark, sf):
        return dedup.exact_duplicates(_dup_corpus(spark, sf), id_col="id").select(
            "text_hash", F.col("dup_count").cast("long").alias("dup_count"), "keeper_id"
        )

    # q_minhash_lsh (md5 candidate pairs) was a driver-registry row through
    # mid-round-4; demoted to tests/test_analytics_queries.py (same Spark
    # code + DuckDB twin) in the C4 swap — its oracle-parity role is
    # redundant with q_near_dup_e2e, which value-checks the full md5
    # pipeline INCLUDING the banded-LSH candidate stage.

    # q_ngram_jaccard (inverted-index exact-Jaccard pairs) was a
    # driver-registry row through round 4; demoted to
    # tests/test_analytics_queries.py in the export-tier registry swap —
    # the same jaccard machinery stays driver-checked inside
    # q_near_dup_e2e's verify stage.

    # q_simhash (the bare signature query) was a driver-registry row
    # through round 4's mid-round state; demoted to
    # tests/test_analytics_queries.py (same DuckDB value oracle) for the
    # assembly-operator registry swap. The signature path stays
    # driver-checked THROUGH q_simhash_pairs, which computes the same
    # signatures before banding.

    def q_simhash_pairs(spark, sf):
        # SimHash near-dup pairs (Manku WWW'07 pigeonhole banding)
        sims = dedup.simhash(_dup_corpus(spark, sf), id_col="id", bits=32)
        return dedup.simhash_near_dup_pairs(sims, max_hamming=3, bits=32).select(
            "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
        )

    def q_near_dup_e2e(spark, sf):
        # full dedup pipeline: LSH candidates -> exact-Jaccard verify ->
        # iterative connected components -> keepers. Runs the md5 hash
        # family (the cross-engine-stable twin) so the ENTIRE pipeline —
        # including the iterative CC — is hash-checked against a DuckDB
        # recursive-CTE oracle; the xxhash64 'fast' family is the same
        # dataflow with a cheaper hash (recall-checked in
        # test_round2_dedup_ann.py::test_fast_minhash_recall).
        out = dedup.near_dup_pipeline(
            _dup_corpus(spark, sf), id_col="id", threshold=0.5, hash_family="md5"
        )
        return out.select("id", "cluster_id", F.col("is_keeper").cast("boolean").alias("is_keeper"))

    def q_minhash_lsh_fast(spark, sf):
        # production xxhash64 minhash path. Rows-only through round 4
        # (plain DuckDB has no xxhash64); round 5 closed it with a full
        # value oracle — XXH64 re-derived in pure DuckDB SQL (HUGEINT
        # 32-bit-split wraparound arithmetic + recursive-CTE loops, see
        # _sql_xxh64_ctes) driving the whole normalize→shingle→minhash→
        # band→pair pipeline. The same semantics stay pinned by the
        # pure-Python twin in tests/test_round4_fasthash_oracle.py and
        # the SQL-vs-Spark sweep in tests/test_round5_sql_xxh64.py.
        sigs = dedup.minhash_signatures_fast(_dup_corpus(spark, sf), id_col="id", num_hashes=16)
        return dedup.lsh_candidate_pairs(sigs, num_hashes=16, bands=4)

    q.update(
        q_dedup_exact=q_dedup_exact,
        q_minhash_lsh_fast=q_minhash_lsh_fast,
        q_near_dup_e2e=q_near_dup_e2e,
        q_simhash_pairs=q_simhash_pairs,
    )

    # --- embeddings -----------------------------------------------------------------

    # q_ann_topk (brute-force cosine top-k, the ANN baseline) was a
    # driver-registry row through round 4; demoted to
    # tests/test_analytics_queries.py in the export-tier registry swap —
    # brute_force_topk remains the recall ground truth inside the LSH/IVF
    # recall tests, and q_ann_lsh / q_ann_ivf stay driver-checked.

    def q_ann_lsh(spark, sf):
        # bits PINNED to 8: the DuckDB twin embeds the 8-bit plane
        # literals, so the engine must never auto-size past them. The
        # crossover guard still applies — past ~5M fixture vectors it
        # warns loudly about dropped mass instead of silently diverging
        # from the oracle. corpus_count comes from the per-sf cache so
        # the guard costs no count job inside a timed bench iteration.
        e = _emb(spark, sf)
        out = embeddings.lsh_topk(
            e, e.filter(F.col("vec_id") < 5), k=5, bits=8,
            corpus_count=_emb_count(spark, sf),
        )
        return out.select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id")

    def q_ann_ivf(spark, sf):
        # IVF-flat with deterministically sampled centroids (the brief's
        # "IVF variant as the scale path"); cells + probes reproduced by
        # the SQL twin from the same md5-sampled centroid set
        e = _emb(spark, sf)
        out = embeddings.ivf_topk(
            e, e.filter(F.col("vec_id") < 5), k=5, n_centroids=16, nprobe=2
        )
        return out.select(
            "query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id"
        )

    def q_embed_near_dup(spark, sf):
        # bits pinned to 8 for the same oracle-literal reason as q_ann_lsh
        e = _emb(spark, sf)
        dup = e.withColumn("vec_id", F.col("vec_id") + 100000)
        return embeddings.cosine_near_dup_pairs(
            e.unionByName(dup), threshold=0.999999, bits=8,
            corpus_count=2 * _emb_count(spark, sf),
        ).select("id_a", "id_b")

    q.update(
        q_ann_lsh=q_ann_lsh,
        q_ann_ivf=q_ann_ivf,
        q_embed_near_dup=q_embed_near_dup,
    )

    # --- round-4 training-data curation (normalize / quality / spans / mix) ---

    def q_gopher_quality(spark, sf):
        # Gopher rule gate (curation.gopher_quality_flags, Rae et al. 2021);
        # doc_id%10 rows are made bullet+ellipsis heavy so every rule fires
        # somewhere in the fixture
        from fscrawler_spark.functions.curation import gopher_quality_flags

        d = _docs(spark, sf).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(F.lit("- "), F.col("text"), F.lit(" ...")),
            ).otherwise(F.col("text")),
        )
        g = gopher_quality_flags(F.col("text"))
        return d.select(
            "doc_id",
            g["word_count"].cast("long").alias("word_count"),
            g["stopword_hits"].cast("long").alias("stopword_hits"),
            g["passes"].alias("passes"),
            F.array_join(g["fail_reasons"], ",").alias("fail_reasons"),
        )

    def q_c4_filter(spark, sf):
        # C4 recipe (curation.c4_quality_flags, Raffel et al. 2020 §2.2):
        # fixture weaves each doc's raw text between kept sentinel lines,
        # plus per-id curly / lorem-ipsum / javascript / policy lines so
        # every line rule and page rule fires somewhere
        from fscrawler_spark.functions.curation import c4_quality_flags
        from fscrawler_spark.session import widen

        # the C4 line/page HOF chain is CPU-amplified per row and the
        # corpus parquet arrives in byte-sized splits (sf0.1 is ONE
        # split) — widen the scan so the rules run at session
        # parallelism, not the file's (interleaved paired A/B at
        # sf0.1/local[16]: 1.65s -> 0.70s, min-of-3 ratios 2.24-2.48x);
        # partitioning-only, oracle values unchanged
        d = widen(_docs(spark, sf)).withColumn(
            "text",
            F.concat_ws(
                "\n",
                F.lit("The first fixture sentence is long enough to keep easily."),
                F.lit("tiny."),
                F.col("text"),
                F.when(
                    F.col("doc_id") % 5 == 0,
                    F.lit("A brace {x} sneaks into this otherwise kept sentence."),
                ),
                F.when(
                    F.col("doc_id") % 7 == 0,
                    F.lit("Lorem ipsum dolor sit amet is woven into this sentence."),
                ),
                F.when(
                    F.col("doc_id") % 3 == 0,
                    F.lit("Enable javascript to view the rest of this page now."),
                ),
                F.lit("This site uses cookies and the line should be filtered out."),
                # tab-led + NBSP-trailed: kept ONLY if the line rules trim
                # the full whitespace class (pins the round-4 ws fix —
                # F.trim would leave the NBSP and fail the punct check)
                F.lit("\tA tab padded sentence stays after the whitespace fix.\u00a0"),
                F.lit("The closing fixture sentence also stays in the kept set."),
            ),
        )
        q4 = c4_quality_flags(F.col("text"))
        return d.select(
            "doc_id",
            q4["n_lines"].cast("long").alias("n_lines"),
            q4["n_lines_kept"].cast("long").alias("n_lines_kept"),
            q4["n_sentences"].cast("long").alias("n_sentences"),
            F.length(q4["cleaned_text"]).cast("long").alias("clean_len"),
            q4["passes"].alias("passes"),
            F.array_join(q4["fail_reasons"], ",").alias("fail_reasons"),
        )

    def q_line_dedup(spark, sf):
        # cross-document repeated-line removal (curation.strip_repeated_lines):
        # every doc gets a shared NAV header, a third share a cookie footer
        # (whitespace-padded to exercise the trimmed line key), the rest a
        # unique signature line
        from fscrawler_spark.functions.curation import strip_repeated_lines

        d = _docs(spark, sf).select(
            "doc_id",
            F.concat(
                F.lit("NAV Home | About | Contact\n"),
                F.col("text"),
                F.lit("\n"),
                F.when(
                    F.col("doc_id") % 3 == 0, F.lit("  This site uses cookies.  ")
                ).otherwise(F.concat(F.lit("sig-"), F.col("doc_id").cast("string"))),
            ).alias("text"),
        )
        return strip_repeated_lines(d, min_docs=5)

    def q_normalize_clean(spark, sf):
        # Unicode hygiene (normalize.clean_text): even docs get UTF-8-as-
        # cp1252 mojibake + a NUL (Python repair path), odd docs an ASCII
        # control char (JVM fast path); both must come back clean
        from fscrawler_spark.functions.normalize import clean_text, mojibake_score

        dmg = F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.col("text"), F.lit(" " + _MOJI + "\x00 done")),
        ).otherwise(F.concat(F.col("text"), F.lit("\x07ok")))
        d = _docs(spark, sf).withColumn("dmg", dmg)
        return d.select(
            "doc_id",
            clean_text(F.col("dmg")).alias("cleaned"),
            mojibake_score(F.col("dmg")).cast("long").alias("moji_before"),
        )

    def q_exact_substr_spans(spark, sf):
        # ExactSubstr duplicate spans (exact_substr.duplicate_span_flags,
        # Lee et al. 2021) over the dup corpus: each mutation shares its
        # whole prefix with the original, yielding one span per side. The
        # engine keys on xxhash64(gram); the oracle keys on the gram string
        # itself — identical output barring a 64-bit collision (~1e-9 here).
        from fscrawler_spark.functions.exact_substr import duplicate_span_flags

        flags = duplicate_span_flags(
            _dup_corpus(spark, sf), id_col="id", text_col="text", min_len=50
        )
        return flags.select(
            "id", F.explode("dup_spans").alias("s"), "dup_chars"
        ).select(
            "id",
            F.col("s.start").cast("long").alias("s_start"),
            F.col("s.end").cast("long").alias("s_end"),
            F.col("dup_chars").cast("long").alias("dup_chars"),
        )

    def q_corpus_mix(spark, sf):
        # weighted per-source mixing with epochs (mixing.mix_corpus, The
        # Pile shape): src0 upsampled 2.5x, src1 kept at 25%, src2 dropped,
        # every other source at the 1.0 default
        from fscrawler_spark.functions.mixing import mix_corpus

        mixed = mix_corpus(
            _docs(spark, sf),
            group_col="source",
            rates={"src0": 2.5, "src1": 0.25, "src2": 0.0},
            key_col="doc_id",
        )
        return mixed.groupBy(
            "source", F.col("epoch").cast("long").alias("epoch")
        ).agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_id"))

    def q_perplexity(spark, sf):
        # CCNet-style LM quality (lm_quality): round 5 upgraded this row
        # to the WORD-trigram stupid-backoff model (train_word_lm —
        # hashed n-gram counts, Brants '07 backoff, much closer to
        # CCNet's KenLM semantics than the char model), trained on the
        # corpus itself, scoring every doc. The char-trigram model keeps
        # its own full value oracles in tests/test_round4_perplexity.py
        # and the CLI (--ppl-model char, the default there) — a
        # deliberate, documented model swap. Values are floor-truncated
        # at 1e-3 so float-sum-order differences between the Python UDF
        # and the SQL oracle aggregation cannot flip a digit.
        from fscrawler_spark.functions.lm_quality import add_perplexity, train_word_lm

        d = _docs(spark, sf)
        lm = train_word_lm(d, n=3, alpha=0.4, min_count=2, max_ngrams=200_000)
        return add_perplexity(d, lm).select(
            "doc_id", (F.floor(F.col("ppl") * 1000) / 1000).alias("ppl_t")
        )

    def q_assemble_conversations(spark, sf):
        # conversation-level training documents: turns stitched under the
        # <|role|> template in stable turn order (assembly module; the
        # reference's folder-rollup analog, FsParser.java:214-260)
        from fscrawler_spark.functions.assembly import assemble_conversations

        return assemble_conversations(_role_turns(spark, sf))

    # q_sft_pairs ((prompt, response) SFT examples over the role-alternating
    # turn shape) was a driver-registry row through round 4; demoted to
    # tests/test_analytics_queries.py (same Spark code + DuckDB twin) in the
    # preference-pair registry swap — q_preference_pairs drives the same
    # sft_examples path end-to-end before pairing.

    def q_preference_pairs(spark, sf):
        # DPO-style preference pairs (assembly.preference_pairs): two-turn
        # conversations whose user question cycles through 7 templates, so
        # each rendered prompt groups ~N/7 candidate responses; chosen /
        # rejected are the argmax/argmin responses per prompt. The driver
        # row scores by whitespace token count (integer-exact in both
        # engines); the composite quality_score default is pytest-covered
        # (test_round4_preference.py).
        from fscrawler_spark.functions.assembly import preference_pairs, sft_examples

        d = _docs(spark, sf).select("doc_id", "text")
        conv = F.concat(F.lit("c"), F.col("doc_id").cast("string")).alias("conv_id")
        user = d.select(
            conv,
            F.lit(0).alias("turn_idx"),
            F.lit("user").alias("role"),
            F.concat(F.lit("Question "), (F.col("doc_id") % 7).cast("string")).alias("text"),
        )
        asst = d.select(
            conv, F.lit(1).alias("turn_idx"), F.lit("assistant").alias("role"), F.col("text")
        )
        ex = sft_examples(
            user.unionByName(asst), target_role="assistant", context_turns=1
        )
        return preference_pairs(ex, score=token_count(F.col("response")))

    def q_doc_line_dedup(spark, sf):
        # WITHIN-doc repeated-line removal (curation.dedupe_doc_lines):
        # the fixture weaves the same nav line three times per doc — one
        # of them whitespace-padded to exercise the trimmed key — plus a
        # unique trailer; expect exactly the first occurrence kept
        from fscrawler_spark.functions.curation import dedupe_doc_lines

        d = _docs(spark, sf).withColumn(
            "woven",
            F.concat_ws(
                "\n",
                F.lit("INTRO repeated line."),
                F.col("text"),
                F.lit("INTRO repeated line."),
                F.lit("  INTRO repeated line.  "),
                F.concat(F.lit("unique-"), F.col("doc_id").cast("string")),
            ),
        )
        r = dedupe_doc_lines(F.col("woven"))
        return d.select(
            "doc_id",
            r["text"].alias("text"),
            r["kept_lines"].alias("kept_lines"),
            r["removed_lines"].alias("removed_lines"),
        )

    def q_canonical_dedup(spark, sf):
        # quality-aware keeper selection (dedup.keep_best_of_cluster):
        # every third doc joins a synthetic %97 cluster, quality = text
        # length; survivors = per-cluster argmax(quality, id) + all
        # unclustered docs
        from fscrawler_spark.functions.dedup import keep_best_of_cluster

        d = _docs(spark, sf).withColumn(
            "quality", F.coalesce(F.length("text"), F.lit(-1)).cast("long")
        )
        clusters = d.filter(F.col("doc_id") % 3 == 0).select(
            F.col("doc_id").alias("id"), (F.col("doc_id") % 97).alias("cluster_id")
        )
        kept = keep_best_of_cluster(d, clusters, quality_col="quality")
        return kept.select("doc_id", "quality")

    def q_export_manifest(spark, sf):
        # training-data export layout (export.training_order +
        # shard_manifest): deterministic md5 epoch permutation, hash
        # shards, XOR checksums — the manifest IS the shard assignment
        # and ordering made value-checkable
        from fscrawler_spark.functions.export import shard_manifest, training_order

        ordered = training_order(_docs(spark, sf), id_col="doc_id", seed=7, n_shards=8)
        m = shard_manifest(ordered, text_col="text")
        return m.select(
            F.col("shard").cast("int").alias("shard"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("key_xor").cast("long").alias("key_xor"),
            "min_key",
            "max_key",
            F.col("bytes").cast("long").alias("bytes"),
        )

    q.update(
        q_gopher_quality=q_gopher_quality,
        q_c4_filter=q_c4_filter,
        q_line_dedup=q_line_dedup,
        q_doc_line_dedup=q_doc_line_dedup,
        q_canonical_dedup=q_canonical_dedup,
        q_export_manifest=q_export_manifest,
        q_normalize_clean=q_normalize_clean,
        q_exact_substr_spans=q_exact_substr_spans,
        q_corpus_mix=q_corpus_mix,
        q_perplexity=q_perplexity,
        q_assemble_conversations=q_assemble_conversations,
        q_preference_pairs=q_preference_pairs,
    )

    # --- multimodal: REAL container decode, full value oracle -----------------------
    # (round 5: upgraded from the rows-ish byte_len smoke — the fixture
    # authors genuine PNG/WAV bytes per doc_id, probe_media_headers
    # parses them back with the stdlib header parsers, and every probed
    # field is closed-form in doc_id so the oracle checks true decode.)

    def q_media_features(spark, sf):
        from fscrawler_spark.functions.multimodal import (
            media_probe_fixture,
            probe_media_headers,
        )

        return probe_media_headers(media_probe_fixture(_docs(spark, sf))).select(
            "media_id", "kind", "mime", "width", "height", "channels",
            "bit_depth", "sample_rate", "duration_ms", "decode_error",
        )

    q.update(q_media_features=q_media_features)
    return q


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    for name, cls in [
        ("q_html_extract", 0),
        ("q_pdf_extract", 4),
        ("q_json_extract", 2),
        ("q_xml_extract", 3),
    ]:
        sql[name] = f"""
        SELECT doc_id, {SQL_EXTRACTED_CASE} AS extracted
        FROM documents WHERE doc_id % 6 = {cls}
        """

    sql["q_parsed_object"] = """
    SELECT doc_id, 'json' AS fmt, text AS val, 'v' AS tag_val, 2::BIGINT AS n_keys
    FROM documents WHERE doc_id % 6 = 2
    UNION ALL
    SELECT doc_id, 'xml' AS fmt, text AS val, NULL AS tag_val, 1::BIGINT AS n_keys
    FROM documents WHERE doc_id % 6 = 3
    """

    sql["q_mime_sniff"] = f"""
    SELECT {SQL_MIME_CASE} AS mime, count(*) AS n FROM documents GROUP BY 1
    """

    sql["q_indexed_chars_truncation"] = """
    SELECT doc_id, substr(text, 1, 100) AS extracted,
           least(length(text), 100)::BIGINT AS span_end
    FROM documents
    """

    sql["q_doc_identity"] = """
    SELECT doc_id, sha256(text) AS sha256_hex, md5(text) AS md5_hex,
           sha256(doc_id::VARCHAR || '/0') AS stable_id
    FROM documents
    """

    sql["q_run_stats"] = """
    SELECT count(*)::BIGINT AS turn_count,
           (count(*) FILTER (WHERE doc_id % 6 = 5))::BIGINT AS parse_failures,
           sum(CASE doc_id % 6
                 WHEN 0 THEN strlen(trim(text)) WHEN 1 THEN strlen(text)
                 WHEN 2 THEN strlen(text) + 2 WHEN 3 THEN strlen(trim(text))
                 WHEN 4 THEN strlen(trim(text)) ELSE 0 END)::BIGINT AS bytes_out,
           sum(CASE doc_id % 6 WHEN 2 THEN 2 WHEN 5 THEN 0 ELSE 1 END)::BIGINT AS span_count
    FROM documents
    """

    sql["q_pipeline_transcripts"] = f"""
    SELECT 'conv-' || (doc_id % 50)::VARCHAR AS conv_id,
           (doc_id // 50)::INT AS turn_idx,
           {SQL_MIME_CASE} AS mime,
           {SQL_EXTRACTED_CASE} AS extracted,
           CASE WHEN doc_id % 6 = 5 THEN 'encrypted' ELSE NULL END AS error
    FROM documents
    """

    sql["q_size_gate"] = """
    SELECT source, count(*) AS n FROM documents
    WHERE text IS NULL OR strlen(text) <= 300 GROUP BY source
    """  # strlen = BYTE length in DuckDB, octet_length twin; nulls kept

    sql["q_include_exclude_glob"] = """
    SELECT source, count(*) AS n FROM documents
    WHERE regexp_matches(source, '(?i)^src1.*$') AND NOT regexp_matches(source, '(?i)^.*7$')
    GROUP BY source
    """

    sql["q_content_filter"] = """
    SELECT count(*) AS n FROM documents
    WHERE regexp_matches(text, 'spark') AND regexp_matches(text, 'data')
    """

    sql["q_change_detection"] = """
    SELECT event_type, count(*) AS n FROM events
    WHERE ts > TIMESTAMP '2024-01-15 00:00:00' - INTERVAL 2 SECOND
    GROUP BY event_type
    """

    sql["q_deletion_detection"] = """
    SELECT o_orderkey FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """

    # json.dumps(sort_keys=True) output: keys n < owner < source, ', ' / ': '
    # separators; tags' n=999 wins the scalar conflict (DocUtils precedence)
    sql["q_tag_merge_deep"] = """
    SELECT doc_id,
           '{"n": 999, "owner": "' || upper(source) || '", "source": "' || source || '"}'
             AS external
    FROM documents
    """

    sql["q_changed_vs_snapshot"] = """
    SELECT doc_id::VARCHAR AS conv_id FROM documents
    WHERE doc_id % 10 = 0 OR doc_id % 7 = 0
    """

    payload_len = f"""CASE doc_id % 6
      WHEN 0 THEN strlen(text) + {len(HTML_PRE.encode()) + len(HTML_POST.encode())}
      WHEN 1 THEN strlen(text)
      WHEN 2 THEN strlen(text) + {len(JSON_PRE.encode()) + len(JSON_POST.encode())}
      WHEN 3 THEN strlen(text) + {len(XML_PRE.encode()) + len(XML_POST.encode())}
      WHEN 4 THEN strlen(text) + {len(PDF_PRE.encode()) + 1}
      ELSE strlen(text) + 4 END"""

    # the exact payload string per class (for checksum parity); PDF_PRE
    # newlines are injected via chr(10) to keep the SQL single-line-safe
    pdf_pre_sql = " || chr(10) || ".join(f"'{seg}'" for seg in PDF_PRE.split("\n") if seg) + " || chr(10)"
    payload_sql = f"""CASE doc_id % 6
      WHEN 0 THEN '{HTML_PRE}' || text || '{HTML_POST}'
      WHEN 1 THEN text
      WHEN 2 THEN '{JSON_PRE}' || text || '{JSON_POST}'
      WHEN 3 THEN '{XML_PRE}' || text || '{XML_POST}'
      WHEN 4 THEN {pdf_pre_sql} || text || chr(10)
      ELSE 'ENC:' || text END"""

    # spans are (start << 32 | end) packed int64s over the PAYLOAD; every
    # class yields statically-known offsets because the fixture text has
    # no newlines / leading / trailing whitespace (verified in testdata):
    #   html: one run inside <article><p> at HTML_PRE..+len
    #   json: the "content" value + the "tag" value 'v' (11 chars after)
    #   xml/pdf: one body/line run at PRE..+len; plain: (0, len); enc: []
    def _pk(start: str, end: str) -> str:
        return f"(({start})::BIGINT * 4294967296 + ({end}))::VARCHAR"

    p0, pj, px, pp = len(HTML_PRE), len(JSON_PRE), len(XML_PRE), len(PDF_PRE)
    vj = pj + 11  # offset of the 'v' tag value after the content value ends
    spans_sql = f"""CASE doc_id % 6
      WHEN 0 THEN {_pk(str(p0), f"{p0} + length(text)")}
      WHEN 1 THEN {_pk("0", "length(text)")}
      WHEN 2 THEN {_pk(str(pj), f"{pj} + length(text)")} || ',' ||
                  {_pk(f"length(text) + {vj}", f"length(text) + {vj + 1}")}
      WHEN 3 THEN {_pk(str(px), f"{px} + length(text)")}
      WHEN 4 THEN {_pk(str(pp), f"{pp} + length(text)")}
      ELSE '' END"""

    sql["q_pipeline_transcripts_full"] = f"""
    SELECT 'conv-' || (doc_id % 50)::VARCHAR AS conv_id,
           (doc_id // 50)::INT AS turn_idx,
           'assistant' AS role,
           NULL::VARCHAR AS tool,
           strftime(TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND,
                    '%Y-%m-%d %H:%M:%S') AS ts,
           sha256('conv-' || (doc_id % 50)::VARCHAR || '/' || (doc_id // 50)::VARCHAR) AS doc_id,
           {SQL_MIME_CASE} AS mime,
           {SQL_EXTRACTED_CASE} AS extracted,
           {spans_sql} AS spans_packed,
           CASE WHEN doc_id % 6 = 5 THEN 'encrypted' ELSE NULL END AS error,
           ({payload_len})::BIGINT AS filesize,
           sha256({payload_sql}) AS checksum,
           '2026-01-01 00:00:00' AS indexing_date,
           CASE WHEN doc_id % 6 = 0 THEN 't' ELSE NULL END AS title,
           NULL::VARCHAR AS language,
           {SQL_MIME_CASE} AS format
    FROM documents
    """
    sql["q_conversation_summary"] = f"""
    SELECT 'conv-' || (doc_id % 50)::VARCHAR AS conv_id,
           count(*)::BIGINT AS turn_count,
           min(doc_id // 50)::INT AS first_turn,
           max(doc_id // 50)::INT AS last_turn,
           sum({payload_len})::BIGINT AS bytes_in,
           sum(CASE doc_id % 6
                 WHEN 0 THEN strlen(trim(text)) WHEN 1 THEN strlen(text)
                 WHEN 2 THEN strlen(text) + 2 WHEN 3 THEN strlen(trim(text))
                 WHEN 4 THEN strlen(trim(text)) ELSE 0 END)::BIGINT AS bytes_out,
           (count(*) FILTER (WHERE doc_id % 6 = 5))::BIGINT AS parse_failures,
           count(DISTINCT {SQL_MIME_CASE})::BIGINT AS mime_kinds
    FROM documents GROUP BY 1
    """

    sql["q_terms_agg"] = "SELECT lang, count(*) AS n FROM documents GROUP BY lang"

    sql["q_search_bool"] = """
    SELECT doc_id, source, n_chars FROM documents
    WHERE lang = 'en' AND n_chars >= 100 AND n_chars < 400
      AND NOT starts_with(source, 'src1')
    """

    sql["q_search_highlight"] = """
    SELECT doc_id,
           regexp_replace(text, '(?i)\\b(data|spark)\\b', '<em>\\1</em>', 'g') AS text_highlight
    FROM documents
    WHERE list_contains(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'), 'spark')
       OR list_contains(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'), 'data')
    """

    sql["q_search_semantic"] = """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    r AS (SELECT c.vec_id,
                 row_number() OVER (
                   ORDER BY list_cosine_similarity(c.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC,
                            c.vec_id) AS rank
          FROM embeddings c, q)
    SELECT vec_id, rank::BIGINT AS rank FROM r WHERE rank <= 5
    """

    lang_cols = []
    for lang in sorted(LANG_PROFILES):
        words = ", ".join(f"'{w}'" for w in sorted(LANG_PROFILES[lang]))
        lang_cols.append(
            f"len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x IN ({words})))::BIGINT AS {lang}_hits"
        )
    sql["q_langid_hits"] = f"SELECT doc_id, {', '.join(lang_cols)} FROM documents"

    # q_fingerprint's twin moved to tests/test_analytics_queries.py with
    # the demoted query (export-tier registry swap)

    sql["q_quality_stats"] = """
    SELECT doc_id, length(text)::BIGINT AS n_chars2,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END::BIGINT AS n_words,
           length(regexp_replace(regexp_replace(text, '\\s+', '', 'g'),
                                 '[^!-/:-@\\[-`{-~]', '', 'g'))::BIGINT AS n_punct
    FROM documents
    """

    # --- curation oracles ----------------------------------------------------

    sql["q_sample_split"] = """
    WITH d AS (
      SELECT *,
        ('0x'||substr(md5('split'||source),1,15))::BIGINT % 1000000 AS sb,
        ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT % 1000000 AS kb
      FROM documents
    )
    SELECT CASE WHEN sb < 800000 THEN 'train' WHEN sb < 900000 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n, min(doc_id) AS min_id
    FROM d WHERE kb < 500000 GROUP BY 1
    """

    tok_expr = """CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '\\s+')) END::BIGINT"""
    sql["q_pack_sequences"] = f"""
    WITH RECURSIVE base AS (
      SELECT source, doc_id, {tok_expr} AS tok,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ),
    r AS (
      SELECT source, doc_id, tok, rn, tok AS acc, 0::BIGINT AS pack
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.source, b.doc_id, b.tok, b.rn,
             CASE WHEN r.acc + b.tok <= 256 THEN r.acc + b.tok ELSE b.tok END,
             CASE WHEN r.acc + b.tok <= 256 THEN r.pack ELSE r.pack + 1 END
      FROM r JOIN base b ON b.source = r.source AND b.rn = r.rn + 1
    )
    SELECT source, pack AS pack_id, sum(tok)::BIGINT AS pack_tokens,
           count(*) AS n_docs, min(doc_id) AS first_doc
    FROM r GROUP BY source, pack
    """

    pii_src = (
        "text || ' contact user' || doc_id::VARCHAR || "
        "'@example.com or 555-123-4567 ssn 123-45-' || "
        "lpad((doc_id % 10000)::VARCHAR, 4, '0')"
    )
    email_pat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    # leading captured boundary (re-emitted as \\1 — RE2 backref syntax;
    # the Spark twin uses $1) so digit-run tails never match
    phone_pat = "(^|[^\\d.])((?:\\+?\\d{1,2}[-. ])?\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}\\b)"
    ssn_pat = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
    ip_pat = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
    sql["q_redact_pii"] = f"""
    WITH p AS (SELECT doc_id, {pii_src} AS s FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             s, '{email_pat}', '<EMAIL>', 'g'),
             '{phone_pat}', '\\1<PHONE>', 'g'),
             '{ssn_pat}', '<SSN>', 'g'),
             '{ip_pat}', '<IP>', 'g') AS redacted,
           len(regexp_extract_all(s, '{email_pat}'))::BIGINT AS n_email,
           len(regexp_extract_all(s, '{ssn_pat}'))::BIGINT AS n_ssn
    FROM p
    """

    sql["q_repetition"] = """
    WITH toks AS (SELECT doc_id AS id,
                         string_split_regex(trim(lower(text)), '\\s+') AS w
                  FROM documents),
    grams AS (
      SELECT id, unnest([array_to_string(list_slice(w, i, i + 1), ' ')
                         for i in generate_series(1, len(w) - 1)]) AS g
      FROM toks WHERE len(w) >= 2
    ),
    counts AS (SELECT id, g, count(*) AS c FROM grams GROUP BY id, g),
    agg AS (SELECT id, sum(c)::BIGINT AS ngram_total, max(c)::BIGINT AS top_ngram_count
            FROM counts GROUP BY id)
    -- EVERY doc gets a row (short/null-text docs: explicit zeros), like
    -- the engine's explode_outer
    SELECT t.id,
           coalesce(a.ngram_total, 0)::BIGINT AS ngram_total,
           coalesce(a.top_ngram_count, 0)::BIGINT AS top_ngram_count,
           CASE WHEN coalesce(a.ngram_total, 0) > 0
                THEN floor(a.top_ngram_count / a.ngram_total * 1000000) / 1000000
                ELSE 0.0 END AS rep_fraction
    FROM toks t LEFT JOIN agg a ON a.id = t.id
    """

    sql["q_contamination"] = """
    WITH cw AS (SELECT doc_id AS id,
                       string_split_regex(trim(lower(text)), '\\s+') AS w
                FROM documents),
    cg AS (
      SELECT id, unnest(list_distinct([array_to_string(list_slice(w, i, i + 7), ' ')
                                       for i in generate_series(1, len(w) - 7)])) AS g
      FROM cw WHERE len(w) >= 8
    ),
    bw AS (SELECT doc_id AS bench_id,
                  list_slice(string_split_regex(trim(lower(text)), '\\s+'), 3, 14) AS w
           FROM documents WHERE doc_id % 10 = 0),
    bg AS (
      SELECT bench_id, unnest(list_distinct([array_to_string(list_slice(w, i, i + 7), ' ')
                                             for i in generate_series(1, len(w) - 7)])) AS g
      FROM bw WHERE len(w) >= 8
    )
    SELECT cg.id, bg.bench_id, count(*) AS hits
    FROM cg JOIN bg ON cg.g = bg.g
    GROUP BY 1, 2 HAVING count(*) >= 2
    """

    sql["q_dedup_exact"] = f"""
    SELECT md5({SQL_NORM}) AS text_hash, count(*)::BIGINT AS dup_count, min(id) AS keeper_id
    FROM {SQL_DUP_CORPUS} GROUP BY 1 HAVING count(*) > 1
    """

    rows_per_band = 4
    band_selects = []
    for b in range(4):
        lo = b * rows_per_band + 1
        band_selects.append(
            f"""SELECT id, {b} AS band,
                md5(array_to_string([x::VARCHAR for x in list_slice(sig, {lo}, {lo + rows_per_band - 1})], ',')) AS bucket
                FROM sigs"""
        )
    # the giant-bucket guard (max_bucket=1000, dedup.lsh_candidate_pairs
    # default) is modeled in SQL too — Spark and oracle compute the same
    # function even on a fixture with a degenerate mega-bucket
    banded_ok = """banded_ok AS (
      SELECT id, band, bucket FROM (
        SELECT *, count(*) OVER (PARTITION BY band, bucket) AS bsz FROM banded
      ) WHERE bsz <= 1000
    )"""
    # (q_minhash_lsh's candidate-pair twin moved with its demotion to
    # tests/test_analytics_queries.py; the band machinery above stays —
    # q_near_dup_e2e's oracle uses it.)

    # full near-dup pipeline oracle: md5 MinHash -> banded LSH candidates
    # -> exact-Jaccard verify -> connected components via a recursive-CTE
    # transitive closure (min reachable id == the Spark side's iterative
    # min-label propagation fixpoint) -> keeper = cluster min
    sql["q_near_dup_e2e"] = f"""
    WITH RECURSIVE base AS (SELECT id, {_sql_shingles()} AS shingles FROM {SQL_DUP_CORPUS}),
    sigs AS (SELECT id, {_sql_minhash_sig(16)} AS sig FROM base),
    banded AS ({' UNION ALL '.join(band_selects)}),
    {banded_ok},
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM banded_ok a JOIN banded_ok b
        ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    ),
    sizes AS (SELECT id, len(shingles) AS n FROM base),
    inv AS (SELECT id, unnest(shingles) AS s FROM base),
    common AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS common
      FROM inv a JOIN inv b ON a.s = b.s AND a.id < b.id
      GROUP BY 1, 2
    ),
    verified AS (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN common m ON m.id_a = c.id_a AND m.id_b = c.id_b
      JOIN sizes na ON na.id = c.id_a
      JOIN sizes nb ON nb.id = c.id_b
      WHERE m.common / (na.n + nb.n - m.common) >= 0.5
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM verified
              UNION SELECT id_b, id_a FROM verified),
    walk AS (
      SELECT a AS id, a AS reach FROM edges
      UNION
      SELECT w.id, e.b FROM walk w JOIN edges e ON e.a = w.reach
    )
    SELECT id, min(reach) AS cluster_id, (id = min(reach)) AS is_keeper
    FROM walk GROUP BY id
    """

    # xxhash64 fast-minhash oracle (round 5): the full production path —
    # normalize → positional shingles → XXH64 (the pure-SQL build above) →
    # 31-bit fold → 16 Carter-Wegman permutations → min-agg → band → cap →
    # candidate pairs — entirely in DuckDB SQL, closing the one driver row
    # that was rows-only through round 4. Shingles here use the fast path's
    # positional form (sequence over greatest(nw-2,1), no distinct — min
    # over a multiset equals min over its set) rather than _sql_shingles'
    # CASE form; list_slice clamps at the end exactly like F.slice.
    _xw = f"string_split({SQL_NORM}, ' ')"
    _xmins = ", ".join(
        f"min((h31 * {dedup._MIX_A[s % len(dedup._MIX_A)]}::BIGINT + {s}) % 2147483647) AS _h{s}"
        for s in range(16)
    )
    _xsig = "[" + ", ".join(f"_h{s}" for s in range(16)) + "]"
    _xband_selects = []
    for b in range(4):
        lo = b * 4 + 1
        _xband_selects.append(
            f"""SELECT id, {b} AS band,
            md5(array_to_string([x::VARCHAR for x in list_slice(sig, {lo}, {lo + 3})], ',')) AS bucket
            FROM fsigs"""
        )
    sql["q_minhash_lsh_fast"] = f"""
    WITH RECURSIVE fcorpus AS (SELECT * FROM {SQL_DUP_CORPUS} WHERE text IS NOT NULL),
    fshing AS (
      SELECT id, unnest([array_to_string(list_slice({_xw}, i, i + 2), ' ')
                         for i in generate_series(1, greatest(len({_xw}) - 2, 1))]) AS s
      FROM fcorpus
    ),
    fsrc AS (SELECT DISTINCT s FROM fshing),{_sql_xxh64_ctes('fsrc')},
    fh31 AS (SELECT s, ((h % 2147483647) + 2147483647) % 2147483647 AS h31 FROM xh),
    fsigs AS (
      SELECT id, {_xsig} AS sig FROM (
        SELECT fshing.id, {_xmins}
        FROM fshing JOIN fh31 ON fh31.s = fshing.s
        GROUP BY fshing.id
      )
    ),
    fbanded AS ({' UNION ALL '.join(_xband_selects)}),
    fcapped AS (
      SELECT id, band, bucket FROM (
        SELECT *, count(*) OVER (PARTITION BY band, bucket) AS bsz FROM fbanded
      ) WHERE bsz <= 1000
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b
    FROM fcapped a JOIN fcapped b
      ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    """

    # q_ngram_jaccard's twin moved to tests/test_analytics_queries.py
    # with the demoted query (export-tier registry swap)

    # masks for 4 pigeonhole bands of the 32-bit simhash (max_hamming=3)
    _sh_masks = ", ".join(f"({b}, {((1 << 8) - 1) << (b * 8)})" for b in range(4))
    sql["q_simhash_pairs"] = f"""
    WITH toks AS (
      SELECT id, unnest(list_distinct(string_split({SQL_NORM}, ' '))) AS tok
      FROM {SQL_DUP_CORPUS}
    ),
    h AS (SELECT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
    votes AS (
      SELECT id, bit, sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM h, (SELECT unnest(generate_series(0, 31)) AS bit) bits
      GROUP BY id, bit
    ),
    sh AS (
      SELECT id, sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
      FROM votes GROUP BY id
    ),
    banded AS (
      SELECT id, simhash, m.band, simhash & m.mask AS bucket
      FROM sh, (VALUES {_sh_masks}) AS m(band, mask)
    ),
    capped AS (
      SELECT id, simhash, band, bucket FROM (
        SELECT *, count(*) OVER (PARTITION BY band, bucket) AS bsz FROM banded
      ) WHERE bsz <= 1000
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
    FROM capped a JOIN capped b
      ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """

    # q_ann_topk's twin moved to tests/test_analytics_queries.py with
    # the demoted query (export-tier registry swap)

    # --- random-hyperplane ANN LSH oracle twins ------------------------------
    # The SAME seeded hyperplane literals used by the Spark side
    # (embeddings.random_hyperplanes rounds to 6dp precisely so both
    # engines hash identical plane values); buckets are precomputed per
    # vector in a CTE, candidates = bucket match in ANY table. The ANN
    # bucket cap (max_bucket=20000) is NOT modeled here: a 20k-member
    # bucket cannot occur at oracle scale (500 vectors), unlike the
    # minhash cap which IS modeled in its oracle. Sign-of-dot
    # parity between numpy GEMM and DuckDB list_dot_product holds unless a
    # dot product lands within float summation error of 0 (~1e-13) —
    # practically impossible with gaussian planes over real embeddings.
    from fscrawler_spark.functions.embeddings import random_hyperplanes

    _planes = random_hyperplanes(dim=64, bits=8, tables=4, seed=42)

    def _hp_bucket_sql(v: str, table_planes) -> str:
        terms = []
        for b, plane in enumerate(table_planes):
            lst = "[" + ",".join(repr(x) for x in plane) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product({v}::DOUBLE[], {lst}::DOUBLE[]) > 0 "
                f"THEN {1 << b} ELSE 0 END)"
            )
        return "(" + " + ".join(terms) + ")"

    _bk_cols = ", ".join(
        f"{_hp_bucket_sql('embedding', _planes[t])} AS bk{t}" for t in range(len(_planes))
    )
    _any_match = " OR ".join(f"q.bk{t} = c.bk{t}" for t in range(len(_planes)))
    sql["q_ann_lsh"] = f"""
    WITH bk AS (SELECT vec_id, embedding, {_bk_cols} FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS qv, * EXCLUDE (vec_id, embedding)
          FROM bk WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(c.embedding::DOUBLE[], q.qv::DOUBLE[]) AS sim
      FROM bk c, q
      WHERE c.vec_id <> q.query_id AND ({_any_match})
    ),
    r AS (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
          FROM scored)
    SELECT query_id, rnk::BIGINT AS rank, neighbor_id FROM r WHERE rnk <= 5
    """

    sql["q_ann_ivf"] = """
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cv
      FROM (SELECT *, ('0x'||substr(md5(vec_id::VARCHAR),1,15))::BIGINT AS h
            FROM embeddings ORDER BY h, vec_id LIMIT 16)
    ),
    assign AS (
      SELECT e.vec_id, e.embedding, c.cid,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[]) DESC,
                        c.cid) AS crnk
      FROM embeddings e, cent c
    ),
    corpus AS (SELECT vec_id AS neighbor_id, embedding AS cv2, cid AS cell
               FROM assign WHERE crnk = 1),
    qcells AS (SELECT vec_id AS query_id, embedding AS qv, cid AS cell
               FROM assign WHERE vec_id < 5 AND crnk <= 2),
    cand AS (
      SELECT DISTINCT q.query_id, q.qv, c.neighbor_id, c.cv2
      FROM corpus c JOIN qcells q USING (cell)
      WHERE c.neighbor_id <> q.query_id
    ),
    scored AS (SELECT query_id, neighbor_id,
                      list_cosine_similarity(cv2::DOUBLE[], qv::DOUBLE[]) AS sim
               FROM cand),
    r AS (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
          FROM scored)
    SELECT query_id, rnk::BIGINT AS rank, neighbor_id FROM r WHERE rnk <= 5
    """

    # multimodal REAL decode: the fixture (media_probe_fixture) authors a
    # spec-valid PNG sized (id%64+1, id%37+1) for image rows and a
    # stdlib-wave PCM file ((id%10+1)*80 frames @ 8 kHz, id%2+1 channels)
    # for audio rows; probe_media_headers parses the bytes back, so every
    # probed field below value-checks a genuine container header parse.
    sql["q_media_features"] = """
    SELECT doc_id::VARCHAR AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav' END AS mime,
           CASE WHEN doc_id % 3 = 0 THEN (doc_id % 64 + 1)::INT END AS width,
           CASE WHEN doc_id % 3 = 0 THEN (doc_id % 37 + 1)::INT END AS height,
           CASE doc_id % 3 WHEN 0 THEN 3 WHEN 1 THEN (doc_id % 2 + 1)::INT END::INT AS channels,
           CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 END::INT AS bit_depth,
           CASE WHEN doc_id % 3 = 1 THEN 8000 END::INT AS sample_rate,
           CASE WHEN doc_id % 3 = 1 THEN ((doc_id % 10 + 1) * 10)::INT END AS duration_ms,
           CASE WHEN doc_id % 3 = 2 THEN 'unrecognized_container' END AS decode_error
    FROM documents
    """

    _pair_match = " OR ".join(f"a.bk{t} = b.bk{t}" for t in range(len(_planes)))
    sql["q_embed_near_dup"] = f"""
    WITH uni AS (
      SELECT vec_id AS id, embedding FROM embeddings
      UNION ALL SELECT vec_id + 100000 AS id, embedding FROM embeddings
    ),
    bk AS (SELECT id, embedding, {_bk_cols} FROM uni)
    SELECT a.id AS id_a, b.id AS id_b
    FROM bk a JOIN bk b ON a.id < b.id AND ({_pair_match})
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.999999
    """

    # --- round-4 curation oracles ------------------------------------------

    # Gopher gate twin. Rule order mirrors curation.gopher_quality_flags'
    # dict; integer '/' is double division in both engines, so the rule
    # comparisons see bit-identical ratios. RE2 '[\\s ]' differs from
    # Java only on \\x0B, absent from the fixture.
    sql["q_gopher_quality"] = """
    WITH base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN '- ' || text || ' ...' ELSE text END AS t
      FROM documents
    ), m AS (
      SELECT doc_id, t,
        CASE WHEN len(trim(t)) > 0 THEN string_split_regex(trim(t), '\\s+')
             ELSE [] END AS w,
        string_split(t, chr(10)) AS lines,
        len(regexp_extract_all(t, '#|\\.\\.\\.|…')) AS symbols,
        length(regexp_replace(t, '[\\s ]+', '', 'g')) AS nsp
      FROM base
    ), r AS (
      SELECT doc_id, t IS NULL AS r_null, len(w) AS wc,
        CASE WHEN len(w) <> 0 THEN nsp / len(w) END AS mean_wl,
        CASE WHEN len(w) <> 0 THEN symbols / len(w) END AS sym_ratio,
        CASE WHEN len(lines) <> 0 THEN
          len(list_filter(lines, l -> regexp_matches(l, '^[\\s ]*[-*•]'))) / len(lines)
        END AS bullet_frac,
        CASE WHEN len(lines) <> 0 THEN
          len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)[\\s ]*$'))) / len(lines)
        END AS ellipsis_frac,
        CASE WHEN len(w) <> 0 THEN
          len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) / len(w)
        END AS alpha_frac,
        len(list_intersect(list_distinct(list_transform(w, x -> lower(x))),
                           STOPWORDS_PLACEHOLDER)) AS sw_hits
      FROM m
    ), v AS (
      SELECT doc_id, wc, sw_hits,
        [x FOR x IN [
          CASE WHEN r_null THEN 'null_text' END,
          CASE WHEN NOT r_null AND wc < 50 THEN 'too_few_words' END,
          CASE WHEN wc > 100000 THEN 'too_many_words' END,
          CASE WHEN NOT r_null AND NOT (mean_wl BETWEEN 3.0 AND 10.0)
               THEN 'mean_word_len_out_of_range' END,
          CASE WHEN sym_ratio > 0.1 THEN 'symbol_heavy' END,
          CASE WHEN bullet_frac > 0.9 THEN 'bullet_heavy' END,
          CASE WHEN ellipsis_frac > 0.3 THEN 'ellipsis_heavy' END,
          CASE WHEN NOT r_null AND NOT (alpha_frac >= 0.8) THEN 'low_alpha_words' END,
          CASE WHEN NOT r_null AND sw_hits < 2 THEN 'too_few_stopwords' END
        ] IF x IS NOT NULL] AS reasons
      FROM r
    )
    SELECT doc_id, wc::BIGINT AS word_count, sw_hits::BIGINT AS stopword_hits,
           len(reasons) = 0 AS passes,
           coalesce(array_to_string(reasons, ','), '') AS fail_reasons
    FROM v
    """.replace(
        "STOPWORDS_PLACEHOLDER",
        "[" + ",".join(f"'{w}'" for w in sorted(LANG_PROFILES["en"])) + "]",
    )

    # C4 twin: same fixture weave (concat_ws skips the NULL branches in
    # both engines), same line predicate, same page rules over the
    # cleaned text; reason order mirrors the Spark struct's rule order.
    # The trim/split whitespace class is spelled [\s\x0B\x{00A0}] — RE2's
    # \s misses \x0B and NBSP that Java-side curation.WS_SPLIT_JAVA covers
    sql["q_c4_filter"] = """
    WITH base AS (
      SELECT doc_id, concat_ws(chr(10),
        'The first fixture sentence is long enough to keep easily.',
        'tiny.',
        text,
        CASE WHEN doc_id % 5 = 0 THEN 'A brace {x} sneaks into this otherwise kept sentence.' END,
        CASE WHEN doc_id % 7 = 0 THEN 'Lorem ipsum dolor sit amet is woven into this sentence.' END,
        CASE WHEN doc_id % 3 = 0 THEN 'Enable javascript to view the rest of this page now.' END,
        'This site uses cookies and the line should be filtered out.',
        chr(9) || 'A tab padded sentence stays after the whitespace fix.' || chr(160),
        'The closing fixture sentence also stays in the kept set.'
      ) AS t FROM documents
    ), m AS (
      SELECT doc_id, string_split(t, chr(10)) AS lines,
        list_filter(list_transform(string_split(t, chr(10)), l ->
          regexp_replace(l, '^[\\s\\x0B\\x{00A0}]+|[\\s\\x0B\\x{00A0}]+$', '', 'g')
        ), tl ->
          CASE WHEN len(tl) > 0
               THEN len(string_split_regex(tl, '[\\s\\x0B\\x{00A0}]+')) ELSE 0 END >= 5
          AND regexp_matches(tl, '[.!?"'']$')
          AND NOT contains(lower(tl), 'javascript')
          AND NOT contains(lower(tl), 'terms of use')
          AND NOT contains(lower(tl), 'privacy policy')
          AND NOT contains(lower(tl), 'cookie policy')
          AND NOT contains(lower(tl), 'uses cookies')
          AND NOT contains(lower(tl), 'use of cookies')
          AND NOT contains(lower(tl), 'use cookies')
        ) AS kept
      FROM base
    ), c AS (
      SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept,
             array_to_string(kept, chr(10)) AS cleaned
      FROM m
    ), r AS (
      SELECT doc_id, n_lines, n_kept, length(cleaned) AS clean_len,
        len(regexp_extract_all(cleaned, '[.!?]')) AS n_sent,
        [x FOR x IN [
          CASE WHEN len(regexp_extract_all(cleaned, '[.!?]')) < 3
               THEN 'too_few_sentences' END,
          CASE WHEN contains(lower(cleaned), '{') OR contains(lower(cleaned), '}')
               THEN 'has_curly_brace' END,
          CASE WHEN contains(lower(cleaned), 'lorem ipsum')
               THEN 'has_lorem_ipsum' END
        ] IF x IS NOT NULL] AS reasons
      FROM c
    )
    SELECT doc_id, n_lines::BIGINT AS n_lines, n_kept::BIGINT AS n_lines_kept,
           n_sent::BIGINT AS n_sentences, clean_len::BIGINT AS clean_len,
           len(reasons) = 0 AS passes,
           coalesce(array_to_string(reasons, ','), '') AS fail_reasons
    FROM r
    """

    # repeated-line removal twin: trimmed line key (incl. NBSP), blank
    # lines never banned, reassembly in original position order
    sql["q_line_dedup"] = """
    WITH d AS (
      SELECT doc_id AS id,
             'NAV Home | About | Contact' || chr(10) || text || chr(10) ||
             CASE WHEN doc_id % 3 = 0 THEN '  This site uses cookies.  '
                  ELSE 'sig-' || doc_id END AS text
      FROM documents
    ), ex AS (
      SELECT id,
             unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos,
             unnest(string_split(text, chr(10))) AS line
      FROM d
    ), t AS (
      SELECT id, pos, line,
             regexp_replace(line, '^[\\s\\x{00A0}]+|[\\s\\x{00A0}]+$', '') AS tline
      FROM ex
    ), ban AS (
      SELECT tline FROM (SELECT DISTINCT id, tline FROM t WHERE tline <> '')
      GROUP BY tline HAVING count(*) >= 5
    ), m AS (
      SELECT t.id, t.pos, t.line,
             (ban.tline IS NOT NULL AND t.tline <> '') AS removable
      FROM t LEFT JOIN ban ON ban.tline = t.tline
    )
    SELECT id,
           coalesce(string_agg(CASE WHEN NOT removable THEN line END,
                               chr(10) ORDER BY pos), '') AS text,
           sum(CASE WHEN removable THEN 1 ELSE 0 END)::BIGINT AS removed_lines,
           sum(CASE WHEN NOT removable THEN 1 ELSE 0 END)::BIGINT AS kept_lines
    FROM m GROUP BY id
    """

    # within-doc line dedup twin: first occurrence per trimmed key via a
    # min(pos) window; blank lines always kept; the same explicit
    # whitespace class as the engine's ws_trim
    sql["q_doc_line_dedup"] = """
    WITH d AS (
      SELECT doc_id, concat_ws(chr(10),
        'INTRO repeated line.', text, 'INTRO repeated line.',
        '  INTRO repeated line.  ', 'unique-' || doc_id) AS t
      FROM documents
    ), ex AS (
      SELECT doc_id,
             unnest(generate_series(1, len(string_split(t, chr(10))))) AS pos,
             unnest(string_split(t, chr(10))) AS line
      FROM d
    ), k AS (
      SELECT doc_id, pos, line,
             regexp_replace(line, '^[\\s\\x0B\\x{00A0}]+|[\\s\\x0B\\x{00A0}]+$', '', 'g') AS tline
      FROM ex
    ), m AS (
      SELECT doc_id, pos, line, tline,
             min(pos) OVER (PARTITION BY doc_id, tline) AS first_pos
      FROM k
    )
    SELECT doc_id,
           coalesce(string_agg(
             CASE WHEN tline = '' OR pos = first_pos THEN line END,
             chr(10) ORDER BY pos), '') AS text,
           sum(CASE WHEN tline = '' OR pos = first_pos THEN 1 ELSE 0 END)::BIGINT AS kept_lines,
           sum(CASE WHEN tline <> '' AND pos <> first_pos THEN 1 ELSE 0 END)::BIGINT AS removed_lines
    FROM m GROUP BY doc_id
    """

    # canonical-selection twin: per-cluster argmax(quality, id) via a
    # row_number window, survivors = everything not out-ranked
    sql["q_canonical_dedup"] = """
    WITH q AS (
      SELECT doc_id, coalesce(length(text), -1)::BIGINT AS quality FROM documents
    ), c AS (
      SELECT doc_id AS id, doc_id % 97 AS cluster_id
      FROM documents WHERE doc_id % 3 = 0
    ), w AS (
      SELECT c.id,
             row_number() OVER (
               PARTITION BY c.cluster_id
               ORDER BY q.quality DESC, c.id DESC) AS rn
      FROM c JOIN q ON q.doc_id = c.id
    )
    SELECT doc_id, quality FROM q
    WHERE doc_id NOT IN (SELECT id FROM w WHERE rn > 1)
    """

    # export-manifest twin: the same md5 permutation key, hash shard,
    # XOR checksum; strlen = byte length (Spark octet_length)
    sql["q_export_manifest"] = """
    WITH o AS (
      SELECT doc_id, text,
             ('0x' || substr(md5('order:7:' || doc_id), 1, 15))::BIGINT AS order_key
      FROM documents
    )
    SELECT (order_key % 8)::INT AS shard,
           count(*)::BIGINT AS n_rows,
           bit_xor(order_key)::BIGINT AS key_xor,
           min(order_key) AS min_key,
           max(order_key) AS max_key,
           sum(coalesce(strlen(text), 0))::BIGINT AS bytes
    FROM o GROUP BY 1
    """

    # clean_text twin: the woven damage is known, so the oracle asserts the
    # repaired literal outright (base fixture text is pure ASCII, verified —
    # clean_text leaves it untouched)
    sql["q_normalize_clean"] = f"""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN text || ' {_CLEAN_SRC} done'
                ELSE text || 'ok' END AS cleaned,
           (CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 0 END)::BIGINT AS moji_before
    FROM documents
    """

    # ExactSubstr twin: dup grams by STRING equality (engine: xxhash64),
    # then classic gaps-and-islands span merge per doc
    sql["q_exact_substr_spans"] = f"""
    WITH c AS (SELECT * FROM {SQL_DUP_CORPUS} t),
    g AS (
      SELECT id, unnest(generate_series(1, length(text) - 49)) AS pos,
             unnest([substr(text, i, 50) for i in generate_series(1, length(text) - 49)]) AS gram
      FROM c WHERE length(text) >= 50
    ),
    dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
    f AS (SELECT g.id, g.pos FROM g JOIN dup USING (gram)),
    s AS (
      SELECT id, pos,
             CASE WHEN pos <= max(pos + 49) OVER (
                    PARTITION BY id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
                  THEN 0 ELSE 1 END AS brk
      FROM f
    ),
    isl AS (SELECT id, pos, sum(brk) OVER (PARTITION BY id ORDER BY pos) AS k FROM s),
    sp AS (SELECT id, min(pos) AS s_start, max(pos) + 49 AS s_end FROM isl GROUP BY id, k),
    tot AS (SELECT id, sum(s_end - s_start + 1) AS dup_chars FROM sp GROUP BY id)
    SELECT sp.id, sp.s_start::BIGINT AS s_start, sp.s_end::BIGINT AS s_end,
           tot.dup_chars::BIGINT AS dup_chars
    FROM sp JOIN tot USING (id)
    """

    # mix_corpus twin: same md5('mix'||key) % 1e6 bucket as the engine's
    # _hash_bucket; rate 2.5 -> 2 copies + bucket<500000, 0.25 -> bucket<250000
    sql["q_corpus_mix"] = """
    WITH d AS (
      SELECT source, doc_id,
             ('0x' || substr(md5('mix' || doc_id::VARCHAR), 1, 15))::BIGINT % 1000000 AS kb
      FROM documents
    ), r AS (
      SELECT source, doc_id,
             (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0
                          WHEN 'src2' THEN 0 ELSE 1 END)
             + (CASE WHEN kb < (CASE source WHEN 'src0' THEN 500000
                                            WHEN 'src1' THEN 250000
                                            WHEN 'src2' THEN 0 ELSE 0 END)
                     THEN 1 ELSE 0 END) AS copies
      FROM d
    ), e AS (
      SELECT source, doc_id, unnest(generate_series(0, copies - 1)) AS epoch
      FROM r WHERE copies > 0
    )
    SELECT source, epoch::BIGINT AS epoch, count(*)::BIGINT AS n,
           min(doc_id) AS min_id
    FROM e GROUP BY source, epoch
    """

    # word-trigram stupid-backoff LM twin (round-5 model swap; the char
    # twin moved to tests/test_round5_word_lm.py with the demoted model):
    # same normalize, same per-order min_count(>=2 for orders 2-3)/cap/
    # md5-int tie-break, N = pre-cap unigram total. Backoff at position i
    # (1-based, m = least(3, i) orders available): longest order whose
    # gram AND context are both in the capped dicts wins, one 0.4 factor
    # per skipped order, unigram floor (count | 0.5)/N. The mult
    # literals are written 0.4 and 0.4*0.4 and the expression shapes
    # ((mult*num)/den, mult*(x/N)) match the engine's IEEE evaluation
    # order exactly; per-event ln() is bit-identical (same libm), only
    # the per-doc sum order differs, absorbed by the 1e-3 floor.
    sql["q_perplexity"] = f"""
    WITH norm AS (SELECT doc_id, {SQL_NORM} AS t FROM documents),
    w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM norm
          WHERE t IS NOT NULL AND length(t) > 0),
    u1 AS (SELECT unnest(ws) AS g FROM w),
    c1 AS (SELECT g, count(*) AS c FROM u1 GROUP BY g),
    k1 AS (SELECT g, c FROM c1
           ORDER BY c DESC, ('0x' || substr(md5(g), 1, 15))::BIGINT ASC
           LIMIT 200000),
    u2 AS (SELECT array_to_string(list_slice(ws, i, i + 1), ' ') AS g
           FROM w, unnest(generate_series(1, len(ws) - 1)) AS s2(i)
           WHERE len(ws) >= 2),
    c2 AS (SELECT g, count(*) AS c FROM u2 GROUP BY g),
    k2 AS (SELECT g, c FROM c2 WHERE c >= 2
           ORDER BY c DESC, ('0x' || substr(md5(g), 1, 15))::BIGINT ASC
           LIMIT 200000),
    u3 AS (SELECT array_to_string(list_slice(ws, i, i + 2), ' ') AS g
           FROM w, unnest(generate_series(1, len(ws) - 2)) AS s3(i)
           WHERE len(ws) >= 3),
    c3 AS (SELECT g, count(*) AS c FROM u3 GROUP BY g),
    k3 AS (SELECT g, c FROM c3 WHERE c >= 2
           ORDER BY c DESC, ('0x' || substr(md5(g), 1, 15))::BIGINT ASC
           LIMIT 200000),
    nn AS (SELECT greatest(sum(c), 1) AS n FROM c1),
    pos AS (
      SELECT doc_id, i, ws[i] AS w1,
             CASE WHEN i >= 2 THEN ws[i - 1] || ' ' || ws[i] END AS b2,
             CASE WHEN i >= 2 THEN ws[i - 1] END AS bctx,
             CASE WHEN i >= 3 THEN ws[i - 2] || ' ' || ws[i - 1] || ' ' || ws[i] END AS t3,
             CASE WHEN i >= 3 THEN ws[i - 2] || ' ' || ws[i - 1] END AS tctx
      FROM w, unnest(generate_series(1, len(ws))) AS sp(i)
    ),
    scored AS (
      SELECT p.doc_id,
             CASE
               WHEN kt.c IS NOT NULL AND ktd.c IS NOT NULL
                 THEN ln(kt.c / ktd.c)
               WHEN kb.c IS NOT NULL AND kbd.c IS NOT NULL
                 THEN ln((CASE WHEN p.t3 IS NOT NULL THEN 0.4::DOUBLE ELSE 1.0::DOUBLE END
                          * kb.c) / kbd.c)
               ELSE ln((CASE WHEN p.t3 IS NOT NULL THEN 0.4::DOUBLE * 0.4::DOUBLE
                             WHEN p.b2 IS NOT NULL THEN 0.4::DOUBLE
                             ELSE 1.0::DOUBLE END)
                       * (coalesce(ku.c::DOUBLE, 0.5::DOUBLE) / nn.n))
             END AS lp
      FROM pos p
      LEFT JOIN k3 kt ON kt.g = p.t3
      LEFT JOIN k2 ktd ON ktd.g = p.tctx
      LEFT JOIN k2 kb ON kb.g = p.b2
      LEFT JOIN k1 kbd ON kbd.g = p.bctx
      LEFT JOIN k1 ku ON ku.g = p.w1
      CROSS JOIN nn
    ),
    p AS (SELECT doc_id, exp(-sum(lp) / count(*)) AS ppl FROM scored GROUP BY doc_id)
    SELECT d.doc_id, floor(p.ppl * 1000) / 1000 AS ppl_t
    FROM documents d LEFT JOIN p USING (doc_id)
    """

    # the north-rule turn shape with a deterministic role alternation
    # (mirrors _role_turns above)
    _SQL_ROLE_TURNS = """
      SELECT 'conv-' || (doc_id % 50)::VARCHAR AS conv_id,
             (doc_id // 50)::INT AS turn_idx,
             CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
             text
      FROM documents
    """

    sql["q_assemble_conversations"] = f"""
    WITH t AS ({_SQL_ROLE_TURNS}),
    r AS (SELECT conv_id, turn_idx,
                 '<|' || role || '|>' || chr(10) || coalesce(text, '') AS rend
          FROM t),
    a AS (
      SELECT conv_id,
             string_agg(rend, chr(10) ORDER BY turn_idx) AS doc,
             count(*)::BIGINT AS n_turns
      FROM r GROUP BY conv_id
    )
    SELECT conv_id, doc, n_turns, length(doc)::BIGINT AS n_chars FROM a
    """

    # the sft_examples twin (q_sft_pairs) moved to
    # tests/test_analytics_queries.py in the preference-pair swap; the
    # pairing twin below re-derives the same context-1 prompt rendering
    # inline (the two-turn fixture makes the window a plain concat).
    sql["q_preference_pairs"] = """
    WITH scored AS (
      SELECT '<|user|>' || chr(10) || 'Question ' || (doc_id % 7)::VARCHAR AS prompt,
             coalesce(text, '') AS r,
             (CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                   ELSE len(string_split_regex(trim(coalesce(text, '')), '\\s+'))
              END)::DOUBLE AS s
      FROM documents
    ),
    sel AS (
      SELECT prompt, r, s,
             row_number() OVER (PARTITION BY prompt ORDER BY s DESC, r DESC) AS rhi,
             row_number() OVER (PARTITION BY prompt ORDER BY s ASC, r ASC) AS rlo
      FROM scored
    ),
    pair AS (
      SELECT prompt,
             max(CASE WHEN rhi = 1 THEN r END) AS chosen,
             max(CASE WHEN rlo = 1 THEN r END) AS rejected,
             max(CASE WHEN rhi = 1 THEN s END) AS chosen_score,
             max(CASE WHEN rlo = 1 THEN s END) AS rejected_score,
             count(*)::BIGINT AS n_candidates
      FROM sel GROUP BY prompt
    )
    SELECT prompt, chosen, rejected, chosen_score, rejected_score, n_candidates
    FROM pair
    WHERE chosen <> rejected AND chosen_score - rejected_score >= 0.0
    """

    return sql
