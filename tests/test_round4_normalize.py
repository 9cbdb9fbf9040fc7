"""Round 4+: Unicode normalization (normalize.py) value-checked against
DuckDB's native nfc_normalize + RE2 regexes (independent engine), plus
from-first-principles mojibake corruption round-trips built with
Python's codecs directly (not via the module under test). The driver's
50-entry registry is full, so the oracle lives in pytest, like
test_round4_perplexity.py.
"""

import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from fscrawler_spark.functions import normalize
from fscrawler_spark.functions.normalize import (
    MOJIBAKE_PATTERN,
    clean_text,
    is_ascii,
    mojibake_score,
)

# originals are NFC, cp1252-round-trippable, and mojibake-free
ORIGINALS = [
    "café — “smart quotes” and naïve résumé",
    "über Äpfel & Öl",
    "ça va très bien",
]


def _corrupt(s: str, times: int = 1) -> str:
    """UTF-8 bytes mis-decoded as WHATWG windows-1252 (the five cp1252
    holes decode to their C1 controls) — the classic damage."""
    for _ in range(times):
        s = "".join(
            chr(b) if b in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
            else bytes([b]).decode("cp1252")
            for b in s.encode("utf-8")
        )
    return s


DOCS = [
    (0, "plain ascii stays untouched"),
    (1, "tabs\tand\nnewlines kept, bell\x07 and nul\x00 dropped"),
    (2, unicodedata.normalize("NFD", "étude nfd to nfc")),      # NFD -> NFC
    (3, _corrupt(ORIGINALS[0])),                        # single mojibake
    (4, _corrupt(ORIGINALS[1], times=2)),               # double mojibake
    (5, ORIGINALS[2]),                                  # genuine accents
    (6, "bom﻿lost c1\x85gone zwj kept \U0001f469‍\U0001f4bb"),
    (7, "not repairable Ω≈ç�"),                    # fix must not corrupt
    (8, None),
    (9, ""),
]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("norm") / "docs.parquet")
    spark.createDataFrame(DOCS, "doc_id long, text string").coalesce(1).write.parquet(p)
    return p


def _duckdb_clean(corpus):
    """Independent oracle: DuckDB nfc_normalize + control strip (no
    mojibake repair). Controls are NFC-inert so the order is free."""
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{corpus}/*.parquet'")
    ctrl = "[" + normalize._UNICODE_CONTROL_CHARS + "]"
    return dict(
        con.execute(
            "SELECT doc_id, regexp_replace(nfc_normalize(text), ?, '', 'g') FROM t",
            [ctrl],
        ).fetchall()
    )


def test_clean_no_fix_matches_duckdb_nfc(spark, corpus):
    got = {
        r["doc_id"]: r["c"]
        for r in spark.read.parquet(corpus)
        .select("doc_id", clean_text(F.col("text"), fix_mojibake=False).alias("c"))
        .collect()
    }
    assert got == _duckdb_clean(corpus)


def test_mojibake_repair_recovers_originals(spark, corpus):
    got = {
        r["doc_id"]: r["c"]
        for r in spark.read.parquet(corpus)
        .select("doc_id", clean_text(F.col("text")).alias("c"))
        .collect()
    }
    assert got[3] == ORIGINALS[0]
    assert got[4] == ORIGINALS[1]          # two-pass damage, two-pass repair
    assert got[5] == ORIGINALS[2]          # genuine accents untouched
    assert got[7] == DOCS[7][1]            # unrepairable -> unchanged
    assert got[0] == DOCS[0][1]
    assert got[8] is None and got[9] == ""


def test_ascii_control_strip_keeps_tnr(spark, corpus):
    got = {
        r["doc_id"]: r["c"]
        for r in spark.read.parquet(corpus)
        .select("doc_id", clean_text(F.col("text")).alias("c"))
        .collect()
    }
    assert got[1] == "tabs\tand\nnewlines kept, bell and nul dropped"
    # C1 + BOM stripped, emoji ZWJ sequence preserved intact
    assert got[6] == "bomlost c1gone zwj kept \U0001f469‍\U0001f4bb"


def test_mojibake_score_matches_duckdb_regex(spark, corpus):
    got = {
        r["doc_id"]: r["s"]
        for r in spark.read.parquet(corpus)
        .select("doc_id", mojibake_score(F.col("text")).alias("s"))
        .collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{corpus}/*.parquet'")
    want = dict(
        con.execute(
            "SELECT doc_id, len(regexp_extract_all(text, ?)) FROM t WHERE text IS NOT NULL",
            [MOJIBAKE_PATTERN],
        ).fetchall()
    )
    for doc_id, s in want.items():
        assert got[doc_id] == s, doc_id
    assert got[8] is None
    # damaged docs score > 0, clean docs score 0
    assert got[3] > 0 and got[4] > 0 and got[5] == 0 and got[0] == 0
    # cleaning drives the score to zero (repairable docs)
    after = {
        r["doc_id"]: r["s"]
        for r in spark.read.parquet(corpus)
        .select("doc_id", mojibake_score(clean_text(F.col("text"))).alias("s"))
        .collect()
    }
    assert after[3] == 0 and after[4] == 0


def test_is_ascii_and_fast_path_masking(spark, corpus):
    df = spark.read.parquet(corpus).select(
        "doc_id", is_ascii(F.col("text")).alias("a"),
        clean_text(F.col("text")).alias("c"),
    )
    got = {r["doc_id"]: r["a"] for r in df.collect()}
    assert got[0] is True and got[1] is True
    assert got[2] is False and got[3] is False
    assert got[8] is None
    # the single ArrowEvalPython is fed the CASE-masked input: ASCII
    # rows reach Python as NULL (no string payload over Arrow)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "CASE WHEN" in plan


def test_deterministic_across_parallelism(spark, corpus):
    base = spark.read.parquet(corpus)
    out = []
    for n in (1, 8):
        out.append(
            sorted(
                (r["doc_id"], r["c"])
                for r in base.repartition(n)
                .select("doc_id", clean_text(F.col("text")).alias("c"))
                .collect()
            )
        )
    assert out[0] == out[1]
