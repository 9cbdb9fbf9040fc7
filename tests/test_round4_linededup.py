"""Round 4: cross-document repeated-line (boilerplate) removal —
CCNet/RefinedWeb-style line dedup (curation.line_frequencies +
strip_repeated_lines), value-checked against a DuckDB twin on the same
fixture (the driver's 50-entry registry is full, so the oracle lives
here instead of __spark_entry__).
"""

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from fscrawler_spark.functions import curation

BOILER_A = "  (c) 2026 Example Corp - all rights reserved  "
BOILER_B = "Subscribe to our newsletter!"

DOCS = [
    # 4 pages of one "domain": boilerplate A+B around unique content
    (0, f"{BOILER_A}\nunique content zero\n\n{BOILER_B}"),
    (1, f"{BOILER_A}\nunique content one\n{BOILER_B}"),
    (2, f"{BOILER_A}\nunique content two\n{BOILER_B}"),
    (3, f"(c) 2026 Example Corp - all rights reserved\nunique content three\n{BOILER_B}"),
    # doc that is NOTHING but boilerplate
    (4, f"{BOILER_A}\n{BOILER_B}"),
    # unique-only doc, blank lines preserved
    (5, "totally original\n\nstill original"),
    # null text passes through
    (6, None),
    # empty text: one blank line, kept
    (7, ""),
    # repeated line that stays under min_docs (2 docs < 3)
    (8, "rare shared line\nalpha"),
    (9, "rare shared line\nbeta"),
    # Windows extraction of the same domain: CRLF endings — the \r-
    # suffixed boilerplate must match the LF docs' banned line
    (10, f"{BOILER_B}\r\ncrlf unique content\r\nmore crlf"),
    # NBSP-padded variant of the same boilerplate
    (11, "\u00a0" + BOILER_B + "\u00a0\nnbsp unique content"),
]

# the engine's line key: whitespace INCLUDING \r and NBSP off both ends
DUCK_KEY = r"regexp_replace({c}, '^[\s\x{{00A0}}]+|[\s\x{{00A0}}]+$', '', 'g')"

MIN_DOCS = 3


@pytest.fixture()
def corpus(spark, tmp_path):
    p = str(tmp_path / "line_docs.parquet")
    spark.createDataFrame(DOCS, "doc_id long, text string").coalesce(1).write.parquet(p)
    return p


def _duck(path):
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the file glob
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{path}/*.parquet'")
    return con


def test_line_frequencies_matches_duckdb(spark, corpus):
    got = {
        (r.line_hash, r.n_docs, r.line)
        for r in curation.line_frequencies(
            spark.read.parquet(corpus), min_docs=2
        ).collect()
    }
    want = {
        tuple(r)
        for r in _duck(corpus)
        .execute(
            f"""
            WITH ex AS (
              SELECT doc_id,
                     {DUCK_KEY.format(c="unnest(string_split(text, chr(10)))")} AS tline
              FROM t
            )
            SELECT md5(tline) AS line_hash, count(DISTINCT doc_id) AS n_docs,
                   min(tline) AS line
            FROM ex WHERE tline <> ''
            GROUP BY md5(tline) HAVING count(DISTINCT doc_id) >= 2
            """
        )
        .fetchall()
    }
    assert got == want
    # both boilerplate lines present; trims collapse the A variants
    lines = {line for _, _, line in got}
    assert BOILER_A.strip() in lines and BOILER_B in lines


def test_strip_repeated_lines_matches_duckdb(spark, corpus):
    out = curation.strip_repeated_lines(
        spark.read.parquet(corpus), min_docs=MIN_DOCS
    )
    got = {(r.id, r.text, r.removed_lines, r.kept_lines) for r in out.collect()}
    want = {
        tuple(r)
        for r in _duck(corpus)
        .execute(
            f"""
            WITH ex0 AS (
              SELECT doc_id,
                     unnest(string_split(text, chr(10))) AS line,
                     generate_subscripts(string_split(text, chr(10)), 1) AS pos
              FROM t
            ),
            ex AS (SELECT doc_id, pos, line,
                          {DUCK_KEY.format(c="line")} AS tline FROM ex0),
            banned AS (
              SELECT tline FROM (SELECT DISTINCT doc_id, tline FROM ex WHERE tline <> '')
              GROUP BY tline HAVING count(*) >= {MIN_DOCS}
            ),
            marked AS (
              SELECT doc_id, pos, line,
                     (tline <> '' AND tline IN (SELECT tline FROM banned)) AS rm
              FROM ex
            ),
            agg AS (
              SELECT doc_id,
                     coalesce(string_agg(line, chr(10) ORDER BY pos)
                              FILTER (WHERE NOT rm), '') AS text,
                     count(*) FILTER (WHERE rm) AS removed_lines,
                     count(*) FILTER (WHERE NOT rm) AS kept_lines
              FROM marked GROUP BY doc_id
            )
            SELECT t.doc_id AS id,
                   CASE WHEN t.text IS NULL THEN NULL ELSE coalesce(a.text, '') END AS text,
                   coalesce(a.removed_lines, 0) AS removed_lines,
                   coalesce(a.kept_lines, 0) AS kept_lines
            FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id
            """
        )
        .fetchall()
    }
    assert got == want
    by_id = {r[0]: r for r in got}
    # boilerplate stripped, unique content + blank structure kept
    assert by_id[0][1] == "unique content zero\n"
    # all-boilerplate doc keeps '' (still present, auditable via counts)
    assert by_id[4] == (4, "", 2, 0)
    # null and empty pass through
    assert by_id[6][1] is None and by_id[7] == (7, "", 0, 1)
    # under-threshold repetition survives
    assert by_id[8][1] == "rare shared line\nalpha"
    # CRLF doc: the \r-suffixed boilerplate line was banned via the
    # normalized key; surviving lines keep their original \r bytes
    assert by_id[10][1] == "crlf unique content\r\nmore crlf"
    # NBSP-padded boilerplate banned too
    assert by_id[11][1] == "nbsp unique content"


def test_strip_with_precomputed_banned_set(spark, corpus):
    """The production shape: line_frequencies computed once per corpus,
    banned table reused — results identical to the inline computation."""
    df = spark.read.parquet(corpus)
    banned = curation.line_frequencies(df, min_docs=MIN_DOCS)
    a = {
        tuple(r)
        for r in curation.strip_repeated_lines(df, min_docs=MIN_DOCS).collect()
    }
    b = {
        tuple(r)
        for r in curation.strip_repeated_lines(df, banned=banned).collect()
    }
    assert a == b


def test_strip_is_lossless_when_nothing_banned(spark):
    """min_docs above any observed frequency: every doc reassembles
    byte-identically (split/join round-trip on the fixed separator)."""
    rows = [(i, f"line one {i}\n\n  padded line {i}  \nlast") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.strip_repeated_lines(df, min_docs=99)
    got = {(r.id, r.text) for r in out.select("id", "text").collect()}
    assert got == {(i, t) for i, t in rows}


# --- CLI verb ---------------------------------------------------------------


def _docs_table(spark, tmp_path):
    """Extraction-docs-shaped table with cross-doc boilerplate."""
    rows = [
        (i, f"c{i % 3}", i, f"{BOILER_B}\nbody text {i}") for i in range(6)
    ] + [(6, "c9", 0, None)]
    p = str(tmp_path / "docs_in")
    spark.createDataFrame(
        rows, "doc_id long, conv_id string, turn_idx int, extracted string"
    ).write.parquet(os.path.join(p, "docs"))
    return p


def test_cli_dedup_lines_writes_curated_table(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(spark, tmp_path)
    out = str(tmp_path / "curated")
    rc = main(
        ["--input", src, "--output", out, "--dedup-lines", "3"], spark=spark
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["docs"] == 7 and res["removed_lines_total"] == 6
    got = spark.read.parquet(out)
    assert set(got.columns) == {
        "doc_id", "conv_id", "turn_idx", "extracted", "removed_lines", "kept_lines"
    }
    by_id = {r.doc_id: r for r in got.collect()}
    assert by_id[0].extracted == "body text 0" and by_id[0].removed_lines == 1
    assert by_id[6].extracted is None  # null text passes through


def test_cli_dedup_lines_rejects_conflicts_and_bad_min(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(spark, tmp_path)
    out = str(tmp_path / "x")
    assert main(["--input", src, "--output", out, "--dedup-lines", "1"], spark=spark) == 2
    assert main(
        ["--input", src, "--output", out, "--dedup-lines", "3", "--incremental"],
        spark=spark,
    ) == 2
    # not a docs table -> clean exit 2, no traceback
    bad = str(tmp_path / "notdocs")
    spark.range(3).write.parquet(bad)
    assert main(["--input", bad, "--output", out, "--dedup-lines", "3"], spark=spark) == 2


# --- per-group (CCNet-style per-domain) banning ------------------------------


def test_grouped_line_dedup_scopes_bans_to_the_group(spark, tmp_path):
    """The CCNet shape: repetition counts WITHIN a source/domain. The
    boilerplate repeats 3x in source A (banned there) and appears once
    in source B (survives there) — a global count would ban both."""
    rows = [
        (0, "a", f"{BOILER_B}\nalpha zero"),
        (1, "a", f"{BOILER_B}\nalpha one"),
        (2, "a", f"{BOILER_B}\nalpha two"),
        (3, "b", f"{BOILER_B}\nbeta zero"),
        (4, "b", "beta only\ncontent"),
    ]
    p = str(tmp_path / "grouped.parquet")
    spark.createDataFrame(rows, "doc_id long, source string, text string").coalesce(
        1
    ).write.parquet(p)
    df = spark.read.parquet(p)

    freq = curation.line_frequencies(df, min_docs=3, group_col="source")
    assert {(r.grp, r.line) for r in freq.collect()} == {("a", BOILER_B)}

    out = curation.strip_repeated_lines(df, min_docs=3, group_col="source")
    got = {(r.id, r.text, r.removed_lines) for r in out.collect()}
    want = {
        tuple(r)
        for r in _duck(p)
        .execute(
            f"""
            WITH ex0 AS (
              SELECT doc_id, source,
                     unnest(string_split(text, chr(10))) AS line,
                     generate_subscripts(string_split(text, chr(10)), 1) AS pos
              FROM t
            ),
            ex AS (SELECT doc_id, source, pos, line,
                          {DUCK_KEY.format(c="line")} AS tline FROM ex0),
            banned AS (
              SELECT source, tline
              FROM (SELECT DISTINCT doc_id, source, tline FROM ex WHERE tline <> '')
              GROUP BY source, tline HAVING count(*) >= 3
            ),
            marked AS (
              SELECT e.doc_id, e.pos, e.line,
                     (e.tline <> '' AND b.tline IS NOT NULL) AS rm
              FROM ex e LEFT JOIN banned b
                ON e.source = b.source AND e.tline = b.tline
            ),
            agg AS (
              SELECT doc_id,
                     coalesce(string_agg(line, chr(10) ORDER BY pos)
                              FILTER (WHERE NOT rm), '') AS text,
                     count(*) FILTER (WHERE rm) AS removed_lines
              FROM marked GROUP BY doc_id
            )
            SELECT t.doc_id AS id,
                   CASE WHEN t.text IS NULL THEN NULL ELSE coalesce(a.text, '') END,
                   coalesce(a.removed_lines, 0)
            FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id
            """
        )
        .fetchall()
    }
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[0][1] == "alpha zero"           # banned in source a
    assert by_id[3][1] == f"{BOILER_B}\nbeta zero"  # survives in source b


def test_grouped_strip_rejects_groupless_banned_table(spark, tmp_path):
    rows = [(0, "a", "x\ny"), (1, "a", "x\nz")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    groupless = curation.line_frequencies(df, min_docs=2)
    with pytest.raises(ValueError, match="grp"):
        curation.strip_repeated_lines(df, banned=groupless, group_col="source")
