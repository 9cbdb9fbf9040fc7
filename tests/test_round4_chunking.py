"""chunk_documents (curation.py): fixed-token windows with stride.

Checks: exact windows on hand-computed fixtures (disjoint + overlapped
+ tail-containment drop), a DuckDB value oracle over generated docs,
null/blank handling, validation errors, and the zero-Exchange plan pin
(the operator must ride the scan, not shuffle).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from fscrawler_spark.functions.curation import chunk_documents


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _collect(df):
    return sorted(
        (r.id, r.chunk_idx, r.tok_start, r.n_tokens, r.chunk_text)
        for r in df.collect()
    )


def test_disjoint_windows(spark):
    d = _df(spark, [(1, "a b c d e f g")])
    got = _collect(chunk_documents(d, max_tokens=3))
    assert got == [
        (1, 0, 1, 3, "a b c"),
        (1, 1, 4, 3, "d e f"),
        (1, 2, 7, 1, "g"),
    ]


def test_overlapping_windows_drop_covered_tail(spark):
    # n=5, W=4, S=2: raw starts 1,3,5; the window at 5 ([e]) is fully
    # inside the window at 3 ([c d e], which reached the end) -> dropped
    d = _df(spark, [(1, "a b c d e")])
    got = _collect(chunk_documents(d, max_tokens=4, stride=2))
    assert got == [
        (1, 0, 1, 4, "a b c d"),
        (1, 1, 3, 3, "c d e"),
    ]


def test_short_null_blank_docs(spark):
    d = _df(spark, [(1, "only two"), (2, None), (3, "   "), (4, "x")])
    got = _collect(chunk_documents(d, max_tokens=5))
    # short docs -> one whole-doc chunk; null/blank -> zero rows
    assert got == [(1, 0, 1, 2, "only two"), (4, 0, 1, 1, "x")]


def test_validation(spark):
    d = _df(spark, [(1, "a")])
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(d, max_tokens=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(d, max_tokens=4, stride=5)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(d, max_tokens=4, stride=0)


def test_matches_duckdb_oracle(spark):
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(3 + (i * 7) % 40)))
        for i in range(60)
    ]
    got = _collect(chunk_documents(_df(spark, rows), max_tokens=8, stride=5))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    exp = con.execute("""
        WITH w AS (
          SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS toks
          FROM docs WHERE len(trim(text)) > 0
        ), st AS (
          SELECT id, toks,
                 [s FOR s IN range(1, len(toks) + 1, 5)
                    IF s = 1 OR s - 5 + 7 < len(toks)] AS starts
          FROM w
        ), e AS (
          SELECT id,
                 unnest(generate_series(0, len(starts) - 1)) AS chunk_idx,
                 unnest(starts) AS s, toks
          FROM st WHERE len(starts) > 0
        )
        SELECT id, chunk_idx, s AS tok_start,
               len(list_slice(toks, s, least(len(toks), s + 7))) AS n_tokens,
               array_to_string(list_slice(toks, s, least(len(toks), s + 7)), ' ') AS chunk_text
        FROM e
    """).fetchall()
    assert got == sorted((r[0], r[1], r[2], r[3], r[4]) for r in exp)


def test_plan_has_no_key_shuffle(spark):
    # the only Exchange ever allowed is widen's ROUND-ROBIN repartition
    # (paid when the input is narrower than the session parallelism);
    # a key-based shuffle would mean the operator stopped riding the scan
    d = _df(spark, [(1, "a b c d e f")])
    plan = (
        chunk_documents(d, max_tokens=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    assert "Generate" in plan  # the posexplode


def test_every_token_covered_and_no_duplicate_chunks(spark):
    # with stride <= max_tokens every token index appears in >= 1 window,
    # and no emitted chunk text is a suffix of the previous chunk
    rows = [(i, " ".join(str(j) for j in range(1, 23 + i))) for i in range(5)]
    out = chunk_documents(_df(spark, rows), max_tokens=6, stride=4)
    per_doc = {}
    for r in out.collect():
        per_doc.setdefault(r.id, []).append((r.tok_start, r.n_tokens, r.chunk_text))
    for i, text in rows:
        n = len(text.split())
        covered = set()
        spans = sorted(per_doc[i])
        for s, k, _ in spans:
            covered.update(range(s, s + k))
        assert covered == set(range(1, n + 1)), f"doc {i} lost tokens"
        for (s1, k1, c1), (s2, k2, c2) in zip(spans, spans[1:]):
            assert not c1.endswith(c2), f"doc {i}: chunk {s2} duplicates tail"
