"""Round 4+: exact-substring duplicate spans (exact_substr.py),
value-checked against a from-scratch Python oracle that compares REAL
substrings (no hashing — so it also cross-checks the xxhash64 shortcut)
and merges intervals independently. Registry is at the driver's
50-query cap, so the oracle lives in pytest, like its round-4 siblings.
"""

import random

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.functions.exact_substr import (
    duplicate_span_flags,
    strip_duplicate_spans,
)

L = 20
SHARED = "this exact paragraph is repeated verbatim across documents"
random.seed(1234)
_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _unique_noise(n):
    # random unique filler — astronomically unlikely to share an L-gram
    return "".join(random.choice(_ALPHA + " ") for _ in range(n))


DOCS = [
    (0, _unique_noise(80) + SHARED + _unique_noise(80)),
    (1, _unique_noise(60) + SHARED + _unique_noise(100)),
    (2, _unique_noise(120)),                       # no dup
    (3, SHARED),                                   # doc IS the shared span
    (4, "xy" * 40),                                # within-doc repetition only
    (5, None),
    (6, "short"),                                  # below min_len
]


def _oracle(docs, min_len, cross_doc_only):
    """Independent: count occurrences of every REAL L-gram string, flag
    covered positions, merge runs. 1-based inclusive offsets."""
    occ = {}
    for doc_id, text in docs:
        if text is None:
            continue
        for i in range(len(text) - min_len + 1):
            occ.setdefault(text[i : i + min_len], []).append(doc_id)
    dup = {
        g
        for g, ids in occ.items()
        if (len(set(ids)) > 1 if cross_doc_only else len(ids) > 1)
    }
    out = {}
    for doc_id, text in docs:
        if text is None:
            continue
        covered = set()
        for i in range(len(text) - min_len + 1):
            if text[i : i + min_len] in dup:
                covered.update(range(i, i + min_len))
        if not covered:
            continue
        spans, chars = [], sorted(covered)
        start = prev = chars[0]
        for c in chars[1:]:
            if c > prev + 1:
                spans.append((start + 1, prev + 1))
                start = c
            prev = c
        spans.append((start + 1, prev + 1))
        out[doc_id] = spans
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("cross_doc_only", [False, True])
def test_spans_match_string_level_oracle(spark, docs_df, cross_doc_only):
    got = {
        r["doc_id"]: [(s["start"], s["end"]) for s in r["dup_spans"]]
        for r in duplicate_span_flags(
            docs_df, min_len=L, cross_doc_only=cross_doc_only
        ).collect()
    }
    assert got == _oracle(DOCS, L, cross_doc_only)


def test_span_is_exactly_the_shared_paragraph(docs_df):
    rows = {
        r["doc_id"]: r
        for r in duplicate_span_flags(docs_df, min_len=L, cross_doc_only=True).collect()
    }
    # doc 3 is exactly the shared string: the span covers it entirely
    assert [(s["start"], s["end"]) for s in rows[3]["dup_spans"]] == [(1, len(SHARED))]
    assert rows[3]["dup_chars"] == len(SHARED)
    # docs 0/1: offsets recover the shared paragraph verbatim
    for doc_id in (0, 1):
        (span,) = rows[doc_id]["dup_spans"]
        text = dict(DOCS)[doc_id]
        assert text[span["start"] - 1 : span["end"]] == SHARED
    # within-doc-only repetition is excluded under cross_doc_only
    assert 4 not in rows and 2 not in rows and 6 not in rows


def test_within_doc_repetition_default_semantics(docs_df):
    rows = {
        r["doc_id"]: r for r in duplicate_span_flags(docs_df, min_len=L).collect()
    }
    # "xyxy..." self-overlaps: every position duplicated, one full span
    assert [(s["start"], s["end"]) for s in rows[4]["dup_spans"]] == [(1, 80)]


def test_strip_removes_spans_and_keeps_rest(spark, docs_df):
    got = {
        r["doc_id"]: r["text"]
        for r in strip_duplicate_spans(
            docs_df, min_len=L, cross_doc_only=True
        ).collect()
    }
    expected_spans = _oracle(DOCS, L, True)
    for doc_id, text in DOCS:
        if text is None:
            assert got[doc_id] is None
            continue
        want = text
        for start, end in reversed(expected_spans.get(doc_id, [])):
            want = want[: start - 1] + want[end:]
        assert got[doc_id] == want, doc_id
    # untouched docs pass through byte-identical
    assert got[2] == dict(DOCS)[2]


def test_no_python_udf_in_plan(docs_df):
    plan = (
        duplicate_span_flags(docs_df, min_len=L)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_deterministic_across_parallelism(docs_df):
    outs = []
    for n in (1, 7):
        outs.append(
            sorted(
                (r["doc_id"], [(s["start"], s["end"]) for s in r["dup_spans"]])
                for r in duplicate_span_flags(
                    docs_df.repartition(n), min_len=L
                ).collect()
            )
        )
    assert outs[0] == outs[1]


def test_validation():
    with pytest.raises(ValueError, match="min_len"):
        duplicate_span_flags(None, min_len=1)
