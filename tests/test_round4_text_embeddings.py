"""Round 4: deterministic hashed-feature text embeddings — the
docs-table -> vector-stack bridge (embeddings.text_embeddings).

Value oracle shares NO Spark code: the pure-Python XXH64 twin (proven
bit-identical to F.xxhash64 in test_round4_fasthash_oracle) + stdlib
tokenization + numpy-free float math re-derive every vector.

References (public): Weinberger et al. 2009 (feature hashing, the
signed ξ construction), Charikar 2002 (random projections for cosine).
"""
from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.functions.embeddings import semantic_dedup, text_embeddings


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- pure-Python oracle ------------------------------------------------------


def _norm_words(text: str) -> list[str]:
    # mirror normalized_text's ENGINE semantics exactly: Spark trim()
    # strips 0x20 only, Java \s is ASCII-only ([ \t\n\x0B\f\r]) — NBSP /
    # ideographic space are word CHARS there, unlike Python's unicode \s
    t = re.sub(r"[ \t\n\x0b\f\r]+", " ", text.strip(" ").lower())
    return [w for w in t.split(" ") if w]


def _grams(text: str | None, n: int) -> list[str]:
    if text is None:
        return []
    words = _norm_words(text)
    if not words:
        return []
    if n == 1:
        return words
    if len(words) < n:
        return [" ".join(words)]
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def _embed_py(text: str | None, dim: int, seed: int, n: int) -> list[float]:
    import test_round4_fasthash_oracle as fh

    vec = [0.0] * dim
    for g in _grams(text, n):
        h = fh.xxh64(f"emb{seed}:{g}".encode())
        vec[h % dim] += 1.0 if (h >> 32) & 1 else -1.0
    norm = math.sqrt(sum(x * x for x in vec))
    return [x / norm for x in vec] if norm > 0 else vec


FIXTURE = [
    (1, "The cat sat on the mat"),
    (2, "the cat  sat on the mat"),  # normalization twin of 1
    (3, "a completely different sentence about spark plans"),
    (4, None),
    (5, ""),
    (6, "   \t  "),  # whitespace-only -> zero vector like empty
    (7, "single"),
    (8, "the cat sat on the mat but this one keeps going with more words"),
    (9, "répétition non-ascii tökens § with punctuation, kept as-is!"),
]


def _docs(spark):
    return spark.createDataFrame(FIXTURE, "doc_id long, text string")


# --- value oracle -------------------------------------------------------------


@pytest.mark.parametrize(
    # 100 is deliberately NOT a power of two: engine (numpy signed
    # floor-mod) and twin (Python signed floor-mod) must agree for ANY
    # dim, not just when the mod reduces to a bit mask
    "dim,seed,ngrams",
    [(16, 42, 1), (64, 7, 1), (32, 42, 2), (100, 42, 1)],
)
def test_matches_python_oracle(spark, dim, seed, ngrams):
    got = {
        r.vec_id: list(r.embedding)
        for r in text_embeddings(
            _docs(spark), dim=dim, seed=seed, ngrams=ngrams
        ).collect()
    }
    assert set(got) == {i for i, _ in FIXTURE}
    for doc_id, text in FIXTURE:
        want = _embed_py(text, dim, seed, ngrams)
        assert len(got[doc_id]) == dim
        for a, b in zip(got[doc_id], want):
            assert a == pytest.approx(b, abs=1e-6), (doc_id, text)


def test_normalization_twins_and_null_zero(spark):
    rows = {r.vec_id: list(r.embedding) for r in text_embeddings(_docs(spark)).collect()}
    # case/whitespace-normalized twins embed identically
    assert rows[1] == rows[2]
    # unit norm for non-empty docs
    assert sum(x * x for x in rows[1]) == pytest.approx(1.0, abs=1e-6)
    # NULL, empty, and whitespace-only text -> the zero vector
    for doc_id in (4, 5, 6):
        assert all(x == 0.0 for x in rows[doc_id])


def test_partitioning_stability_and_seed_sensitivity(spark):
    base = {r.vec_id: list(r.embedding) for r in text_embeddings(_docs(spark)).collect()}
    repart = {
        r.vec_id: list(r.embedding)
        for r in text_embeddings(_docs(spark).repartition(7)).collect()
    }
    assert base == repart
    other = {
        r.vec_id: list(r.embedding)
        for r in text_embeddings(_docs(spark), seed=99).collect()
    }
    assert base[1] != other[1]  # a different seed is a different projection


def test_validation(spark):
    with pytest.raises(ValueError, match="dim"):
        text_embeddings(_docs(spark), dim=0)
    with pytest.raises(ValueError, match="dim"):
        text_embeddings(_docs(spark), dim=5000)
    with pytest.raises(ValueError, match="ngrams"):
        text_embeddings(_docs(spark), ngrams=0)


# --- plan + composition --------------------------------------------------------


def test_plan_one_arrow_eval_no_key_shuffle(spark):
    plan = plan_of(text_embeddings(_docs(spark)))
    assert plan.count("ArrowEvalPython") == 1
    # the only Exchange is the deliberate round-robin widen — never a
    # key shuffle (hashpartitioning) or a global sort (rangepartitioning)
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan


def test_bridges_docs_to_semantic_dedup(spark):
    emb = text_embeddings(_docs(spark), dim=64)
    out = {
        r.id: (r.cluster_id, r.is_keeper)
        for r in semantic_dedup(emb, n_cells=2, threshold=0.99).collect()
    }
    # exactly the normalization twins cluster; keeper = min id
    assert out == {1: (1, True), 2: (1, False)}


def test_blocked_bincount_path_matches_oracle(spark):
    # dim=4096 -> the UDF's dense scratch buffer is blocked at
    # step = 2_000_000 // 4096 = 488 rows; 600 single-partition rows
    # force >1 block inside ONE Arrow batch. Values must be identical
    # to the unblocked math (the Python oracle).
    rows = [(i, f"word{i} tail{i % 7}") for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    got = {
        r.vec_id: list(r.embedding)
        for r in text_embeddings(df, dim=4096).collect()
    }
    assert len(got) == 600
    # spot-check rows straddling the 488-row block boundary + endpoints
    for doc_id in (0, 486, 487, 488, 489, 599):
        want = _embed_py(rows[doc_id][1], 4096, 42, 1)
        for a, b in zip(got[doc_id], want):
            assert a == pytest.approx(b, abs=1e-6), doc_id
    for v in got.values():
        assert sum(x * x for x in v) == pytest.approx(1.0, abs=1e-5)


def test_random_unicode_sweep_matches_oracle(spark):
    # 200 seeded pseudo-random texts over a hostile alphabet (unicode
    # whitespace, combining marks, CJK, emoji, quotes, NULs are absent —
    # parquet strings) in ONE Spark job, every vector re-derived by the
    # pure-Python oracle.
    import random

    rng = random.Random(4242)
    alphabet = (
        "abc XYZ 123 \t\n 　 éü ß 中文字 🙂🚀 'quote' \"dq\" ,.;:!? "
        "́̈ \r  -_/\\|"
    )
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.vec_id: list(r.embedding) for r in text_embeddings(df, dim=32).collect()}
    assert len(got) == 200
    for i, t in enumerate(texts):
        want = _embed_py(t, 32, 42, 1)
        for a, b in zip(got[i], want):
            assert a == pytest.approx(b, abs=1e-6), (i, repr(t))
