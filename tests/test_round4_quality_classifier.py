"""Learned quality filter (functions/quality_classifier.py): NB log-odds
checked against a pure-Python oracle sharing no Spark code (hashlib md5
grams, math.log), plus decision behavior, the neutral-prior contract for
gram-less docs, and the inherited DSIR plan shape.
"""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.functions.quality_classifier import (
    QualityModel,
    classify_quality,
    train_quality_classifier,
)

B = 64
NS = (1, 2)
ALPHA = 1.0

POS = [
    (0, "the structured reference text explains the extraction pipeline clearly"),
    (1, "a well formed paragraph describes the spark plan and its shuffle shape"),
    (2, "documentation text with clear sentences about partitioning and joins"),
]
NEG = [
    (10, "zzz qqq xxx zzz qqq xxx zzz qqq"),
    (11, "click here buy now click here buy now"),
    (12, "qqq zzz buy zzz qqq click xxx"),
]
CORPUS = [
    (100, "the reference text explains the spark plan clearly"),  # pos-like
    (101, "click here buy now zzz qqq xxx"),  # neg-like
    (102, None),  # gram-less -> lands on the prior
    (103, "   "),  # empty -> gram-less too
]


def _md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text, ns):
    if text is None:
        return []
    words = re.split(r"\s+", text.strip().lower())
    out = []
    for n in ns:
        if len(words) >= n:
            out += [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return [g for g in out if g]


def _oracle_log_odds():
    pc, nc = {}, {}
    for docs, cnt in ((POS, pc), (NEG, nc)):
        for _, t in docs:
            for g in _grams(t, NS):
                b = _md5_int(g) % B
                cnt[b] = cnt.get(b, 0) + 1
    p_tot, n_tot = sum(pc.values()), sum(nc.values())
    lr = {
        b: math.log((pc.get(b, 0) + ALPHA) / (p_tot + ALPHA * B))
        - math.log((nc.get(b, 0) + ALPHA) / (n_tot + ALPHA * B))
        for b in range(B)
    }
    prior = math.log(len(POS) / len(NEG))
    return {
        i: prior + sum(lr[_md5_int(g) % B] for g in _grams(t, NS))
        for i, t in CORPUS
    }, prior


@pytest.fixture(scope="module")
def model(spark):
    pos = spark.createDataFrame(POS, "doc_id long, text string")
    neg = spark.createDataFrame(NEG, "doc_id long, text string")
    return train_quality_classifier(
        pos, neg, buckets=B, ns=NS, alpha=ALPHA, hash_family="md5"
    )


def test_log_odds_match_python_oracle(spark, model):
    expected, prior = _oracle_log_odds()
    assert model.prior_log_odds == pytest.approx(prior)
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {r["doc_id"]: r["log_odds"] for r in classify_quality(corpus, model).collect()}
    assert set(got) == set(expected)
    for i in expected:
        assert got[i] == pytest.approx(expected[i], rel=1e-9), i


def test_decisions_separate_pos_from_junk(spark, model):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    keep = {r["doc_id"]: r["keep"] for r in classify_quality(corpus, model).collect()}
    assert keep[100] is True
    assert keep[101] is False
    # gram-less docs land exactly on the prior (log(3/3)=0), which is NOT
    # > the 0.0 Bayes threshold -> dropped; a negative threshold keeps them
    assert keep[102] is False and keep[103] is False
    lenient = {
        r["doc_id"]: r["keep"]
        for r in classify_quality(corpus, model, threshold=-0.5).collect()
    }
    assert lenient[102] is True and lenient[103] is True


def test_empty_seed_sets_raise(spark):
    pos = spark.createDataFrame(POS, "doc_id long, text string")
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="seed"):
        train_quality_classifier(pos, empty, buckets=B, hash_family="md5")
    with pytest.raises(ValueError, match="seed"):
        train_quality_classifier(empty, pos, buckets=B, hash_family="md5")


def test_custom_id_col_round_trips(spark, model):
    corpus = spark.createDataFrame(
        [(r[0], r[1]) for r in CORPUS], "turn_key long, text string"
    )
    out = classify_quality(corpus, model, id_col="turn_key")
    assert out.columns == ["turn_key", "log_odds", "keep"]
    assert out.count() == len(CORPUS)


def test_scoring_plan_inherits_dsir_shape(spark, model):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    plan = classify_quality(corpus, model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # model rides broadcast
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_model_dataclass_carries_feature_params(model):
    assert isinstance(model, QualityModel)
    assert (model.buckets, model.ns, model.hash_family) == (B, NS, "md5")


def test_seed_guard_counts_gram_capable_docs(spark):
    """ns without unigrams: single-word seeds produce zero bigrams, so
    they must fail the guard instead of training a zero-mass side."""
    one_worders = spark.createDataFrame(
        [(0, "hello"), (1, "world")], "doc_id long, text string"
    )
    ok = spark.createDataFrame([(9, "two words here")], "doc_id long, text string")
    with pytest.raises(ValueError, match="words"):
        train_quality_classifier(ok, one_worders, buckets=B, ns=(2,), hash_family="md5")
    # with unigrams in ns the same seeds are fine
    m = train_quality_classifier(ok, one_worders, buckets=B, ns=(1, 2), hash_family="md5")
    assert m.prior_log_odds != 0.0
