"""Corpus mixing (functions/mixing.py): per-group weighted sampling
with repetition epochs, and token-budget quotas. Oracles are recomputed
with hashlib.md5 in pure Python — fully independent of Spark's hash
expressions — so a divergence in the engine's bucket math fails here.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from fscrawler_spark.functions import mixing
from fscrawler_spark.functions.curation import _BUCKETS


def _bucket(key, salt):
    """Pure-Python twin of curation._hash_bucket: first 15 md5 hex chars
    as int, mod 1e6."""
    s = "<null>" if key is None else str(key)
    return int(hashlib.md5((salt + s).encode()).hexdigest()[:15], 16) % _BUCKETS


def _expected_copies(key, rate, salt):
    full = int(math.floor(rate))
    frac = rate - full
    thresh = int(frac * _BUCKETS)
    return full + (1 if _bucket(key, salt) < thresh else 0)


def _mix_fixture(spark):
    rows = [(f"d{i}", ["web", "code", "books", None][i % 4], 10 + i % 7) for i in range(400)]
    return spark.createDataFrame(rows, "doc_id string, source string, tokens long")


def test_mix_corpus_matches_python_oracle(spark):
    df = _mix_fixture(spark)
    rates = {"web": 0.25, "code": 2.5, "books": 1.0}
    out = mixing.mix_corpus(df, "source", rates, key_col="doc_id", default_rate=0.5)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append(r.epoch)
    exp = {}
    for i in range(400):
        key = f"d{i}"
        src = ["web", "code", "books", None][i % 4]
        rate = rates.get(src, 0.5)  # NULL source -> default
        c = _expected_copies(key, rate, "mix")
        if c > 0:
            exp[key] = list(range(c))
    assert {k: sorted(v) for k, v in got.items()} == exp
    # epochs are 0-based consecutive copies, schema gains exactly one col
    assert set(out.columns) == {"doc_id", "source", "tokens", "epoch"}


def test_mix_corpus_stable_under_repartition_and_null_group_entry(spark):
    df = _mix_fixture(spark)
    rates = {"web": 0.3, "<null>": 2.0}
    a = sorted((r.doc_id, r.epoch) for r in mixing.mix_corpus(df, "source", rates, "doc_id").collect())
    b = sorted(
        (r.doc_id, r.epoch)
        for r in mixing.mix_corpus(df.repartition(17), "source", rates, "doc_id").collect()
    )
    assert a == b
    # the explicit "<null>" entry governs NULL-source rows: all get 2 epochs
    nulls = [x for x in a if int(x[0][1:]) % 4 == 3]
    assert nulls and all(
        sorted(e for d2, e in nulls if d2 == d) == [0, 1] for d, _ in nulls
    )


def test_mix_corpus_rejects_unhonorable_rates(spark):
    df = _mix_fixture(spark)
    with pytest.raises(ValueError, match="resolution"):
        mixing.mix_corpus(df, "source", {"web": 1e-9}, "doc_id")
    with pytest.raises(ValueError, match="finite"):
        mixing.mix_corpus(df, "source", {"web": float("inf")}, "doc_id")
    with pytest.raises(ValueError, match=">= 0"):
        mixing.mix_corpus(df, "source", {"web": -0.5}, "doc_id")
    with pytest.raises(ValueError, match="default_rate"):
        mixing.mix_corpus(df, "source", {}, "doc_id", default_rate=float("nan"))


def test_rate_zero_drops_group_entirely(spark):
    df = _mix_fixture(spark)
    out = mixing.mix_corpus(df, "source", {"web": 0.0}, "doc_id")
    assert out.filter(F.col("source") == "web").count() == 0
    # everyone else kept exactly once at the default rate 1.0
    assert out.filter(F.col("source") != "web").count() == 200  # code+books


def test_sample_to_token_budget_downsamples_to_quota(spark):
    df = _mix_fixture(spark)
    totals = {
        r["source"]: r["t"]
        for r in df.groupBy("source").agg(F.sum("tokens").alias("t")).collect()
    }
    budget = 400
    out, rates = mixing.sample_to_token_budget(
        df, "source", "tokens", budget, key_col="doc_id"
    )
    # computed rates are the quantized budget/total, capped at 1.0
    for g, t in totals.items():
        gg = "<null>" if g is None else g
        exp = min(1.0, budget / t)
        assert abs(rates[gg] - exp) < 1.5 / _BUCKETS
    # achieved tokens land near the budget for downsampled groups
    # (row granularity: within max row weight of the quota in expectation;
    # allow generous slack for a 100-row group)
    ach = {
        r["source"]: r["t"]
        for r in out.groupBy("source").agg(F.sum("tokens").alias("t")).collect()
    }
    for g in totals:
        assert ach.get(g, 0) <= totals[g]
        assert ach.get(g, 0) == pytest.approx(budget, rel=0.35)
    # no epoch > 0 without allow_upsample
    assert out.filter(F.col("epoch") > 0).count() == 0


def test_sample_to_token_budget_upsample_and_dict_budgets(spark):
    df = _mix_fixture(spark)
    total_web = df.filter(F.col("source") == "web").agg(F.sum("tokens")).first()[0]
    out, rates = mixing.sample_to_token_budget(
        df, "source", "tokens", {"web": int(total_web * 2.5)}, key_col="doc_id",
        allow_upsample=True,
    )
    assert rates["web"] == pytest.approx(2.5, abs=1.5 / _BUCKETS)
    # unbudgeted groups keep rate 1.0 exactly
    assert out.filter(F.col("source") == "code").count() == 100
    web_tokens = (
        out.filter(F.col("source") == "web").agg(F.sum("tokens")).first()[0]
    )
    assert web_tokens == pytest.approx(total_web * 2.5, rel=0.25)
    # upsampled rows carry distinct epoch indices for interleaving
    assert out.filter((F.col("source") == "web") & (F.col("epoch") == 2)).count() > 0


def test_mix_corpus_plan_has_no_exchange(spark):
    """The scale contract from the module docstring: rate lookup is a
    codegen literal map, the keep decision a hash filter, replication an
    explode — the whole mix rides the scan partitioning, zero shuffle."""
    df = _mix_fixture(spark)
    out = mixing.mix_corpus(df, "source", {"web": 2.5, "code": 0.25}, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "*(1)" in plan  # one whole-stage-codegen span covers the mix


def test_sample_to_token_budget_loud_failures(spark):
    df = _mix_fixture(spark)
    with pytest.raises(ValueError, match=">= 0"):
        mixing.sample_to_token_budget(df, "source", "tokens", {"web": -1}, "doc_id")
    # a nonzero budget that floors to rate 0 must raise, never empty
    big = spark.createDataFrame(
        [(f"x{i}", "web", 10**9) for i in range(10)], "doc_id string, source string, tokens long"
    )
    with pytest.raises(ValueError, match="resolution"):
        mixing.sample_to_token_budget(big, "source", "tokens", {"web": 1}, "doc_id")
    # budget over an absent group is a no-op rate 1.0, not a crash
    _, rates = mixing.sample_to_token_budget(df, "source", "tokens", {"nope": 5}, "doc_id")
    assert rates["nope"] == 1.0
