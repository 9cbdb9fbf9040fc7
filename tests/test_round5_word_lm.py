"""Round 5: the hashed word-n-gram stupid-backoff LM (lm_quality.WordLM)
— the CCNet-closer model the q_perplexity driver row swapped to.

Value oracles:
* training counts and backoff scoring against an INDEPENDENT pure-Python
  twin (string-keyed Counter model, its own backoff loop);
* the char-trigram model's full DuckDB SQL twin lives HERE now (demoted
  from the driver registry with the model swap — q_perplexity's oracle
  is the word-LM SQL twin in __spark_entry__.py).
"""

import math
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from fscrawler_spark.functions.lm_quality import (
    WordLM,
    _md5_int_py,
    _normalize_py,
    add_perplexity,
    perplexity_buckets,
    train_char_lm,
    train_word_lm,
)

TEXTS = [
    "the cat sat on the mat",
    "the cat sat on a hat",
    "a dog sat on the mat",
    "the cat sat on the mat again and again",
    None,
    "",
    "one",
    "  the   cat  ",  # normalization: collapse + trim
]


def _df(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _twin_counts(texts, n=3, min_count=2):
    cnt = [Counter() for _ in range(n)]
    for t in texts:
        norm = _normalize_py(t)
        if not norm:
            continue
        ws = norm.split(" ")
        for k in range(1, n + 1):
            for i in range(len(ws) - k + 1):
                cnt[k - 1][" ".join(ws[i : i + k])] += 1
    kept = [
        {g: c for g, c in cnt[k - 1].items() if k == 1 or c >= min_count}
        for k in range(1, n + 1)
    ]
    return cnt, kept


def _twin_ppl(text, kept, total, n=3, alpha=0.4):
    norm = _normalize_py(text)
    if not norm:
        return None
    ws = norm.split(" ")
    lp = 0.0
    for i in range(len(ws)):
        m = min(n, i + 1)
        mult = 1.0
        s = None
        for k in range(m, 1, -1):
            num = kept[k - 1].get(" ".join(ws[i - k + 1 : i + 1]))
            den = kept[k - 2].get(" ".join(ws[i - k + 1 : i]))
            if num is not None and den is not None:
                s = mult * num / den
                break
            mult *= alpha
        if s is None:
            c1 = kept[0].get(ws[i])
            s = mult * ((c1 if c1 is not None else 0.5) / total)
        lp += math.log(s)
    return math.exp(-lp / len(ws))


def test_training_counts_match_independent_twin(spark):
    lm = train_word_lm(_df(spark), n=3)
    cnt, kept = _twin_counts(TEXTS)
    assert lm.total_tokens == sum(cnt[0].values())
    for k in range(1, 4):
        assert lm.counts[k - 1] == {_md5_int_py(g): c for g, c in kept[k - 1].items()}


def test_scoring_matches_independent_twin(spark):
    lm = train_word_lm(_df(spark), n=3)
    cnt, kept = _twin_counts(TEXTS)
    total = sum(cnt[0].values())
    probes = [t for t in TEXTS if t] + [
        "unseen words entirely here",
        "the cat sat somewhere new",
        "mat",  # single known unigram
        "zzz",  # single unseen unigram -> 0.5/N floor
    ]
    for t in probes:
        assert lm.perplexity(t) == pytest.approx(
            _twin_ppl(t, kept, total), rel=1e-12
        ), t
    assert lm.perplexity(None) is None and lm.perplexity("") is None


def test_udf_scoring_matches_driver_side(spark):
    df = _df(spark)
    lm = train_word_lm(df, n=3)
    rows = {r.doc_id: r.ppl for r in add_perplexity(df, lm).collect()}
    for i, t in enumerate(TEXTS):
        exp = lm.perplexity(t)
        if exp is None:
            assert rows[i] is None
        else:
            assert rows[i] == pytest.approx(exp, rel=1e-12)


def test_cap_is_per_order_and_deterministic(spark):
    df = _df(spark)
    full = train_word_lm(df, n=2, min_count=1)
    capped = train_word_lm(df, n=2, min_count=1, max_ngrams=3)
    for k in (1, 2):
        assert len(capped.counts[k - 1]) == 3
        # the cap keeps the top counts, hash-ascending on ties
        ranked = sorted(full.counts[k - 1].items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        assert capped.counts[k - 1] == dict(ranked)


def test_buckets_work_with_word_lm(spark):
    df = _df(spark)
    lm = train_word_lm(df, n=3)
    out = perplexity_buckets(df, lm, text_col="text")
    by_bucket = {r.doc_id: r.ppl_bucket for r in out.collect()}
    assert by_bucket[4] is None and by_bucket[5] is None  # null/empty text
    assert {b for b in by_bucket.values() if b} <= {"head", "middle", "tail"}
    assert "head" in by_bucket.values() and "tail" in by_bucket.values()


def test_validation():
    with pytest.raises(ValueError, match="n must"):
        train_word_lm(None, n=0)
    with pytest.raises(ValueError, match="alpha"):
        train_word_lm(None, alpha=0.0)
    with pytest.raises(ValueError, match="max_ngrams"):
        train_word_lm(None, max_ngrams=0)


def test_cli_ppl_model_word(spark, tmp_path, capsys):
    import json
    import os

    from fscrawler_spark.cli import main

    p = str(tmp_path / "src")
    _df(spark).withColumnRenamed("text", "extracted").withColumn(
        "conv_id", F.lit("c")
    ).withColumn("turn_idx", F.col("doc_id").cast("int")).write.parquet(
        os.path.join(p, "docs")
    )
    out = str(tmp_path / "ppl")
    rc = main(
        ["--input", p, "--output", out, "--ppl-filter", "head,middle,tail",
         "--ppl-model", "word"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["model"] == "word"
    assert res["kept"] == 6  # null/empty text rows keep NULL buckets


# --- char-trigram SQL twin (demoted from the driver registry) ---------------

CHAR_SQL = """
WITH norm AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
  FROM documents
),
g AS (
  SELECT substr(t, i, 3) AS g3
  FROM norm, unnest(generate_series(1, length(t) - 2)) AS u(i)
  WHERE length(t) >= 3
),
counts AS (SELECT g3, count(*) AS c FROM g GROUP BY g3),
kept AS (SELECT g3, c FROM counts WHERE c >= 2
         ORDER BY c DESC, g3 ASC LIMIT 200000),
kctx AS (SELECT DISTINCT substr(g3, 1, 2) AS ctx FROM kept),
ctx AS (SELECT substr(g3, 1, 2) AS ctx, sum(c) AS tot FROM counts GROUP BY 1),
kc AS (SELECT ctx.ctx, ctx.tot FROM ctx JOIN kctx USING (ctx)),
v AS (SELECT count(DISTINCT substr(g3, 3, 1)) + 1 AS vs FROM counts),
sg AS (
  SELECT doc_id, substr(t, i, 3) AS g3, substr(t, i, 2) AS cx
  FROM norm, unnest(generate_series(1, length(t) - 2)) AS u(i)
  WHERE length(t) >= 3
),
scored AS (
  SELECT sg.doc_id,
         CASE WHEN kc.ctx IS NULL THEN -ln(v.vs)
              ELSE ln((coalesce(k.c, 0) + 0.5) / (kc.tot + 0.5 * v.vs)) END AS lp
  FROM sg LEFT JOIN kc ON kc.ctx = sg.cx
          LEFT JOIN kept k ON k.g3 = sg.g3
          CROSS JOIN v
),
p AS (SELECT doc_id, exp(-sum(lp) / count(*)) AS ppl FROM scored GROUP BY doc_id)
SELECT d.doc_id, floor(p.ppl * 1000) / 1000 AS ppl_t
FROM documents d LEFT JOIN p USING (doc_id)
"""


def test_char_lm_sql_twin_still_green(spark):
    sf = "/root/testdata/sf0.001"
    d = spark.read.parquet(f"{sf}/documents.parquet")
    lm = train_char_lm(d, n=3, add_k=0.5, min_count=2, max_ngrams=200_000)
    got = {
        r.doc_id: r.ppl_t
        for r in add_perplexity(d, lm)
        .select("doc_id", (F.floor(F.col("ppl") * 1000) / 1000).alias("ppl_t"))
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    exp = dict(con.execute(CHAR_SQL).fetchall())
    assert got == exp
