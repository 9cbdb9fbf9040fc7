"""Round 4+: the --decontaminate / --ppl-filter / --tokenize one-shot
CLI verbs (cli.py) and the curation.decontaminate library wrapper.
Expectations are computed independently of the modules under test:
pure-Python word-n-gram set intersections for decontamination, the
token-reconstruction invariant (join(tokens) == word + '</w>' per word)
for BPE, and corpus construction that forces the perplexity ordering
(fluent repeated English vs consonant gibberish) for the CCNet split.
"""

import json
import os

import pytest

FLUENT = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "the quick brown fox runs over the lazy dog near the river bend",
    "a quick brown fox walks over the lazy dog by the river bank",
    "the quick red fox jumps over the sleepy dog near the river bank",
]
GIBBERISH = [
    "zqx vkj wfp bzt qxz jvk pfw tzb xqz kjv",
    "qzj xvw kpf tzq bxj vwk fpz qtb zxq jkv",
]


def _docs_table(spark, tmp_path, rows, name="docs_in"):
    p = str(tmp_path / name)
    spark.createDataFrame(
        rows, "doc_id long, conv_id string, turn_idx int, extracted string"
    ).write.parquet(os.path.join(p, "docs"))
    return p


def _py_ngrams(text, n):
    words = text.lower().split()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


# --- decontamination ---------------------------------------------------------

BENCH_ITEM = "what is the capital city of the ancient kingdom of lydia answer sardis"
# 10 words copied from the bench item -> 3 shared distinct 8-grams
LEAK_10 = "intro words then " + " ".join(BENCH_ITEM.split()[:10]) + " trailing text"
# exactly 8 words copied -> exactly 1 shared 8-gram
LEAK_8 = "prefix " + " ".join(BENCH_ITEM.split()[:8]) + " suffix"
CLEAN = "completely unrelated prose about gardening tips and tomato seedlings in spring"


def _expected_dropped(corpus_rows, bench_texts, n, min_hits):
    bench_grams = set()
    for t in bench_texts:
        bench_grams |= _py_ngrams(t, n)
    dropped = set()
    for doc_id, text in corpus_rows:
        if text is None:
            continue
        # per-pair hit count with a single bench item == plain intersection
        if len(_py_ngrams(text, n) & bench_grams) >= min_hits:
            dropped.add(doc_id)
    return dropped


def test_decontaminate_library(spark):
    from fscrawler_spark.functions.curation import decontaminate

    corpus_rows = [(0, LEAK_10), (1, LEAK_8), (2, CLEAN), (3, None)]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = spark.createDataFrame([(0, BENCH_ITEM)], "bench_id long, text string")

    expected_dropped = _expected_dropped(corpus_rows, [BENCH_ITEM], n=8, min_hits=2)
    assert expected_dropped == {0}  # the construction above is the point

    kept = {
        r.doc_id
        for r in decontaminate(
            corpus, bench, id_col="doc_id", text_col="text", n=8, min_hits=2
        ).collect()
    }
    assert kept == {0, 1, 2, 3} - expected_dropped

    # min_hits=1 also drops the single-shared-gram doc; the clean and
    # null-text docs always survive
    kept1 = {
        r.doc_id
        for r in decontaminate(
            corpus, bench, id_col="doc_id", text_col="text", n=8, min_hits=1
        ).collect()
    }
    assert kept1 == {2, 3}


def test_cli_decontaminate(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(
        spark,
        tmp_path,
        [(0, "c0", 0, LEAK_10), (1, "c0", 1, LEAK_8), (2, "c1", 0, CLEAN), (3, "c1", 1, None)],
    )
    bench = _docs_table(spark, tmp_path, [(0, "b", 0, BENCH_ITEM)], name="bench")
    out = str(tmp_path / "decon")
    rc = main(
        ["--input", src, "--output", out, "--decontaminate", bench], spark=spark
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res == {
        "decontaminate": True,
        "ngrams": 8,
        "min_hits": 2,
        "total": 4,
        "kept": 3,
        "dropped": 1,
        "output": out,
    }
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 2, 3}


def test_cli_decontaminate_min_hits_1(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(
        spark, tmp_path, [(0, "c0", 0, LEAK_10), (1, "c0", 1, LEAK_8), (2, "c1", 0, CLEAN)]
    )
    bench = _docs_table(spark, tmp_path, [(0, "b", 0, BENCH_ITEM)], name="bench")
    out = str(tmp_path / "decon1")
    rc = main(
        ["--input", src, "--output", out, "--decontaminate", bench,
         "--decon-min-hits", "1", "--decon-ngrams", "8"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["kept"] == 1 and res["dropped"] == 2 and res["min_hits"] == 1
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {2}


# --- perplexity filter -------------------------------------------------------

def test_cli_ppl_filter(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    rows = [(i, "c0", i, t) for i, t in enumerate(FLUENT)] + [
        (10, "c1", 0, GIBBERISH[0]),
        (11, "c1", 1, GIBBERISH[1]),
        (12, "c2", 0, None),  # unscorable -> NULL bucket -> always dropped
    ]
    src = _docs_table(spark, tmp_path, rows)
    out = str(tmp_path / "ppl")
    rc = main(
        ["--input", src, "--output", out, "--ppl-filter", "head,middle"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["total"] == 7 and res["trained_on"] == "input"
    assert res["by_bucket"].get("<null>") == 1
    written = spark.read.parquet(out)
    kept = {r.doc_id for r in written.collect()}
    # the LM is trained on a corpus dominated by the fluent docs; the
    # consonant gibberish must score in the tail and the null text has
    # no bucket — only fluent docs survive a head+middle keep
    assert kept == {0, 1, 2, 3}
    assert res["kept"] == 4
    # audit columns ride along
    assert {"ppl", "ppl_bucket"} <= set(written.columns)
    assert {r.ppl_bucket for r in written.collect()} <= {"head", "middle"}


def test_cli_ppl_filter_seed_corpus_and_recycle(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    seed = _docs_table(
        spark, tmp_path, [(i, "s", i, t) for i, t in enumerate(FLUENT)], name="seed"
    )
    # 2 fluent + 2 gibberish docs, keep head at the median cut: the
    # median of 4 ppl values is a FLUENT doc's ppl (quantiles return
    # actual data values), so head == the two fluent docs regardless of
    # where inside each cluster the boundary value lands
    rows = [
        (0, "c0", 0, FLUENT[0]),
        (1, "c0", 1, FLUENT[1]),
        (2, "c1", 0, GIBBERISH[0]),
        (3, "c1", 1, GIBBERISH[1]),
    ]
    src = _docs_table(spark, tmp_path, rows)
    out1 = str(tmp_path / "ppl1")
    rc = main(
        ["--input", src, "--output", out1, "--ppl-filter", "head",
         "--ppl-target", seed, "--ppl-cuts", "0.5,0.75"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["trained_on"] == seed and res["cuts"] == [0.5, 0.75]
    # trained on fluent text only: the fluent docs are the head
    assert {r.doc_id for r in spark.read.parquet(out1).collect()} == {0, 1}
    # re-filtering a previous output drops stale audit columns first
    out2 = str(tmp_path / "ppl2")
    rc = main(
        ["--input", out1, "--output", out2, "--ppl-filter", "head,middle,tail",
         "--ppl-target", seed],
        spark=spark,
    )
    assert rc == 0
    assert spark.read.parquet(out2).count() == 2


# --- BPE tokenize ------------------------------------------------------------

def test_cli_tokenize_and_reuse_merges(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    rows = [
        (0, "c0", 0, "banana bandana banana bandana banana"),
        (1, "c0", 1, "banana banana bandana"),
        (2, "c1", 0, None),
    ]
    src = _docs_table(spark, tmp_path, rows)
    out1 = str(tmp_path / "tok1")
    rc = main(["--input", src, "--output", out1, "--tokenize", "20"], spark=spark)
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["tokenize"] == 20 and res["trained"] is True and res["rows"] == 3
    assert 0 < res["merges"] <= 20
    docs1 = {r.doc_id: r for r in spark.read.parquet(os.path.join(out1, "docs")).collect()}
    # reconstruction invariant: joined tokens == each word + '</w>'
    for doc_id, _, _, text in rows:
        if text is None:
            assert docs1[doc_id].bpe_tokens is None
            assert docs1[doc_id].n_bpe_tokens is None
        else:
            expect = "".join(w + "</w>" for w in text.split())
            assert "".join(docs1[doc_id].bpe_tokens) == expect
            assert docs1[doc_id].n_bpe_tokens == len(docs1[doc_id].bpe_tokens)
    assert res["total_tokens"] == sum(
        r.n_bpe_tokens for r in docs1.values() if r.n_bpe_tokens is not None
    )
    # the merges table is the persistable artifact
    merges = spark.read.parquet(os.path.join(out1, "merges"))
    assert {"rank", "left", "right", "merged"} <= set(merges.columns)
    assert merges.count() == res["merges"]

    # reuse run: encode a NEW corpus with the trained vocabulary —
    # shared words must encode identically to the training run
    src2 = _docs_table(
        spark, tmp_path, [(5, "c9", 0, "bandana banana")], name="docs_in2"
    )
    out2 = str(tmp_path / "tok2")
    rc = main(
        ["--input", src2, "--output", out2, "--tokenize", "20",
         "--bpe-merges", os.path.join(out1, "merges")],
        spark=spark,
    )
    assert rc == 0
    res2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res2["trained"] is False and res2["merges"] == res["merges"]
    toks2 = spark.read.parquet(os.path.join(out2, "docs")).collect()[0].bpe_tokens
    # per-word encodings are position-independent: banana/bandana encode
    # the same as in the training corpus
    t1 = docs1[1].bpe_tokens  # "banana banana bandana"

    def split_words(tokens):
        words, cur = [], []
        for t in tokens:
            cur.append(t)
            if t.endswith("</w>"):
                words.append(tuple(cur))
                cur = []
        return words

    w1 = split_words(t1)
    w2 = split_words(toks2)
    assert w2 == [w1[2], w1[0]]  # bandana, banana


# --- argument validation -----------------------------------------------------

@pytest.mark.parametrize(
    "argv,msg",
    [
        (["--decon-ngrams", "8"], "--decon-ngrams/--decon-min-hits require"),
        (["--decontaminate", "x", "--decon-ngrams", "0"], "--decon-ngrams must be >= 1"),
        (["--ppl-target", "x"], "--ppl-target/--ppl-cuts require"),
        (["--ppl-filter", "head,bogus"], "comma list of head/middle/tail"),
        (["--ppl-filter", "head", "--ppl-cuts", "0.9,0.1"], "0 < LO < HI < 1"),
        (["--ppl-filter", "head", "--ppl-cuts", "nope"], "must be 'LO,HI' floats"),
        (["--tokenize", "0"], "--tokenize must be >= 1"),
        (["--bpe-merges", "x"], "--bpe-merges requires --tokenize"),
        (["--tokenize", "5", "--clean-text"], "one-shot curation pass"),
        (["--decontaminate", "x", "--ppl-filter", "head"], "one-shot curation pass"),
    ],
)
def test_cli_new_verb_arg_validation(spark, tmp_path, capsys, argv, msg):
    from fscrawler_spark.cli import main

    src = _docs_table(spark, tmp_path, [(0, "c0", 0, "x")])
    rc = main(["--input", src, "--output", str(tmp_path / "o")] + argv, spark=spark)
    assert rc == 2
    assert msg in capsys.readouterr().err


# --- fuzzy (near-duplicate) decontamination ----------------------------------


def _py_jaccard_shingles(a, b, k=3):
    def sh(t):
        w = " ".join(t.lower().split()).split(" ")
        if len(w) < k:
            return {" ".join(w)}
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_fuzzy_decontaminate_library(spark):
    from fscrawler_spark.functions.curation import fuzzy_decontaminate

    bench_text = "the quick brown fox jumps over the lazy dog every single morning"
    paraphrase = "the quick brown fox leaps over the lazy dog every single morning"
    unrelated = "a totally unrelated document about spark physical plans and shuffles"
    # the paraphrase's true shingle Jaccard sits between the two thresholds
    j = _py_jaccard_shingles(bench_text, paraphrase)
    assert 0.5 <= j < 0.9
    corpus = spark.createDataFrame(
        [(1, bench_text), (2, paraphrase), (3, unrelated), (4, None), (5, "")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        # the empty bench item must never 'contaminate' empty corpus
        # docs (word_shingles gives all blanks the same "" shingle)
        [(100, bench_text), (101, "")], "bench_id long, text string"
    )
    # threshold below j: exact copy AND paraphrase dropped
    kept = sorted(
        r.doc_id
        for r in fuzzy_decontaminate(corpus, bench, threshold=0.5).collect()
    )
    assert kept == [3, 4, 5]
    # threshold above j: only the exact copy dropped
    kept = sorted(
        r.doc_id
        for r in fuzzy_decontaminate(corpus, bench, threshold=0.9).collect()
    )
    assert kept == [2, 3, 4, 5]
    # empty benchmark: everything survives
    kept = sorted(
        r.doc_id
        for r in fuzzy_decontaminate(
            corpus, bench.filter("bench_id < 0"), threshold=0.5
        ).collect()
    )
    assert kept == [1, 2, 3, 4, 5]
    # string ids round-trip through the 'c:' namespace intact
    scorpus = corpus.selectExpr("concat('id-', doc_id) as doc_id", "text")
    kept_s = sorted(
        r.doc_id
        for r in fuzzy_decontaminate(scorpus, bench, threshold=0.5).collect()
    )
    assert kept_s == ["id-3", "id-4", "id-5"]


def test_fuzzy_decontaminate_validation_and_broadcast(spark):
    from fscrawler_spark.functions.curation import fuzzy_decontaminate

    corpus = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "a b c")], "bench_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        fuzzy_decontaminate(corpus, bench, threshold=0.0)
    with pytest.raises(ValueError, match="hash_family"):
        fuzzy_decontaminate(corpus, bench, hash_family="sha")
    # the flagged-id anti join must end up broadcast, never a
    # corpus-vs-corpus sort-merge. Round 6: verify_candidates
    # materializes the candidate stage eagerly (its broadcast of the
    # benchmark band table executes there), so the static plan of the
    # returned frame starts at an ExistingRDD with no size estimate —
    # execute and assert on the AQE FINAL plan, which is what actually
    # runs at scale
    out = fuzzy_decontaminate(corpus, bench, threshold=0.9)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan


def test_cli_decontaminate_fuzzy(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    bench_text = "the quick brown fox jumps over the lazy dog every single morning"
    paraphrase = "the quick brown fox leaps over the lazy dog every single morning"
    src = _docs_table(
        spark,
        tmp_path,
        [
            (0, "c0", 0, bench_text),
            (1, "c0", 1, paraphrase),
            (2, "c1", 0, "a totally unrelated document about spark physical plans"),
        ],
    )
    bench = _docs_table(spark, tmp_path, [(0, "b", 0, bench_text)], name="bench_f")
    out = str(tmp_path / "decon_fuzzy")
    rc = main(
        ["--input", src, "--output", out,
         "--decontaminate", bench, "--decon-fuzzy", "0.5"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["fuzzy_jaccard"] == 0.5
    assert res["total"] == 3 and res["kept"] == 1 and res["dropped"] == 2
    assert [r.doc_id for r in spark.read.parquet(out).collect()] == [2]


def test_cli_decon_fuzzy_validation(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(spark, tmp_path, [(0, "c0", 0, "x")])
    bench = _docs_table(spark, tmp_path, [(0, "b", 0, "x")], name="bench_v")
    out = str(tmp_path / "x")
    rc = main(["--input", src, "--output", out, "--decon-fuzzy", "0.5"], spark=spark)
    assert rc == 2 and "requires --decontaminate" in capsys.readouterr().err
    rc = main(
        ["--input", src, "--output", out,
         "--decontaminate", bench, "--decon-fuzzy", "1.5"],
        spark=spark,
    )
    assert rc == 2 and "must be in (0, 1]" in capsys.readouterr().err
    rc = main(
        ["--input", src, "--output", out, "--decontaminate", bench,
         "--decon-fuzzy", "0.5", "--decon-ngrams", "4"],
        spark=spark,
    )
    assert rc == 2 and "do not apply" in capsys.readouterr().err


# --- semantic (embedding-space) decontamination -------------------------------


def test_semantic_decontaminate_library(spark):
    import math

    import test_round4_fasthash_oracle as fh
    from fscrawler_spark.functions.curation import semantic_decontaminate

    bench_text = "the quick brown fox jumps over the lazy dog every single morning"
    paraphrase = "the quick brown fox leaps over the lazy dog every single morning"

    # independent expected cosine from the pure-Python embedding twin
    def emb(text, dim=256):
        v = [0.0] * dim
        for w in " ".join(text.lower().split()).split(" "):
            h = fh.xxh64(f"emb42:{w}".encode())
            v[h % dim] += 1.0 if (h >> 32) & 1 else -1.0
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    cos = sum(a * b for a, b in zip(emb(bench_text), emb(paraphrase)))
    assert 0.8 < cos < 0.99  # the two test thresholds bracket it
    corpus = spark.createDataFrame(
        [(1, bench_text), (2, paraphrase),
         (3, "a totally unrelated document about spark plans"), (4, None)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, bench_text)], "bench_id long, text string")
    kept = sorted(
        r.doc_id
        for r in semantic_decontaminate(corpus, bench, threshold=0.8).collect()
    )
    assert kept == [3, 4]
    kept = sorted(
        r.doc_id
        for r in semantic_decontaminate(corpus, bench, threshold=0.99).collect()
    )
    assert kept == [2, 3, 4]


def test_reference_max_sim_shape_and_bounds(spark):
    from fscrawler_spark.functions.embeddings import (
        reference_max_sim,
        text_embeddings,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"), (3, None)],
        "doc_id long, text string",
    )
    vecs = text_embeddings(docs, dim=32)
    sims = reference_max_sim(vecs, vecs)  # self-reference: non-zero rows hit 1.0
    got = {r.id: r.ref_max_sim for r in sims.collect()}
    assert got[1] == pytest.approx(1.0, abs=1e-9)
    assert got[2] == pytest.approx(1.0, abs=1e-9)
    assert got[3] == 0.0  # zero vector matches nothing
    # pure map: no join, no key shuffle anywhere in the plan
    plan = sims._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "hashpartitioning" not in plan
    # bounded reference: loud refusal, never a silent broadcast OOM
    with pytest.raises(ValueError, match="max_reference"):
        reference_max_sim(vecs, vecs, max_reference=1)


def test_cli_decontaminate_semantic(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    bench_text = "the quick brown fox jumps over the lazy dog every single morning"
    paraphrase = "the quick brown fox leaps over the lazy dog every single morning"
    src = _docs_table(
        spark,
        tmp_path,
        [
            (0, "c0", 0, bench_text),
            (1, "c0", 1, paraphrase),
            (2, "c1", 0, "a totally unrelated document about spark physical plans"),
        ],
    )
    bench = _docs_table(spark, tmp_path, [(0, "b", 0, bench_text)], name="bench_s")
    out = str(tmp_path / "decon_sem")
    rc = main(
        ["--input", src, "--output", out,
         "--decontaminate", bench, "--decon-semantic", "0.8"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["semantic_cosine"] == 0.8 and res["dim"] == 256
    assert res["total"] == 3 and res["kept"] == 1
    assert [r.doc_id for r in spark.read.parquet(out).collect()] == [2]
    # validation: semantic excludes fuzzy + n-gram knobs; dim gated
    rc = main(
        ["--input", src, "--output", out, "--decontaminate", bench,
         "--decon-semantic", "0.8", "--decon-fuzzy", "0.5"],
        spark=spark,
    )
    assert rc == 2 and "do not apply" in capsys.readouterr().err
    rc = main(
        ["--input", src, "--output", out, "--decon-dim", "64"],
        spark=spark,
    )
    assert rc == 2 and "requires --decon-semantic" in capsys.readouterr().err


def test_fuzzy_decontaminate_review_fixes(spark):
    from fscrawler_spark.functions.curation import fuzzy_decontaminate

    # tab/newline-only docs must NOT contaminate each other (F.trim
    # strips 0x20 only; the blank filter uses the ASCII-\s class)
    corpus = spark.createDataFrame(
        [(1, "\t"), (2, "\n\n"), (3, "real words here forming a doc")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "\n"), (10, " \t ")], "bench_id long, text string"
    )
    kept = sorted(
        r.doc_id for r in fuzzy_decontaminate(corpus, bench, threshold=0.5).collect()
    )
    assert kept == [1, 2, 3]

    # shingle_k forwards to the SIGNATURE stage too: these two docs
    # share every unigram (k=1 Jaccard 1.0) but almost no 3-shingles
    # (opposite word order), so k=1 must flag what k=3 cannot band
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b_rev = " ".join(reversed(a.split()))
    corpus2 = spark.createDataFrame([(1, b_rev)], "doc_id long, text string")
    bench2 = spark.createDataFrame([(9, a)], "bench_id long, text string")
    kept = [
        r.doc_id
        for r in fuzzy_decontaminate(
            corpus2, bench2, threshold=0.9, shingle_k=1
        ).collect()
    ]
    assert kept == []  # unigram-identical -> dropped
    kept = [
        r.doc_id
        for r in fuzzy_decontaminate(
            corpus2, bench2, threshold=0.9, shingle_k=3
        ).collect()
    ]
    assert kept == [1]  # trigram similarity is ~0 -> survives

    # uncapped by default: 50 identical copies of the bench item all
    # drop (a max_bucket cap would silently keep the overflow)
    many = spark.createDataFrame(
        [(i, a) for i in range(50)] + [(99, "an unrelated document about engines")],
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id for r in fuzzy_decontaminate(many, bench2, threshold=0.9).collect()
    )
    assert kept == [99]


def test_semantic_decontaminate_threshold_one_and_hardening(spark):
    import pyspark.sql.functions as F

    from fscrawler_spark.functions.curation import semantic_decontaminate
    from fscrawler_spark.functions.embeddings import (
        reference_max_sim,
        text_embeddings,
    )

    text = "the quick brown fox jumps over the lazy dog"
    corpus = spark.createDataFrame(
        [(1, text), (2, "something else entirely different")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, text)], "bench_id long, text string")
    # threshold=1.0 must still drop the VERBATIM copy despite float32
    kept = sorted(
        r.doc_id
        for r in semantic_decontaminate(corpus, bench, threshold=1.0).collect()
    )
    assert kept == [2]

    # NULL embedding rows (failed external encoder) score 0.0, not crash
    vecs = text_embeddings(corpus, dim=16)
    with_null = vecs.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 2, F.lit(None).cast("array<float>")).otherwise(
            F.col("embedding")
        ),
    )
    got = {r.id: r.ref_max_sim for r in reference_max_sim(with_null, vecs).collect()}
    assert got[2] == 0.0 and got[1] == pytest.approx(1.0, abs=1e-9)

    # dim mismatch fails loudly, not as a numpy reshape traceback
    bad = vecs.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 2, F.array(F.lit(1.0), F.lit(0.0))).otherwise(
            F.col("embedding")
        ),
    )
    with pytest.raises(Exception, match="dim mismatch"):
        reference_max_sim(bad, vecs).collect()
    # mixed-dimension REFERENCE rejected at collect time
    with pytest.raises(ValueError, match="mixed dimensions"):
        reference_max_sim(vecs, bad)
