"""Round 4+: the --clean-text and --dedup-spans one-shot CLI verbs
(cli.py), driven through main() like test_round4_linededup's
--dedup-lines tests, with expectations computed independently of the
modules under test (codec-level corruption, plain string slicing).
"""

import json
import os

import pytest

SHARED = "this paragraph repeats verbatim across both of the documents here"
MOJI = "café résumé".encode("utf-8").decode("cp1252")  # mojibake text


def _docs_table(spark, tmp_path, rows):
    p = str(tmp_path / "docs_in")
    spark.createDataFrame(
        rows, "doc_id long, conv_id string, turn_idx int, extracted string"
    ).write.parquet(os.path.join(p, "docs"))
    return p


def test_cli_clean_text(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(
        spark,
        tmp_path,
        [
            (0, "c0", 0, "plain ascii with bell\x07"),
            (1, "c0", 1, MOJI),
            (2, "c1", 0, None),
        ],
    )
    out = str(tmp_path / "cleaned")
    rc = main(["--input", src, "--output", out, "--clean-text"], spark=spark)
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["docs"] == 3
    assert res["mojibake_before"] > 0 and res["mojibake_after"] == 0
    by_id = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert by_id[0].extracted == "plain ascii with bell"
    assert by_id[1].extracted == "café résumé"
    assert by_id[2].extracted is None
    assert by_id[1].moji_before > 0  # audit column preserved


def test_cli_dedup_spans(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    pre0, post0 = "unique preamble zero then ", " and unique tail zero"
    pre1 = "different one lead-in text "
    src = _docs_table(
        spark,
        tmp_path,
        [
            (0, "c0", 0, pre0 + SHARED + post0),
            (1, "c0", 1, pre1 + SHARED),
            (2, "c1", 0, "no duplication in this one at all"),
            (3, "c1", 1, None),
        ],
    )
    out = str(tmp_path / "deduped")
    rc = main(["--input", src, "--output", out, "--dedup-spans", "30"], spark=spark)
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the maximal duplicated span includes the shared leading space
    assert res["docs"] == 4 and res["chars_removed"] == 2 * (len(SHARED) + 1)
    by_id = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert by_id[0].extracted == pre0[:-1] + post0
    assert by_id[1].extracted == pre1[:-1]
    assert by_id[2].extracted == "no duplication in this one at all"
    assert by_id[3].extracted is None


def test_cli_curation_verbs_conflict(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(spark, tmp_path, [(0, "c0", 0, "x")])
    out = str(tmp_path / "x")
    # two curation verbs together
    assert (
        main(
            ["--input", src, "--output", out, "--clean-text", "--dedup-spans", "30"],
            spark=spark,
        )
        == 2
    )
    # curation verb + pipeline mode
    assert (
        main(
            ["--input", src, "--output", out, "--dedup-spans", "30", "--incremental"],
            spark=spark,
        )
        == 2
    )
    # bad min length
    assert main(["--input", src, "--output", out, "--dedup-spans", "1"], spark=spark) == 2
    # not a docs table -> clean exit 2, no traceback
    bad = str(tmp_path / "notdocs")
    spark.range(3).write.parquet(bad)
    assert main(["--input", bad, "--output", out, "--clean-text"], spark=spark) == 2
    err = capsys.readouterr().err
    assert "error:" in err and "Traceback" not in err


# --- --mix / --mix-budget composition verbs ---------------------------------


def _mix_docs(spark, tmp_path):
    rows = [
        (i, f"c{i % 5}", i // 5, "word " * (5 + i % 3), ["web", "code"][i % 2])
        for i in range(60)
    ]
    p = str(tmp_path / "mix_in")
    spark.createDataFrame(
        rows, "doc_id long, conv_id string, turn_idx int, extracted string, src string"
    ).write.parquet(os.path.join(p, "docs"))
    return p


def test_cli_mix_rates(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _mix_docs(spark, tmp_path)
    out = str(tmp_path / "mixed")
    rc = main(
        ["--input", src, "--output", out, "--mix", "web=2.0,code=0.5",
         "--mix-group", "src"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rates"] == {"web": 2.0, "code": 0.5}
    # web rows doubled exactly (integer rate); code roughly halved
    assert res["rows_by_group"]["web"] == 60
    assert 5 <= res["rows_by_group"]["code"] <= 25
    written = spark.read.parquet(out)
    assert "epoch" in written.columns
    assert written.filter("src = 'web' and epoch = 1").count() == 30


def test_cli_mix_budget(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main
    from pyspark.sql import functions as F

    src = _mix_docs(spark, tmp_path)
    out = str(tmp_path / "budgeted")
    rc = main(
        ["--input", src, "--output", out, "--mix-budget", "60",
         "--mix-group", "src"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(res["rates"]) == {"web", "code"} and all(
        0 < r < 1 for r in res["rates"].values()
    )
    written = spark.read.parquet(out)
    assert "_tok" not in written.columns  # internal column dropped
    # achieved tokens land near the quota for both groups
    from fscrawler_spark.functions.text_analysis import token_count

    ach = {
        r["src"]: r["t"]
        for r in written.groupBy("src")
        .agg(F.sum(token_count(F.col("extracted"))).alias("t"))
        .collect()
    }
    for g in ("web", "code"):
        assert 30 <= ach.get(g, 0) <= 90  # 60 +/- one max-weight row band


def test_cli_mix_errors(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _mix_docs(spark, tmp_path)
    out = str(tmp_path / "x2")
    # malformed rates list
    assert main(["--input", src, "--output", out, "--mix", "web:2.0"], spark=spark) == 2
    # both mix verbs together
    assert (
        main(
            ["--input", src, "--output", out, "--mix", "web=2.0",
             "--mix-budget", "10"],
            spark=spark,
        )
        == 2
    )
    # unknown group column
    assert (
        main(
            ["--input", src, "--output", out, "--mix", "web=2.0",
             "--mix-group", "nope"],
            spark=spark,
        )
        == 2
    )
    # sub-resolution rate -> clean exit 2 from mixing's loud ValueError
    assert main(["--input", src, "--output", out, "--mix", "web=1e-9"], spark=spark) == 2
    err = capsys.readouterr().err
    assert "error:" in err and "Traceback" not in err


def test_cli_chunk(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    long_doc = " ".join(f"t{j}" for j in range(10))
    src = _docs_table(
        spark,
        tmp_path,
        [
            (0, "c0", 0, long_doc),          # 10 tokens -> 3 chunks of <=4
            (1, "c0", 1, "short doc"),        # 2 tokens  -> 1 chunk
            (2, "c1", 0, None),               # null      -> 0 chunks
        ],
    )
    out = str(tmp_path / "chunked")
    rc = main(["--input", src, "--output", out, "--chunk", "4"], spark=spark)
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res == {
        "chunk": 4, "stride": 4, "docs": 2, "chunks": 4,
        "max_chunk_tokens": 4, "output": out,
    }
    rows = sorted(
        (r.doc_id, r.chunk_idx, r.tok_start, r.extracted)
        for r in spark.read.parquet(out).collect()
    )
    assert rows == [
        (0, 0, 1, "t0 t1 t2 t3"),
        (0, 1, 5, "t4 t5 t6 t7"),
        (0, 2, 9, "t8 t9"),
        (1, 0, 1, "short doc"),
    ]
    # original metadata re-attached on every chunk row
    assert {r.conv_id for r in spark.read.parquet(out).collect()} == {"c0"}


def test_cli_chunk_validation(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(spark, tmp_path, [(0, "c0", 0, "a b c")])
    out = str(tmp_path / "nope")
    assert main(["--input", src, "--output", out, "--chunk", "0"], spark=spark) == 2
    assert (
        main(["--input", src, "--output", out, "--chunk-stride", "2"], spark=spark) == 2
    )
    assert (
        main(
            ["--input", src, "--output", out, "--chunk", "4", "--chunk-stride", "9"],
            spark=spark,
        )
        == 2
    )
    # a curation verb cannot combine with another
    assert (
        main(
            ["--input", src, "--output", out, "--chunk", "4", "--clean-text"],
            spark=spark,
        )
        == 2
    )


# --- round-4 DSIR / SemDeDup one-shot verbs ----------------------------------


def test_cli_dsir_select(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    raw = _docs_table(
        spark,
        tmp_path,
        [
            (0, "c0", 0, "the cat sat on the mat by the door"),
            (1, "c0", 1, "stock market prices and bond yields rose"),
            (2, "c1", 0, "a recipe for chocolate cake and tea"),
            (3, "c1", 1, "quarterly earnings beat market expectations"),
            (4, "c2", 0, "the dog chased the cat around the yard"),
        ],
    )
    tgt_root = str(tmp_path / "target_root")
    spark.createDataFrame(
        [
            (100, "t0", 0, "stock market volatility and bond yields"),
            (101, "t0", 1, "market earnings expectations this quarter"),
        ],
        "doc_id long, conv_id string, turn_idx int, extracted string",
    ).write.parquet(os.path.join(tgt_root, "docs"))
    out = str(tmp_path / "dsir_out")
    rc = main(
        ["--input", raw, "--output", out, "--dsir-select", "2",
         "--dsir-target", tgt_root],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["selected"] == 2
    rows = spark.read.parquet(out).collect()
    # the finance docs must be the ones selected, full original row +
    # log_weight/sample_key audit columns attached
    assert sorted(r.doc_id for r in rows) == [1, 3]
    assert all(r.log_weight is not None and r.sample_key is not None for r in rows)
    assert {r.conv_id for r in rows} == {"c0", "c1"}  # metadata survived


def test_cli_dsir_select_validation(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(spark, tmp_path, [(0, "c0", 0, "words here")])
    out = str(tmp_path / "nope")
    assert main(["--input", src, "--output", out, "--dsir-select", "2"],
                spark=spark) == 2
    assert "--dsir-target" in capsys.readouterr().err
    assert main(["--input", src, "--output", out, "--dsir-target", src],
                spark=spark) == 2
    assert "--dsir-select" in capsys.readouterr().err
    assert main(["--input", src, "--output", out, "--dsir-select", "0",
                 "--dsir-target", src], spark=spark) == 2
    assert ">= 1" in capsys.readouterr().err


def test_cli_semantic_dedup(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    # 3 vectors: 1 and 2 identical, 3 orthogonal
    vecs = str(tmp_path / "vecs.parquet")
    spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    ).write.parquet(vecs)
    out = str(tmp_path / "sem_out")
    rc = main(
        ["--input", vecs, "--output", out, "--semantic-dedup", "0.99",
         "--semantic-cells", "16"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["clustered_vectors"] == 2 and res["clusters"] == 1
    rows = {r.id: (r.cluster_id, r.is_keeper) for r in spark.read.parquet(out).collect()}
    assert rows == {1: (1, True), 2: (1, False)}


def test_cli_semantic_dedup_validation(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(spark, tmp_path, [(0, "c0", 0, "not an embeddings table")])
    out = str(tmp_path / "nope2")
    assert main(["--input", src, "--output", out, "--semantic-dedup", "1.5"],
                spark=spark) == 2
    assert "(0, 1]" in capsys.readouterr().err
    assert main(["--input", src, "--output", out, "--semantic-cells", "4"],
                spark=spark) == 2
    assert "--semantic-dedup" in capsys.readouterr().err
    # docs table is not an embeddings table: clean exit 2, not a traceback
    assert main(["--input", os.path.join(src, "docs"), "--output", out,
                 "--semantic-dedup", "0.9"], spark=spark) == 2
    assert "vec_id" in capsys.readouterr().err
    # one-shot exclusivity with another curation verb
    assert main(["--input", src, "--output", out, "--semantic-dedup", "0.9",
                 "--clean-text"], spark=spark) == 2
    assert "cannot combine" in capsys.readouterr().err
    assert main(["--input", src, "--output", out, "--semantic-dedup", "0.9",
                 "--semantic-cells", "0"], spark=spark) == 2
    assert ">= 1" in capsys.readouterr().err


def test_cli_semantic_dedup_empty_table(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    vecs = str(tmp_path / "empty_vecs.parquet")
    spark.createDataFrame([], "vec_id long, embedding array<double>").write.parquet(vecs)
    out = str(tmp_path / "sem_empty_out")
    rc = main(["--input", vecs, "--output", out, "--semantic-dedup", "0.9"],
              spark=spark)
    assert rc == 2
    assert "is empty" in capsys.readouterr().err


def _turn_table(spark, tmp_path):
    p = str(tmp_path / "docs_in")
    spark.createDataFrame(
        [
            (0, "c0", 0, "user", "ask zero"),
            (1, "c0", 1, "assistant", "answer zero"),
            (2, "c0", 2, "user", "ask one"),
            (3, "c0", 3, "assistant", "answer one"),
            (4, "c1", 0, "assistant", "contextless"),
        ],
        "doc_id long, conv_id string, turn_idx int, role string, extracted string",
    ).write.parquet(os.path.join(p, "docs"))
    return p


def test_cli_assemble(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _turn_table(spark, tmp_path)
    out = str(tmp_path / "assembled")
    rc = main(["--input", src, "--output", out, "--assemble"], spark=spark)
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["conversations"] == 2 and res["turns_kept"] == 5
    by_conv = {r.conv_id: r for r in spark.read.parquet(out).collect()}
    assert by_conv["c0"].doc == (
        "<|user|>\nask zero\n<|assistant|>\nanswer zero\n"
        "<|user|>\nask one\n<|assistant|>\nanswer one"
    )
    assert by_conv["c1"].n_turns == 1

    # max-turns bound
    out2 = str(tmp_path / "assembled2")
    rc = main(
        ["--input", src, "--output", out2, "--assemble", "--assemble-max-turns", "2"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["turns_kept"] == 3  # 2 from c0, 1 from c1


def test_cli_sft_pairs(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _turn_table(spark, tmp_path)
    out = str(tmp_path / "sft")
    rc = main(
        ["--input", src, "--output", out, "--sft-pairs", "--sft-context", "2"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["examples"] == 2 and res["conversations"] == 1
    rows = {
        (r.conv_id, r.turn_idx): r for r in spark.read.parquet(out).collect()
    }
    assert rows[("c0", 1)].prompt == "<|user|>\nask zero"
    assert rows[("c0", 3)].prompt == "<|assistant|>\nanswer zero\n<|user|>\nask one"
    assert rows[("c0", 3)].response == "answer one"
    assert ("c1", 0) not in rows  # contextless assistant turn dropped


def test_cli_assembly_validation(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _turn_table(spark, tmp_path)
    out = str(tmp_path / "nope")
    assert main(["--input", src, "--output", out, "--assemble-max-turns", "3"],
                spark=spark) == 2
    assert main(["--input", src, "--output", out, "--sft-pairs", "--sft-context", "0"],
                spark=spark) == 2
    # SFT knobs without --sft-pairs are rejected, not silently ignored
    assert main(["--input", src, "--output", out, "--assemble", "--sft-context", "4"],
                spark=spark) == 2
    assert main(["--input", src, "--output", out, "--assemble", "--sft-role", "user"],
                spark=spark) == 2
    assert main(["--input", src, "--output", out, "--assemble", "--sft-pairs"],
                spark=spark) == 2
    # docs table without the turn columns is refused with a clear message
    bare = str(tmp_path / "bare")
    spark.createDataFrame(
        [(0, "x")], "doc_id long, extracted string"
    ).write.parquet(os.path.join(bare, "docs"))
    assert main(["--input", bare, "--output", out, "--assemble"], spark=spark) == 2
    assert "conv_id/turn_idx/role" in capsys.readouterr().err


def test_cli_quality_filter(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    def table(name, rows):
        p = str(tmp_path / name)
        spark.createDataFrame(
            rows, "doc_id long, conv_id string, turn_idx int, extracted string"
        ).write.parquet(os.path.join(p, "docs"))
        return p

    pos = table("pos", [
        (0, "p", 0, "clear reference documentation about the extraction plan"),
        (1, "p", 1, "well formed sentences describing spark partitioning"),
    ])
    neg = table("neg", [
        (10, "n", 0, "zzz qqq click here buy now zzz"),
        (11, "n", 1, "qqq zzz buy click xxx"),
    ])
    corpus = table("corpus", [
        (100, "c", 0, "reference documentation about spark partitioning"),
        (101, "c", 1, "click here buy now qqq zzz"),
    ])
    out = str(tmp_path / "kept")
    rc = main(
        ["--input", corpus, "--output", out, "--quality-filter", "0.0",
         "--quality-pos", pos, "--quality-neg", neg],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["total"] == 2 and res["kept"] == 1
    kept = spark.read.parquet(out).collect()
    assert [r.doc_id for r in kept] == [100]
    assert kept[0].log_odds > 0.0  # audit column rides the kept rows

    # seeds flags are coupled to the verb in both directions
    assert main(["--input", corpus, "--output", out, "--quality-filter", "0.0"],
                spark=spark) == 2
    assert main(["--input", corpus, "--output", out, "--quality-pos", pos],
                spark=spark) == 2
    err = capsys.readouterr().err
    assert "--quality-pos AND --quality-neg" in err and "require --quality-filter" in err


def test_cli_quality_filter_refilter_own_output(spark, tmp_path, capsys):
    """Feeding a quality-filter output back with a higher threshold must
    work (stale log_odds dropped), not crash with COLUMN_ALREADY_EXISTS."""
    from fscrawler_spark.cli import main

    def table(name, rows):
        p = str(tmp_path / name)
        spark.createDataFrame(
            rows, "doc_id long, conv_id string, turn_idx int, extracted string"
        ).write.parquet(os.path.join(p, "docs"))
        return p

    pos = table("pos2", [(0, "p", 0, "clear documentation text about spark plans")])
    neg = table("neg2", [(10, "n", 0, "zzz qqq click buy zzz qqq")])
    corpus = table("corpus2", [
        (100, "c", 0, "documentation text about spark"),
        (101, "c", 1, "click buy zzz qqq"),
    ])
    out1 = str(tmp_path / "pass1")
    assert main(["--input", corpus, "--output", out1, "--quality-filter", "0.0",
                 "--quality-pos", pos, "--quality-neg", neg], spark=spark) == 0
    out2 = str(tmp_path / "pass2")
    rc = main(["--input", out1, "--output", out2, "--quality-filter", "1.0",
               "--quality-pos", pos, "--quality-neg", neg], spark=spark)
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["kept"] <= res["total"]
    cols = spark.read.parquet(out2).columns
    assert cols.count("log_odds") == 1


def test_quality_filter_blank_seed_set_rejected(spark, tmp_path, capsys):
    """Whitespace-only seed text must fail the seed guard (the gram
    pipeline would train a zero-mass side), with a clean CLI exit 2."""
    from fscrawler_spark.cli import main

    def table(name, rows):
        p = str(tmp_path / name)
        spark.createDataFrame(
            rows, "doc_id long, conv_id string, turn_idx int, extracted string"
        ).write.parquet(os.path.join(p, "docs"))
        return p

    pos = table("posb", [(0, "p", 0, "   "), (1, "p", 1, None)])
    neg = table("negb", [(10, "n", 0, "zzz qqq")])
    corpus = table("corpusb", [(100, "c", 0, "anything")])
    out = str(tmp_path / "nokeep")
    rc = main(["--input", corpus, "--output", out, "--quality-filter", "0.0",
               "--quality-pos", pos, "--quality-neg", neg], spark=spark)
    assert rc == 2
    err = capsys.readouterr().err
    assert "non-blank text" in err and "Traceback" not in err


def test_cli_dsir_reselect_own_output(spark, tmp_path, capsys):
    """Same re-feed contract for --dsir-select: its log_weight/sample_key
    audit columns must not collide on a second pass."""
    from fscrawler_spark.cli import main

    rows = [(i, f"c{i % 3}", i // 3, f"some words number {i} " + "filler " * (i % 4))
            for i in range(30)]
    src = str(tmp_path / "dsir_in")
    spark.createDataFrame(
        rows, "doc_id long, conv_id string, turn_idx int, extracted string"
    ).write.parquet(os.path.join(src, "docs"))
    target = str(tmp_path / "dsir_t")
    spark.createDataFrame(
        rows[:5], "doc_id long, conv_id string, turn_idx int, extracted string"
    ).write.parquet(os.path.join(target, "docs"))
    out1 = str(tmp_path / "sel1")
    assert main(["--input", src, "--output", out1, "--dsir-select", "10",
                 "--dsir-target", target], spark=spark) == 0
    out2 = str(tmp_path / "sel2")
    rc = main(["--input", out1, "--output", out2, "--dsir-select", "5",
               "--dsir-target", target], spark=spark)
    assert rc == 0
    cols = spark.read.parquet(out2).columns
    assert cols.count("log_weight") == 1 and cols.count("sample_key") == 1


def test_cli_assemble_tools(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    p = str(tmp_path / "tool_docs")
    spark.createDataFrame(
        [
            (0, "c0", 0, "user", "find it", None),
            (1, "c0", 1, "assistant", "searching", "search"),
        ],
        "doc_id long, conv_id string, turn_idx int, role string, "
        "extracted string, tool string",
    ).write.parquet(os.path.join(p, "docs"))
    out = str(tmp_path / "asm_tools")
    rc = main(["--input", p, "--output", out, "--assemble", "--assemble-tools"],
              spark=spark)
    assert rc == 0
    doc = spark.read.parquet(out).collect()[0]["doc"]
    assert "<|assistant tool=search|>" in doc
    # flag without any assembly verb is rejected
    assert main(["--input", p, "--output", out, "--assemble-tools"], spark=spark) == 2
    # docs table without a tool column is a clean error
    bare = str(tmp_path / "bare_docs")
    spark.createDataFrame(
        [(0, "c0", 0, "user", "x")],
        "doc_id long, conv_id string, turn_idx int, role string, extracted string",
    ).write.parquet(os.path.join(bare, "docs"))
    assert main(["--input", bare, "--output", out, "--assemble",
                 "--assemble-tools"], spark=spark) == 2
    assert "tool column" in capsys.readouterr().err


GOOD_PAGE = "\n".join(
    [
        "The first sentence of this page is long enough to keep easily.",
        "The second sentence also carries enough words to be retained.",
        "The third sentence closes out the minimum page requirement now.",
    ]
)

GOPHER_GOOD = (
    "the quick brown fox jumps over a lazy dog and then it runs to "
    "the river for water because it is thirsty after that long chase "
    "in the warm sun while birds sing simple songs about summer days "
    "that pass slowly in the quiet field near an old farm house there"
)


def test_cli_c4_filter(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(
        spark,
        tmp_path,
        [
            (0, "c0", 0, GOOD_PAGE + "\nshort line."),  # kept, 1 line removed
            (1, "c0", 1, GOOD_PAGE + "\nA brace {x} hides in this kept sentence."),
            (2, "c1", 0, "One lone sentence is not enough to pass the gate."),
        ],
    )
    out = str(tmp_path / "c4")
    rc = main(["--input", src, "--output", out, "--c4-filter"], spark=spark)
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["total"] == 3 and res["kept"] == 1
    assert res["dropped_by_reason"] == {
        "has_curly_brace": 1,
        "too_few_sentences": 1,
    }
    by_id = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert set(by_id) == {0}
    assert by_id[0].extracted == GOOD_PAGE  # short line cleaned away
    assert by_id[0].c4_lines_removed == 1
    assert res["lines_removed_in_kept"] == 1

    # re-filter own output: stale audit column dropped, result idempotent
    out2 = str(tmp_path / "c4_again")
    rc = main(["--input", out, "--output", out2, "--c4-filter"], spark=spark)
    assert rc == 0
    res2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res2["kept"] == 1 and res2["lines_removed_in_kept"] == 0


def test_cli_c4_filter_min_sentences_knob(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(
        spark, tmp_path,
        [(0, "c0", 0, "One lone sentence is not enough by default here.")],
    )
    out = str(tmp_path / "c4_knob")
    rc = main(
        ["--input", src, "--output", out, "--c4-filter", "--c4-min-sentences", "1"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["kept"] == 1

    # knob without the verb is a usage error
    rc = main(
        ["--input", src, "--output", out, "--c4-min-sentences", "1"], spark=spark
    )
    assert rc == 2
    assert "--c4-min-sentences requires --c4-filter" in capsys.readouterr().err


def test_cli_gopher_filter(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(
        spark,
        tmp_path,
        [
            (0, "c0", 0, GOPHER_GOOD),
            (1, "c0", 1, "too short"),
            (2, "c1", 0, None),
        ],
    )
    out = str(tmp_path / "gopher")
    rc = main(["--input", src, "--output", out, "--gopher-filter"], spark=spark)
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["total"] == 3 and res["kept"] == 1
    assert res["dropped_by_reason"]["too_few_words"] == 1
    assert res["dropped_by_reason"]["null_text"] == 1
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0].extracted == GOPHER_GOOD  # text unchanged


def test_cli_c4_gopher_exclusive(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(spark, tmp_path, [(0, "c0", 0, GOOD_PAGE)])
    rc = main(
        ["--input", src, "--output", str(tmp_path / "x"),
         "--c4-filter", "--gopher-filter"],
        spark=spark,
    )
    assert rc == 2
    assert "one-shot curation pass" in capsys.readouterr().err


# --- --embed (deterministic hashed-feature text embeddings) -----------------


def test_cli_embed_and_semantic_dedup_chain(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(
        spark,
        tmp_path,
        [
            (0, "c0", 0, "the cat sat on the mat"),
            (1, "c0", 1, "the cat sat on the mat"),  # planted exact dup
            (2, "c1", 0, "a completely different sentence about spark"),
            (3, "c1", 1, None),
        ],
    )
    vecs = str(tmp_path / "vecs")
    rc = main(["--input", src, "--output", vecs, "--embed", "64"], spark=spark)
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res == {
        "embed": 64, "ngrams": 1, "docs": 4, "distinct_vec_ids": 4,
        "nonzero_vectors": 3, "output": vecs,
    }
    rows = {r.vec_id: r for r in spark.read.parquet(vecs).collect()}
    # integer doc_ids pass through as vec_id (no surrogate column)
    assert set(rows) == {0, 1, 2, 3}
    assert "doc_id" not in spark.read.parquet(vecs).columns
    assert rows[0].embedding == rows[1].embedding
    assert all(x == 0.0 for x in rows[3].embedding)  # NULL text -> zero vector
    norm = sum(x * x for x in rows[0].embedding)
    assert norm == pytest.approx(1.0, abs=1e-6)

    # the output IS an embeddings table: --semantic-dedup consumes it
    sem = str(tmp_path / "sem")
    rc = main(
        ["--input", vecs, "--output", sem, "--semantic-dedup", "0.99"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["clustered_vectors"] == 2 and res["clusters"] == 1
    got = {r.id: (r.cluster_id, r.is_keeper) for r in spark.read.parquet(sem).collect()}
    assert got == {0: (0, True), 1: (0, False)}


def test_cli_embed_string_ids_get_int_surrogates(spark, tmp_path, capsys):
    import os as _os

    from fscrawler_spark.cli import main

    p = str(tmp_path / "docs_str")
    spark.createDataFrame(
        [("doc-a", "some plain text here"), ("doc-b", "other plain text there")],
        "doc_id string, extracted string",
    ).write.parquet(_os.path.join(p, "docs"))
    vecs = str(tmp_path / "vecs_str")
    rc = main(["--input", p, "--output", vecs, "--embed", "16"], spark=spark)
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["docs"] == 2 and res["distinct_vec_ids"] == 2
    out = spark.read.parquet(vecs)
    assert dict(out.dtypes)["vec_id"] == "bigint"  # centroid-path-compatible
    by_doc = {r.doc_id: r.vec_id for r in out.collect()}  # mapping preserved
    assert set(by_doc) == {"doc-a", "doc-b"}
    assert len(set(by_doc.values())) == 2


def test_cli_embed_validation(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(spark, tmp_path, [(0, "c0", 0, "text")])
    out = str(tmp_path / "x")
    rc = main(["--input", src, "--output", out, "--embed", "0"], spark=spark)
    assert rc == 2 and "--embed DIM" in capsys.readouterr().err
    rc = main(["--input", src, "--output", out, "--embed-ngrams", "2"], spark=spark)
    assert rc == 2 and "requires --embed" in capsys.readouterr().err
    rc = main(
        ["--input", src, "--output", out, "--embed", "8", "--chunk", "32"],
        spark=spark,
    )
    assert rc == 2 and "one-shot curation pass" in capsys.readouterr().err


# --- --redact-pii ------------------------------------------------------------


def test_cli_redact_pii(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(
        spark,
        tmp_path,
        [
            (0, "c0", 0, "mail me at jane.doe@example.com or call 555-123-4567 now"),
            (1, "c0", 1, "server at 10.0.0.1 and ssn 123-45-6789"),
            (2, "c1", 0, "nothing sensitive in here"),
            (3, "c1", 1, None),
        ],
    )
    out = str(tmp_path / "redacted")
    rc = main(["--input", src, "--output", out, "--redact-pii"], spark=spark)
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["docs"] == 4
    assert res["found"] == {"email": 1, "phone": 1, "ssn": 1, "ipv4": 1}
    assert res["kinds_redacted"] == ["email", "ipv4", "phone", "ssn"]
    by_id = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert by_id[0].extracted == "mail me at <EMAIL> or call <PHONE> now"
    assert by_id[1].extracted == "server at <IP> and ssn <SSN>"
    assert by_id[2].extracted == "nothing sensitive in here"
    assert by_id[3].extracted is None
    # audit column reflects the PRE-redaction text
    assert by_id[0].pii_found["email"] == 1 and by_id[0].pii_found["phone"] == 1
    assert by_id[2].pii_found["email"] == 0


def test_cli_redact_pii_kinds_subset(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(
        spark,
        tmp_path,
        [(0, "c0", 0, "jane.doe@example.com from 10.0.0.1")],
    )
    out = str(tmp_path / "redacted2")
    rc = main(
        ["--input", src, "--output", out, "--redact-pii", "--pii-kinds", "email"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["kinds_redacted"] == ["email"]
    assert res["found"] == {"email": 1, "phone": 0, "ssn": 0, "ipv4": 1}
    row = spark.read.parquet(out).collect()[0]
    # only email redacted; the ip stays but is still COUNTED in the audit
    assert row.extracted == "<EMAIL> from 10.0.0.1"
    assert row.pii_found["ipv4"] == 1


def test_cli_redact_pii_validation(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = _docs_table(spark, tmp_path, [(0, "c0", 0, "text")])
    out = str(tmp_path / "x")
    rc = main(["--input", src, "--output", out, "--pii-kinds", "email"], spark=spark)
    assert rc == 2 and "requires --redact-pii" in capsys.readouterr().err
    rc = main(
        ["--input", src, "--output", out, "--redact-pii", "--pii-kinds", "email,creditcard"],
        spark=spark,
    )
    assert rc == 2 and "unknown --pii-kinds" in capsys.readouterr().err
    rc = main(
        ["--input", src, "--output", out, "--redact-pii", "--clean-text"],
        spark=spark,
    )
    assert rc == 2 and "one-shot curation pass" in capsys.readouterr().err


# --- --assemble-spans ---------------------------------------------------------


def test_cli_assemble_spans(spark, tmp_path, capsys):
    import os as _os

    from pyspark.sql import functions as F

    from fscrawler_spark.cli import main

    p = str(tmp_path / "docs_asm")
    spark.createDataFrame(
        [
            ("c1", 0, "user", "hello"),
            ("c1", 1, "assistant", "hi there"),
            ("c2", 0, "assistant", "solo answer"),
        ],
        "conv_id string, turn_idx int, role string, extracted string",
    ).withColumn("doc_id", F.concat_ws(":", "conv_id", "turn_idx")).write.parquet(
        _os.path.join(p, "docs")
    )
    out = str(tmp_path / "asm_spans")
    rc = main(
        ["--input", p, "--output", out, "--assemble",
         "--assemble-spans", "assistant"],
        spark=spark,
    )
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["spans_role"] == "assistant" and res["train_spans"] == 2
    rows = {r.conv_id: r for r in spark.read.parquet(out).collect()}
    s = rows["c1"].train_spans[0]
    assert rows["c1"].doc[s.start:s.end] == "hi there"
    # validation: requires --assemble
    rc = main(
        ["--input", p, "--output", out, "--assemble-spans", "assistant"],
        spark=spark,
    )
    assert rc == 2 and "requires --assemble" in capsys.readouterr().err
