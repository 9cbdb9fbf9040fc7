"""Round 4: corpus statistics report (plans/report.corpus_report) —
one rollup aggregate; DuckDB GROUP BY ROLLUP value twin + CLI drive.
"""

import json
import os

import duckdb
import pytest

from fscrawler_spark.plans.report import corpus_report

ROWS = [
    # (doc_id, conv_id, turn_idx, mime, error, extracted)
    (0, "c0", 0, "text/plain", None, "alpha beta gamma"),
    (1, "c0", 1, "text/plain", None, None),
    (2, "c1", 0, "text/html", "parse_error", ""),
    (3, "c1", 1, None, None, "one two"),
    (4, "c2", 0, "text/html", None, "  padded   words  "),
]
SCHEMA = (
    "doc_id long, conv_id string, turn_idx int, mime string, "
    "error string, extracted string"
)


def _sdf(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_matches_duckdb_rollup(spark):
    got = {
        r["group"]: (r["docs"], r["null_text"], r["chars"], r["words"],
                     r["errors"], r["convs"])
        for r in corpus_report(_sdf(spark)).collect()
    }
    df = _sdf(spark).toPandas()  # noqa: F841 - replacement scan
    con = duckdb.connect()
    exp = {}
    for g, docs, nulls, chars, words, errors, convs in con.execute(
        """
        SELECT CASE WHEN GROUPING(mime) = 1 THEN '<all>'
                    ELSE coalesce(mime, '<null>') END AS grp,
               count(*) AS docs,
               sum(CASE WHEN extracted IS NULL THEN 1 ELSE 0 END) AS null_text,
               coalesce(sum(length(extracted)), 0) AS chars,
               coalesce(sum(CASE WHEN len(trim(extracted)) = 0 THEN 0
                   ELSE len(string_split_regex(trim(extracted), '\\s+')) END), 0) AS words,
               sum(CASE WHEN error IS NOT NULL THEN 1 ELSE 0 END) AS errors,
               count(DISTINCT conv_id) AS convs
        FROM df GROUP BY ROLLUP(mime)
        """
    ).fetchall():
        exp[g] = (docs, nulls, chars, words, errors, convs)
    assert got == exp
    assert got["<all>"][0] == len(ROWS)
    assert "<null>" in got and got["<null>"][0] == 1


def test_optional_columns_absent(spark):
    thin = _sdf(spark).select("doc_id", "mime", "extracted")
    rep = corpus_report(thin)
    assert rep.columns == ["group", "docs", "null_text", "chars", "words"]


def test_group_col_knob_and_validation(spark):
    by_conv = {r["group"]: r["docs"] for r in
               corpus_report(_sdf(spark), group_col="conv_id").collect()}
    assert by_conv == {"<all>": 5, "c0": 2, "c1": 2, "c2": 1}
    with pytest.raises(ValueError):
        corpus_report(_sdf(spark), group_col="nope")
    with pytest.raises(ValueError):
        corpus_report(_sdf(spark), text_col="nope")


def test_single_aggregate_plan(spark):
    # without conv_id: rollup = Expand + ONE hash-agg pair -> one Exchange
    thin = _sdf(spark).select("doc_id", "mime", "error", "extracted")
    plan = thin.transform(corpus_report)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Expand" in plan
    assert "EvalPython" not in plan
    # count_distinct(conv_id) legitimately adds the distinct-agg phase:
    # still bounded at two Exchanges, never a join or a Python boundary
    full = corpus_report(_sdf(spark))._jdf.queryExecution().executedPlan().toString()
    assert full.count("Exchange") <= 2
    assert "EvalPython" not in full


def test_cli_report(spark, tmp_path, capsys):
    from fscrawler_spark.cli import main

    src = str(tmp_path / "in")
    _sdf(spark).write.parquet(os.path.join(src, "docs"))
    out = str(tmp_path / "rep")
    rc = main(["--input", src, "--output", out, "--report"], spark=spark)
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["groups"] == 3  # text/plain, text/html, <null>
    total = [r for r in res["rows"] if r["group"] == "<all>"][0]
    assert total["docs"] == 5 and total["errors"] == 1

    # knob without verb is a usage error
    rc = main(["--input", src, "--output", out, "--report-group", "mime"], spark=spark)
    assert rc == 2
    # bad group column exits 2 with a message
    rc = main(["--input", src, "--output", out, "--report",
               "--report-group", "nope"], spark=spark)
    assert rc == 2
