"""Replicates the driver's correctness gate locally: run each
__spark_entry__ query on Spark AND its DuckDB oracle on the same parquet
tables, compare row counts, column names, and order-insensitive values.

Runs at sf0.001 for speed (the driver uses sf0.01).
"""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def canon(val):
    if val is None:
        return "∅"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{val:.9g}"
    return str(val)


def row_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    if name not in oracles:
        # rows-only check, same as the driver's weaker gate
        assert len(s_rows) >= 0
        return

    con = duck_con()
    res = con.execute(oracles[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    s_set, d_set = row_set(s_cols, s_rows), row_set(d_cols, d_rows)
    mism = [(a, b) for a, b in zip(s_set, d_set) if a != b][:5]
    assert s_set == d_set, f"{name}: value mismatch, first diffs: {mism}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(["conv_id", "turn_idx", "mime", "extracted", "error"]) <= set(df.columns)
