"""Round 5: the pure-DuckDB-SQL XXH64 (``__spark_entry__._sql_xxh64_ctes``)
is bit-identical to the pure-Python spec twin (itself proven identical to
Spark's F.xxhash64 in tests/test_round4_fasthash_oracle.py), across every
code path — empty input, sub-stripe tails, 32-byte stripe multiples, long
multi-stripe inputs, and all four UTF-8 encoding widths.

This is the hash-level gate for the q_minhash_lsh_fast driver oracle; the
full-pipeline gate (shingle→minhash→band→pairs, Spark vs the SQL oracle)
runs in test_oracle_parity.py now that the oracle entry exists.
"""

import random

import duckdb

import __spark_entry__ as entry_mod
from test_round4_fasthash_oracle import xxh64


def _sql_hashes(strings):
    con = duckdb.connect()
    con.execute("CREATE TABLE strs(s VARCHAR)")
    con.executemany("INSERT INTO strs VALUES (?)", [(c,) for c in strings])
    q = (
        "WITH RECURSIVE src AS (SELECT DISTINCT s FROM strs),"
        + entry_mod._sql_xxh64_ctes("src")
        + " SELECT s, h FROM xh"
    )
    return dict(con.execute(q).fetchall())


def test_sql_xxh64_boundary_cases():
    cases = [
        "", "a", "abc", "hello world",
        "x" * 31, "x" * 32, "x" * 33,  # stripe threshold
        "x" * 63, "y" * 64, "z" * 65,  # stripe multiple boundary
        "w" * 100, "café — naïve",
        "é" * 20,                       # 2-byte chars
        "你好世界 " * 12,    # 3-byte chars
        "\U0001f600 emoji \U0001f4a9 long enough for stripes too",  # 4-byte
    ]
    got = _sql_hashes(cases)
    for c in cases:
        assert got[c] == xxh64(c.encode("utf-8")), repr(c[:40])


def test_sql_xxh64_random_sweep():
    rng = random.Random(7)
    pool = [chr(c) for c in list(range(32, 127))
            + [0xE9, 0x4F60, 0x597D, 0x20AC, 0x1F600, 0x1F4A9, 0x10FFFF, 0x7FF, 0x800, 0xFFFF]]
    cases = [""]
    for length in list(range(1, 70)) + [96, 127, 128, 129, 200, 255, 256, 300]:
        for _ in range(3):
            cases.append("".join(rng.choice(pool) for _ in range(length)))
    cases = list(dict.fromkeys(cases))
    got = _sql_hashes(cases)
    bad = [c for c in cases if got.get(c) != xxh64(c.encode("utf-8"))]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:3]!r}"
