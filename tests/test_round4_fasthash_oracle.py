"""Round 4: value-level verification of the xxhash64 MinHash fast path.

`q_minhash_lsh_fast` is the one driver query without a DuckDB value
oracle (xxhash64 has no DuckDB twin, and the driver's oracle harness
offers no UDF registration). This file closes the gap in pytest: a
pure-Python XXH64 (re-derived from the public spec,
https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) is
first proven bit-identical to Spark's `F.xxhash64` across adversarial
inputs, then the ENTIRE fast pipeline — normalize → shingle → xxhash64
→ 31-bit fold → K affine permutations → min-aggregate → band → bucket →
candidate pairs — is recomputed independently in Python and compared
value-for-value with the Spark plan on the same corpus the driver
query uses. The driver row stays rows-only by declaration; this test is
its value-level oracle.
"""

import math
import os
import re

from pyspark.sql import functions as F

from fscrawler_spark.functions import dedup

MASK64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def xxh64(data: bytes, seed: int = 42) -> int:
    """Reference XXH64 (spec above), returned as SIGNED int64 to match
    Spark's `xxhash64` column output. Seed 42 = Spark's default."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK64
        v2 = (seed + P2) & MASK64
        v3 = seed
        v4 = (seed - P1) & MASK64
        while i <= n - 32:
            v1 =(_rotl((v1 + int.from_bytes(data[i : i + 8], "little") * P2) & MASK64, 31) * P1) & MASK64
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * P2) & MASK64, 31) * P1) & MASK64
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * P2) & MASK64, 31) * P1) & MASK64
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * P2) & MASK64, 31) * P1) & MASK64
            i += 32
        acc = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        for v in (v1, v2, v3, v4):
            acc = ((acc ^ (_rotl((v * P2) & MASK64, 31) * P1) & MASK64) * P1 + P4) & MASK64
    else:
        acc = (seed + P5) & MASK64
    acc = (acc + n) & MASK64
    while i <= n - 8:
        k = (_rotl((int.from_bytes(data[i : i + 8], "little") * P2) & MASK64, 31) * P1) & MASK64
        acc = ((_rotl(acc ^ k, 27) * P1) + P4) & MASK64
        i += 8
    if i <= n - 4:
        acc = ((_rotl(acc ^ ((int.from_bytes(data[i : i + 4], "little") * P1) & MASK64), 23) * P2) + P3) & MASK64
        i += 4
    while i < n:
        acc = (_rotl(acc ^ ((data[i] * P5) & MASK64), 11) * P1) & MASK64
        i += 1
    acc ^= acc >> 33
    acc = (acc * P2) & MASK64
    acc ^= acc >> 29
    acc = (acc * P3) & MASK64
    acc ^= acc >> 32
    return acc - (1 << 64) if acc >= (1 << 63) else acc


# --- Python twin of the fast MinHash pipeline ------------------------------

_JAVA_WS = r"[ \t\n\x0b\f\r]+"  # Java regex \s (ASCII-only, unlike Python's)


def _normalize(text: str) -> str:
    return re.sub(_JAVA_WS, " ", text.strip(" ").lower())


def _shingles(text, k: int = 3) -> list[str]:
    if text is None:
        return []
    words = _normalize(text).split(" ")
    if len(words) < k:
        return [" ".join(words)]
    return list(dict.fromkeys(" ".join(words[i : i + k]) for i in range(len(words) - k + 1)))


def _sig_fast(text, num_hashes: int = 16) -> list[int] | None:
    sh = _shingles(text)
    if not sh:
        return None
    hs = [xxh64(s.encode("utf-8")) % ((1 << 31) - 1) for s in sh]
    M = (1 << 31) - 1
    return [
        min((h * dedup._MIX_A[s % len(dedup._MIX_A)] + s) % M for h in hs)
        for s in range(num_hashes)
    ]


def _expected_pairs(rows, num_hashes=16, bands=4, max_bucket=1000):
    import hashlib
    from collections import defaultdict

    rpb = num_hashes // bands
    buckets = defaultdict(list)
    for rid, text in rows:
        sig = _sig_fast(text, num_hashes)
        if sig is None:
            continue
        for b in range(bands):
            key = ",".join(str(v) for v in sig[b * rpb : (b + 1) * rpb])
            buckets[(b, hashlib.md5(key.encode()).hexdigest())].append(rid)
    pairs = set()
    for members in buckets.values():
        if len(members) > max_bucket:
            continue
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                if ms[x] != ms[y]:
                    pairs.add((ms[x], ms[y]))
    return pairs


def test_python_xxh64_matches_spark(spark):
    """Bit-parity of the reference implementation across the byte-length
    regimes (empty, <4, 4-7, 8-31, 32+, multi-stripe) and non-ASCII."""
    cases = [
        "",
        "a",
        "ab",
        "abc",
        "abcd",
        "abcdefg",
        "abcdefgh",
        "exactly thirty-one bytes here!!",
        "exactly thirty-two bytes here!!!",
        "a much longer string that easily exceeds the thirty-two byte stripe size of xxh64" * 3,
        "Grüße, 世界 — ünïcodé",
        "tab\tand\nnewline chars",
        " leading and trailing ",
        "42",
    ] + [f"shingle word {i} payload" for i in range(50)]
    df = spark.createDataFrame([(c,) for c in cases], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    got = {r["s"]: r["h"] for r in df.collect()}
    for c in cases:
        assert got[c] == xxh64(c.encode("utf-8")), repr(c)


def test_fast_signatures_value_match(spark):
    """minhash_signatures_fast == the Python twin, value-for-value, on
    the driver corpus (documents + near-dup mutations)."""
    import __spark_entry__ as entry_mod

    corpus = entry_mod._dup_corpus(spark, "/root/testdata/sf0.001")
    rows = [(r["id"], r["text"]) for r in corpus.collect()]
    got = {
        r["id"]: list(r["sig"])
        for r in dedup.minhash_signatures_fast(corpus, id_col="id", num_hashes=16).collect()
    }
    checked = 0
    for rid, text in rows:
        want = _sig_fast(text)
        if want is None:
            assert rid not in got
            continue
        assert got[rid] == want, f"sig mismatch for id={rid}"
        checked += 1
    assert checked >= 100  # the corpus is not trivially small


def test_fast_lsh_pairs_value_match(spark):
    """The full q_minhash_lsh_fast output — banding, bucket md5, giant-
    bucket cap, pair distinctness — equals the independent Python
    recomputation exactly (the value-level oracle the driver lacks)."""
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()["q_minhash_lsh_fast"]
    got = {(r["id_a"], r["id_b"]) for r in q(spark, "/root/testdata/sf0.001").collect()}
    corpus = entry_mod._dup_corpus(spark, "/root/testdata/sf0.001")
    rows = [(r["id"], r["text"]) for r in corpus.collect()]
    want = _expected_pairs(rows)
    assert got == want
    assert len(got) > 0


def test_permutations_decorrelate(spark):
    """Round-4 regression: under the old 2^61-1 modulus the K affine
    permutations of the 31-bit folded hash were near order-preserving —
    the globally-min-hash shingle won EVERY permutation, so this J=0.957
    triple agreed in 0/16 signature positions and LSH missed it
    entirely. With the 2^31-1 Mersenne modulus the permutations wrap
    (true Carter-Wegman bijections): near-identical docs must agree in
    ~J of positions and cluster."""
    core = " ".join(f"s{i}" for i in range(40))
    a = core + " x0 x1 x2 x3 x4 x5 x6 x7"
    b = core + " x0 x1 x2 x3 x4 x5 x6 x8"
    c = core + " x0 x1 x2 x3 x4 x5 x6 x9"
    lone = " ".join(f"q{i}" for i in range(45))
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (40, lone)], "id long, text string"
    )
    out = dedup.near_dup_pipeline(
        df, id_col="id", text_col="text",
        num_hashes=16, bands=8, threshold=0.8, max_bucket=1000,
    )
    assert {r.id: r.cluster_id for r in out.collect()} == {1: 1, 2: 1, 3: 1}
    sigs = {
        r.id: list(r.sig)
        for r in dedup.minhash_signatures_fast(df, id_col="id").collect()
    }
    agree13 = sum(x == y for x, y in zip(sigs[1], sigs[3]))
    assert agree13 >= 8, f"correlated permutations are back: {agree13}/16"
