"""Round 6: the numpy-vectorized XXH64 twin (functions.fasthash) must be
bit-identical to the proven scalar Python twin (which is itself pinned
against Spark's xxhash64 in test_round4_fasthash_oracle) across every
small-input length, the 32-byte block path, and hostile unicode; and the
batched MinHash kernel must reproduce the scalar signature twin."""

import random

import numpy as np

from fscrawler_spark.functions.fasthash import minhash_sigs_np, xxh64_batch
from fscrawler_spark.functions import dedup

from test_round4_fasthash_oracle import _normalize, _sig_fast, xxh64 as xxh64_ref


def test_xxh64_batch_matches_scalar_twin_all_lengths():
    rng = random.Random(7)
    cases = [b"", b"a", b"abc", bytes(range(256)), "caf\xe9 — na\xefve".encode()]
    for L in range(0, 130):
        cases.append(bytes(rng.randrange(256) for _ in range(L)))
    for L in (31, 32, 33, 63, 64, 65, 100, 1000):
        cases.append(bytes(rng.randrange(256) for _ in range(L)))
    got = xxh64_batch(cases)
    for i, c in enumerate(cases):
        assert int(got[i]) == xxh64_ref(c), (i, len(c))


def test_xxh64_batch_hostile_unicode():
    texts = [
        "",
        " ",
        " nbsp ",
        "\U0001f4a5" * 9,
        "tab\tand\nnewline",
        "mixed مرحبا ascii",
        "😀 emoji start",
        "z" * 200,
    ]
    data = [t.encode("utf-8") for t in texts]
    got = xxh64_batch(data)
    for i, d in enumerate(data):
        assert int(got[i]) == xxh64_ref(d), texts[i]


def test_minhash_kernel_matches_scalar_sig_twin():
    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "caf\xe9", "—", "x"]
    texts = [
        None,
        "",
        "one",
        "one two",
        "one two three",
        "  padded   spaces  collapse  ",
    ] + [" ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 40))) for _ in range(50)]
    normed = [None if t is None else _normalize(t) for t in texts]
    mix = np.asarray([dedup._MIX_A[s % len(dedup._MIX_A)] for s in range(16)], dtype=np.int64)
    keep, sigs = minhash_sigs_np(normed, mix, 3)
    j = 0
    for t, k in zip(texts, keep):
        exp = _sig_fast(t) if t is not None else None
        if t is None:
            assert not k
            continue
        assert k
        assert list(sigs[j]) == exp, t
        j += 1
