"""Vectorized XXH64 (seed 42) with exact Spark ``xxhash64`` parity, and
the per-task MinHash signature kernel built on it.

Spark's ``xxhash64`` is the standard XXH64 algorithm over a string's
UTF-8 bytes with seed 42 (already re-derived twice in this repo: the
pure-Python twin in tests/test_round4_fasthash_oracle.py and the DuckDB
recursive-CTE SQL twin in __spark_entry__.py, both verified value-exact
against Spark over hostile-unicode sweeps). This module is the third
twin: the same spec evaluated BATCHED in numpy — byte strings are
grouped by length so every lane of a group runs the identical
fixed-width instruction sequence, and all arithmetic is uint64 with
numpy's native mod-2^64 wraparound (bit-identical to the scalar spec;
pinned against the test twin by tests/test_round6_fasthash_np.py).

Why it exists (guide §4.2): MinHash signature generation was the single
largest headline cost — the JVM shape pays one string build + one hash
+ 16 multiply-mod-min updates per SHINGLE OCCURRENCE inside a row
explode, then a corpus-wide hash aggregate. Per task, numpy does the
same arithmetic two orders of magnitude cheaper per element, and
because a document's whole signature is computed locally there is NO
aggregate and NO shuffle at all — signatures become a pure map stage.
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

_U = np.uint64


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U(r)) | (x >> _U(64 - r))


def _mul(x: np.ndarray, c: int) -> np.ndarray:
    # numpy uint64 multiply wraps mod 2^64 silently — exactly the spec
    return x * _U(c)


def _xxh64_fixed(m: np.ndarray, seed: int) -> np.ndarray:
    """XXH64 of every row of a (rows, L) uint8 matrix, as uint64."""
    n_rows, L = m.shape
    i = 0

    def word8(j: int) -> np.ndarray:
        return np.ascontiguousarray(m[:, j : j + 8]).view("<u8").ravel()

    if L >= 32:
        v1 = np.full(n_rows, (seed + _P1 + _P2) & ((1 << 64) - 1), dtype=_U)
        v2 = np.full(n_rows, (seed + _P2) & ((1 << 64) - 1), dtype=_U)
        v3 = np.full(n_rows, seed, dtype=_U)
        v4 = np.full(n_rows, (seed - _P1) & ((1 << 64) - 1), dtype=_U)
        while i <= L - 32:
            v1 = _mul(_rotl(v1 + _mul(word8(i), _P2), 31), _P1)
            v2 = _mul(_rotl(v2 + _mul(word8(i + 8), _P2), 31), _P1)
            v3 = _mul(_rotl(v3 + _mul(word8(i + 16), _P2), 31), _P1)
            v4 = _mul(_rotl(v4 + _mul(word8(i + 24), _P2), 31), _P1)
            i += 32
        acc = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            acc = _mul(acc ^ _mul(_rotl(_mul(v, _P2), 31), _P1), _P1) + _U(_P4)
    else:
        acc = np.full(n_rows, (seed + _P5) & ((1 << 64) - 1), dtype=_U)
    acc = acc + _U(L)
    while i <= L - 8:
        k = _mul(_rotl(_mul(word8(i), _P2), 31), _P1)
        acc = _mul(_rotl(acc ^ k, 27), _P1) + _U(_P4)
        i += 8
    if i <= L - 4:
        w4 = np.ascontiguousarray(m[:, i : i + 4]).view("<u4").ravel().astype(_U)
        acc = _mul(_rotl(acc ^ _mul(w4, _P1), 23), _P2) + _U(_P3)
        i += 4
    while i < L:
        acc = _mul(_rotl(acc ^ _mul(m[:, i].astype(_U), _P5), 11), _P1)
        i += 1
    acc ^= acc >> _U(33)
    acc = _mul(acc, _P2)
    acc ^= acc >> _U(29)
    acc = _mul(acc, _P3)
    acc ^= acc >> _U(32)
    return acc


def xxh64_batch(data: list[bytes], seed: int = 42) -> np.ndarray:
    """Signed-int64 XXH64 of each byte string (Spark ``xxhash64``
    column parity, including the signed view). Groups by length so the
    vector kernel sees fixed-width rows; the group loop is over DISTINCT
    lengths, not elements."""
    n = len(data)
    out = np.empty(n, dtype=np.int64)
    if not n:
        return out
    lens = np.fromiter((len(b) for b in data), dtype=np.int64, count=n)
    order = np.argsort(lens, kind="stable")
    sorted_lens = lens[order]
    # group boundaries over the sorted ordering
    bounds = np.flatnonzero(np.diff(sorted_lens)) + 1
    starts = np.concatenate(([0], bounds, [n]))
    for g in range(len(starts) - 1):
        lo, hi = starts[g], starts[g + 1]
        idxs = order[lo:hi]
        L = int(sorted_lens[lo])
        if L == 0:
            # empty input: acc = seed + P5 + 0, straight to avalanche
            acc = np.full(hi - lo, (seed + _P5) & ((1 << 64) - 1), dtype=_U)
            acc ^= acc >> _U(33)
            acc = _mul(acc, _P2)
            acc ^= acc >> _U(29)
            acc = _mul(acc, _P3)
            acc ^= acc >> _U(32)
            out[idxs] = acc.view(np.int64)
            continue
        buf = b"".join(data[i] for i in idxs)
        m = np.frombuffer(buf, dtype=np.uint8).reshape(hi - lo, L)
        out[idxs] = _xxh64_fixed(m, seed).view(np.int64)
    return out


_M31 = (1 << 31) - 1  # the MinHash permutation modulus (Mersenne prime)


def hashed_shingle_sets_np(
    texts: list[str | None], shingle_k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-batch DISTINCT xxhash64 shingle sets over ALREADY-NORMALIZED
    texts: returns (offsets, values) describing one int64 hash array per
    input row — the value-exact twin of dedup.hashed_shingles
    (wrap=xxhash64 through _shingle_array): null text yields an EMPTY
    array, fewer than k words one whole-text shingle, and per-doc
    duplicates collapse (np.unique; element ORDER differs from the JVM
    first-occurrence order, which no consumer observes — the arrays
    feed set intersections and sizes only)."""
    n = len(texts)
    shingles: list[bytes] = []
    starts = np.empty(n + 1, dtype=np.int64)
    starts[0] = 0
    for r, s in enumerate(texts):
        if s is not None:
            ws = s.split(" ")
            if len(ws) < shingle_k:
                shingles.append(s.encode("utf-8"))
            else:
                join = " ".join
                shingles.extend(
                    join(ws[i : i + shingle_k]).encode("utf-8")
                    for i in range(len(ws) - shingle_k + 1)
                )
        starts[r + 1] = len(shingles)
    hs = xxh64_batch(shingles)
    offsets = np.empty(n + 1, dtype=np.int64)
    offsets[0] = 0
    out = np.empty(len(hs), dtype=np.int64)
    pos = 0
    for r in range(n):
        u = np.unique(hs[starts[r] : starts[r + 1]])
        out[pos : pos + len(u)] = u
        pos += len(u)
        offsets[r + 1] = pos
    return offsets, out[:pos]


def minhash_sigs_np(
    texts: list[str | None],
    mixers: np.ndarray,
    shingle_k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-batch MinHash kernel over ALREADY-NORMALIZED texts.

    Returns (keep_mask, sigs): ``keep_mask`` flags non-null texts (null
    text has no signature — dedup._shingle_array's convention), ``sigs``
    is (n_kept, num_hashes) int64. Shingles, the 31-bit fold, and the
    Carter-Wegman permutations replicate minhash_signatures_fast's JVM
    expressions value-exactly: shingle strings are ' '-joined word
    windows of the single-spaced normalized text (whole text when fewer
    than k words), hashed with XXH64(seed 42) over UTF-8 bytes, folded
    with a floored mod (numpy's signed mod == Spark pmod for a positive
    modulus), then min-reduced per document per permutation."""
    n = len(texts)
    keep = np.zeros(n, dtype=bool)
    shingles: list[bytes] = []
    starts: list[int] = []
    for r, s in enumerate(texts):
        if s is None:
            continue
        keep[r] = True
        starts.append(len(shingles))
        ws = s.split(" ")
        if len(ws) < shingle_k:
            shingles.append(s.encode("utf-8"))
        else:
            join = " ".join
            enc = str.encode
            shingles.extend(
                enc(join(ws[i : i + shingle_k]), "utf-8")
                for i in range(len(ws) - shingle_k + 1)
            )
    n_kept = len(starts)
    num_hashes = len(mixers)
    sigs = np.empty((n_kept, num_hashes), dtype=np.int64)
    if not n_kept:
        return keep, sigs
    h31 = np.mod(xxh64_batch(shingles), _M31)  # floored mod == pmod
    idx = np.asarray(starts, dtype=np.int64)
    for s in range(num_hashes):
        # products stay < 2^63: h31 < 2^31, mixer < 2^32 (ANSI-safe note
        # in minhash_signatures_fast)
        v = (h31 * int(mixers[s]) + s) % _M31
        sigs[:, s] = np.minimum.reduceat(v, idx)
    return keep, sigs
