"""A/B harness for the pure-Python extraction core (the north-metric
hot path inside the Arrow UDF).

Generates the synthetic transcript corpus once, then times
`extractors.extract` over it per mime class and checks byte-identity of
(mime, extracted, spans, error, title) against a golden capture — any
candidate optimization must keep outputs EXACTLY equal (per-turn text
equality is the correctness gate).

Usage:
    python tools/extract_hotpath_bench.py [--turns 20000] [--golden PATH]

With --golden pointing at a prior capture (pickle), diffs against it;
otherwise writes one next to the corpus and just reports timing.
"""

from __future__ import annotations

import argparse
import collections
import os
import pickle
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fscrawler_spark.functions.extractors import extract, sniff_mime  # noqa: E402


def corpus(n_turns: int) -> list[str]:
    import pyarrow.parquet as pq

    from fscrawler_spark.datagen import generate_transcripts

    d = os.path.join(tempfile.gettempdir(), f"extract_bench_{n_turns}")
    pq_path = os.path.join(d, "data", "transcripts.parquet")
    if not os.path.exists(pq_path):
        paths = generate_transcripts(os.path.join(d, "data"), n_turns=n_turns, seed=11)
        pq_path = paths["transcripts"]
    return pq.read_table(pq_path, columns=["text"]).column("text").to_pylist()


def capture(texts: list[str]) -> list[tuple]:
    out = []
    for t in texts:
        r = extract(t, 100_000)
        out.append((r.mime, r.extracted, tuple(r.spans), r.error, r.title))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=20_000)
    ap.add_argument("--golden", default=None)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    texts = corpus(args.turns)
    got = capture(texts)

    if args.golden and os.path.exists(args.golden):
        with open(args.golden, "rb") as f:
            want = pickle.load(f)
        bad = [i for i, (a, b) in enumerate(zip(want, got)) if a != b]
        if bad or len(want) != len(got):
            i = bad[0] if bad else min(len(want), len(got))
            print(f"MISMATCH: {len(bad)} rows differ; first at row {i}")
            print("  want:", repr(want[i])[:300])
            print("  got: ", repr(got[i])[:300])
            return 1
        print(f"outputs identical to golden ({len(got)} rows)")
    else:
        path = args.golden or os.path.join(
            tempfile.gettempdir(), f"extract_bench_{args.turns}", "golden.pkl"
        )
        with open(path, "wb") as f:
            pickle.dump(got, f)
        print(f"golden written: {path}")

    groups = collections.defaultdict(list)
    for t in texts:
        groups[sniff_mime(t)].append(t)
    total = 0.0
    for m, g in sorted(groups.items()):
        best = min(
            _time_group(g) for _ in range(args.repeat)
        )
        total += best
        print(f"{m:30s} n={len(g):6d} best={best * 1000:8.1f}ms per={best / len(g) * 1e6:7.1f}us")
    print(f"{'TOTAL':30s} n={len(texts):6d} best={total * 1000:8.1f}ms per={total / len(texts) * 1e6:7.1f}us")
    return 0


def _time_group(g: list[str]) -> float:
    t0 = time.perf_counter()
    for t in g:
        extract(t, 100_000)
    return time.perf_counter() - t0


if __name__ == "__main__":
    raise SystemExit(main())
