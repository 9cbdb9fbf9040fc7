"""Deterministic synthetic transcripts generator (seeded, SF-scalable).

Produces the input table per BASELINE.json input_hint:
    (conv_id:string, turn_idx:int32, role:string, text:string,
     tool:string, ts:timestamp)
plus the golden expected-output table for per-turn text-equality diffs
(FIXTURES.md §2). Payload classes mirror the reference corpus spread
(/root/reference/test-documents/.../documents/): plain/html/json/xml/
pdfish/encrypted/broken/empty, with CJK coverage.

Skew: conversation 'megaconv-0' holds ~8% of all turns at every SF to
exercise salting + AQE skew handling (FIXTURES.md §1).

Everything derives from a fixed seed — no wall clock, no external data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fscrawler_spark.functions.extractors import extract

SEED = 42
BASE_TS_US = 1_700_000_000_000_000  # fixed epoch base (us) — deterministic

WORDS = (
    "the quick brown fox jumps over lazy dog spark data table query scan filter "
    "join merge batch stream window aggregate partition shuffle broadcast salt "
    "skew lineage checkpoint resume extract content boilerplate density span "
    "offset transcript conversation agent tool assistant user system 中文 名称 "
    "テキスト 解析 distributed executor throughput"
).split()

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["browser", "pdf_reader", "api", "search"]

# payload class mix per FIXTURES.md §1 (+ image: the T5 needs_ocr branch)
CLASSES = ["plain", "html", "json", "xml", "pdfish", "encrypted", "broken", "empty", "image"]
CLASS_P = [0.38, 0.30, 0.10, 0.05, 0.10, 0.02, 0.02, 0.01, 0.02]


def _sentences(rng: np.random.Generator, n_words: int) -> str:
    idx = rng.integers(0, len(WORDS), size=n_words)
    return " ".join(WORDS[i] for i in idx)


def _make_payload(rng: np.random.Generator, cls: str) -> str:
    body = _sentences(rng, int(rng.integers(20, 120)))
    if cls == "plain":
        return body
    if cls == "html":
        para2 = _sentences(rng, int(rng.integers(10, 60)))
        return (
            "<!DOCTYPE html><html><head><title>t</title><style>.x{}</style>"
            "<script>var a=1;</script></head><body>"
            "<nav><a href='/'>Home</a> <a href='/d'>Docs</a> <a href='/c'>Contact</a></nav>"
            "<header>header junk text</header>"
            f"<article><p>{body}</p><p>{para2}</p></article>"
            "<aside>sidebar promo</aside>"
            "<div><a href='/1'>l1</a> <a href='/2'>l2</a> <a href='/3'>l3</a></div>"
            "<footer>copyright footer</footer></body></html>"
        )
    if cls == "json":
        v2 = _sentences(rng, 6)
        return '{"content": "%s", "summary": "%s", "n": %d}' % (body, v2, rng.integers(0, 99))
    if cls == "xml":
        if rng.random() < 0.05:
            return "<?xml version='1.0'?><doc>   \n</doc>"  # whitespace edge case
        return f"<?xml version='1.0'?><doc><title>{_sentences(rng, 4)}</title><body>{body}</body></doc>"
    if cls == "pdfish":
        lines = [_sentences(rng, int(rng.integers(4, 12))) for _ in range(int(rng.integers(2, 8)))]
        mid = len(lines) // 2
        page1 = "\n".join(lines[:mid]) if mid else ""
        page2 = "\n".join(lines[mid:])
        out = "%PDF-SYNTH 1.0\n%%Page: 1\n"
        if page1:
            out += page1 + "\n"
        out += "%%Page: 2\n" + page2 + "\n"
        return out
    if cls == "encrypted":
        return "ENC:" + format(int(rng.integers(0, 2**31)), "08x")
    if cls == "broken":
        return "PK\x00\x01 corrupted " + body[:40]
    if cls == "image":
        # image-like payload: PNG magic + opaque bytes -> needs_ocr branch
        return "\x89PNG\r\n\x1a\n" + format(int(rng.integers(0, 2**31)), "08x")
    return ""  # empty


def generate_transcripts(
    out_dir: str,
    n_turns: int = 20_000,
    seed: int = SEED,
    mega_share: float = 0.08,
    n_convs: int | None = None,
    write_expected: bool = True,
) -> dict[str, str]:
    """Write transcripts.parquet (+ expected.parquet) under out_dir.

    Deterministic for a given (n_turns, seed). ~mega_share of turns land in
    a single 'megaconv-0' conversation (skew fixture).
    """
    rng = np.random.default_rng(seed)
    n_convs = n_convs or max(2, n_turns // 40)

    n_mega = int(n_turns * mega_share)
    n_rest = n_turns - n_mega
    conv_ids = np.concatenate(
        [
            np.full(n_mega, 0),
            rng.integers(1, n_convs, size=n_rest),
        ]
    )
    # stable per-conv turn indexing
    order = np.argsort(conv_ids, kind="stable")
    conv_sorted = conv_ids[order]
    turn_idx = np.zeros(n_turns, dtype=np.int32)
    _, starts = np.unique(conv_sorted, return_index=True)
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else n_turns
        turn_idx[s:e] = np.arange(e - s, dtype=np.int32)

    conv_str = np.where(conv_sorted == 0, "megaconv-0", np.char.add("conv-", conv_sorted.astype(str)))
    cls_idx = rng.choice(len(CLASSES), size=n_turns, p=CLASS_P)
    role_idx = rng.integers(0, len(ROLES), size=n_turns)
    tool_idx = rng.integers(0, len(TOOLS), size=n_turns)

    texts: list[str] = []
    expected_text: list[str | None] = []
    expected_mime: list[str] = []
    expected_error: list[str | None] = []
    exp_spans: list[list[dict]] = []
    for i in range(n_turns):
        cls = CLASSES[cls_idx[i]]
        t = _make_payload(rng, cls)
        texts.append(t)
        if write_expected:
            r = extract(t)
            expected_text.append(r.extracted)
            expected_mime.append(r.mime)
            expected_error.append(r.error)
            exp_spans.append([{"start": s, "end": e} for s, e in r.spans])

    roles = [ROLES[i] for i in role_idx]
    tools = [TOOLS[tool_idx[i]] if roles[i] == "tool" else None for i in range(n_turns)]
    ts = BASE_TS_US + (np.arange(n_turns, dtype=np.int64) * 1_000_000) + turn_idx.astype(np.int64)

    table = pa.table(
        {
            "conv_id": pa.array(conv_str, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    paths = {"transcripts": os.path.join(out_dir, "transcripts.parquet")}
    # small row groups so Spark's scan yields many splittable partitions
    pq.write_table(table, paths["transcripts"], row_group_size=10_000)

    if write_expected:
        span_type = pa.list_(pa.struct([("start", pa.int32()), ("end", pa.int32())]))
        exp = pa.table(
            {
                "conv_id": table["conv_id"],
                "turn_idx": table["turn_idx"],
                "expected_text": pa.array(expected_text, pa.string()),
                "expected_spans": pa.array(exp_spans, span_type),
                "expected_mime": pa.array(expected_mime, pa.string()),
                "expected_error": pa.array(expected_error, pa.string()),
            }
        )
        paths["expected"] = os.path.join(out_dir, "expected.parquet")
        pq.write_table(exp, paths["expected"])
    return paths
