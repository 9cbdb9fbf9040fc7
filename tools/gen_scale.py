#!/usr/bin/env python3
"""Deterministic 10x scale-up of /root/testdata/sf0.1 -> a measurement-only
sf1.0 directory (guide §1: the driver's round-end bench runs at a larger,
driver-generated SF, so local optimization must be measured at comparable
scale, not just the 600k-row default).

Tiling rules, chosen so that the DERIVED workload structure scales
linearly instead of quadratically:

- documents: doc_id += 5000*k per replica k; every 3rd word gets a
  replica-suffix letter, so 3-word shingles (MinHash/contamination),
  hashed-feature grams, and LM grams do NOT collide across replicas —
  otherwise every doc would acquire 9 extra near-dups and the pair
  machinery would measure an O(replicas^2) workload the driver's real
  sf1.0 does not have. n_chars is recomputed from the perturbed text.
- embeddings: vec_id += 2000*k; replicas are re-normalized after adding
  deterministic gaussian noise sized for cos ~0.97 to the original —
  below the 0.99 SemDeDup bench threshold, so no cross-replica pairs.
- events: event_id/user_id shifted per replica (new users, same ts range
  = 10x density, which is what a bigger tenant looks like).
- TPC-H-ish tables: primary/foreign keys shifted consistently per
  replica; region/nation stay as-is (dimensions).

Single row group per output file, matching the observed sf0.1 layout
(the engine's widen-before-UDF logic must stay honest against dense
single-split parquet, see lm_quality).

Usage: python tools/gen_scale.py [--src /root/testdata/sf0.1] [--dst /root/bench_sf/sf1.0] [--replicas 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SUFFIX = "abcdefghijklmnopqrstuvwxyz"


def perturb_text(texts: list[str], k: int) -> list[str]:
    tag = SUFFIX[k % len(SUFFIX)]
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        words = t.split(" ")
        for i in range(0, len(words), 3):
            words[i] = words[i] + tag
        out.append(" ".join(words))
    return out


def write(dst: str, name: str, table: pa.Table) -> None:
    pq.write_table(
        table,
        os.path.join(dst, name),
        row_group_size=1 << 30,
        compression="snappy",
    )
    print(f"{name}: {table.num_rows} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/bench_sf/sf1.0")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    R = args.replicas

    def load(name: str) -> pa.Table:
        return pq.read_table(os.path.join(args.src, name))

    def shift(col: pa.ChunkedArray, delta: int) -> pa.Array:
        return pc.add(col, pa.scalar(delta, type=col.type))

    # documents --------------------------------------------------------
    docs = load("documents.parquet")
    texts = docs.column("text").to_pylist()
    parts = []
    for k in range(R):
        t = texts if k == 0 else perturb_text(texts, k)
        n_chars = pa.array([len(x) if x is not None else 0 for x in t], type=pa.int64())
        parts.append(
            pa.table(
                {
                    "doc_id": shift(docs["doc_id"], k * docs.num_rows),
                    "text": pa.array(t, type=pa.string()),
                    "lang": docs["lang"],
                    "source": docs["source"],
                    "n_chars": n_chars,
                }
            )
        )
    write(args.dst, "documents.parquet", pa.concat_tables(parts))

    # embeddings -------------------------------------------------------
    emb = load("embeddings.parquet")
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    dim = vecs.shape[1]
    parts = []
    for k in range(R):
        if k == 0:
            v = vecs
        else:
            rng = np.random.default_rng(1000 + k)
            noise = rng.standard_normal(vecs.shape) / np.sqrt(dim)
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            v = vecs + 0.25 * norms * noise
            v = v / np.linalg.norm(v, axis=1, keepdims=True) * norms
        parts.append(
            pa.table(
                {
                    "vec_id": shift(emb["vec_id"], k * emb.num_rows),
                    "embedding": pa.array(
                        [row.astype(np.float32) for row in v],
                        type=pa.list_(pa.float32()),
                    ),
                    "label": emb["label"],
                }
            )
        )
    write(args.dst, "embeddings.parquet", pa.concat_tables(parts))

    # events -----------------------------------------------------------
    ev = load("events.parquet")
    parts = []
    for k in range(R):
        parts.append(
            pa.table(
                {
                    "event_id": shift(ev["event_id"], k * ev.num_rows),
                    "ts": ev["ts"],
                    "user_id": shift(ev["user_id"], k * 10_000_000),
                    "event_type": ev["event_type"],
                    "value": ev["value"],
                    "props": ev["props"],
                }
            )
        )
    write(args.dst, "events.parquet", pa.concat_tables(parts))

    # TPC-H-ish fact/dim tables ---------------------------------------
    ords = load("orders.parquet")
    li = load("lineitem.parquet")
    cust = load("customer.parquet")
    part_t = load("part.parquet")
    supp = load("supplier.parquet")
    o_span = int(pc.max(ords["o_orderkey"]).as_py()) + 1
    c_span = int(pc.max(cust["c_custkey"]).as_py()) + 1
    p_span = int(pc.max(part_t["p_partkey"]).as_py()) + 1
    s_span = int(pc.max(supp["s_suppkey"]).as_py()) + 1

    def tile(tbl: pa.Table, shifts: dict[str, int]) -> pa.Table:
        out = []
        for k in range(R):
            cols = {}
            for name in tbl.column_names:
                col = tbl[name]
                cols[name] = shift(col, k * shifts[name]) if name in shifts and k else col
                if name in shifts and not k:
                    cols[name] = col
            out.append(pa.table(cols))
        return pa.concat_tables(out)

    write(args.dst, "orders.parquet", tile(ords, {"o_orderkey": o_span, "o_custkey": c_span}))
    write(
        args.dst,
        "lineitem.parquet",
        tile(li, {"l_orderkey": o_span, "l_partkey": p_span, "l_suppkey": s_span}),
    )
    write(args.dst, "customer.parquet", tile(cust, {"c_custkey": c_span}))
    write(args.dst, "part.parquet", tile(part_t, {"p_partkey": p_span}))
    write(args.dst, "supplier.parquet", tile(supp, {"s_suppkey": s_span}))
    for dim_name in ("nation.parquet", "region.parquet"):
        write(args.dst, dim_name, load(dim_name))


if __name__ == "__main__":
    main()
