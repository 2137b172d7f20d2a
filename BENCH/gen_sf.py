#!/usr/bin/env python3
"""Generate a LOCAL measurement-only dataset with the driver testdata's
distributions at an arbitrary scale factor (default 1.0, i.e. 10x sf0.1).

The driver escalated BENCH_r05 to a driver-generated sf1.0; we cannot
reproduce its exact rows (its generator is private), but per-query COST
is governed by the distributions, which sf0.001/0.01/0.1 pin down:

  documents: n = 50000*sf docs, 10..100 words uniform, from a 30-word
      uniform vocabulary; 5% of docs are planted near-duplicates (a
      lower-id base doc's text + " dup" appended); langs en 41% /
      zh,es,fr,de ~14.75% each; 20 sources; n_chars = len(text).
  embeddings: n = 20000*sf unit-norm 64-dim gaussians, labels 0..9.
  TPC-H-ish tables + events: column distributions copied from sf0.1 by
      resampling rows with fresh sequential keys (cost shape only).

Usage: python BENCH/gen_sf.py [sf] [outdir]
Writes parquet per table under outdir (default /dev/shm/sosse-sfgen/sf<sf>).
NOT part of the bench contract; never read by bench.py or queries().
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream", "value",
    "data", "small", "join", "filter", "big", "group", "hash", "customer",
    "sort", "order", "slow", "line", "part", "fast", "the", "row", "agg",
    "key", "query", "a", "scan", "batch",
]


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    lens = rng.integers(10, 101, size=n)
    words = np.array(VOCAB)
    texts = [" ".join(words[rng.integers(0, len(words), size=L)]) for L in lens]
    # plant 5% near-dups: doc j (later id) = doc i's text + " dup"
    n_dup = n // 20
    dup_ids = rng.choice(np.arange(2, n), size=n_dup, replace=False)
    for j in sorted(dup_ids):
        i = int(rng.integers(0, j))
        texts[j] = texts[i] + " dup"
    langs = rng.choice(["en", "zh", "es", "fr", "de"], size=n, p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475])
    srcs = np.array([f"src{i}" for i in rng.integers(0, 20, size=n)])
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(srcs, pa.string()),
            "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
        }
    )


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    v = rng.standard_normal((n, 64))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(v.astype(np.float32)), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n).astype(np.int32), pa.int32()),
        }
    )


def resample_table(src_path: str, factor: float, key_cols: list[str], rng: np.random.Generator) -> pa.Table:
    t = pq.read_table(src_path)
    n_out = int(t.num_rows * factor)
    idx = rng.integers(0, t.num_rows, size=n_out)
    out = t.take(idx)
    cols = {name: out.column(name) for name in out.column_names}
    for k in key_cols:  # fresh unique keys so groupBy/distinct shapes survive
        cols[k] = pa.array(np.arange(n_out), out.schema.field(k).type)
    return pa.table(cols)


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/dev/shm/sosse-sfgen/sf{sf}"
    src = "/root/testdata/sf0.1"
    factor = sf / 0.1
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(gen_documents(int(50000 * sf), rng), f"{out}/documents.parquet")
    pq.write_table(gen_embeddings(int(20000 * sf), rng), f"{out}/embeddings.parquet")
    keyed = {
        "customer": ["c_custkey"],
        "events": ["event_id"],
        "lineitem": [],
        "orders": ["o_orderkey"],
        "part": ["p_partkey"],
        "supplier": ["s_suppkey"],
    }
    for name, keys in keyed.items():
        pq.write_table(resample_table(f"{src}/{name}.parquet", factor, keys, rng), f"{out}/{name}.parquet")
    for name in ["nation", "region"]:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"), f"{out}/{name}.parquet")
    print(out)


if __name__ == "__main__":
    main()
