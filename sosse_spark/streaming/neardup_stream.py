"""Streaming near-dup pair detection: a custom stateful operator
(applyInPandasWithState) — the Structured-Streaming spelling of the
pigeonhole-banded hamming join (operators/dedup.py
hamming_near_dup_pairs / phash_hamming_pairs).

The batch engine finds near-dup pairs per snapshot with a chunk
equi-join; when signatures arrive as a STREAM (drip ingest of freshly
crawled images/documents), the idiomatic shape is state per
(chunk_no, chunk) group: each group keeps the (id, sig) rows that ever
carried that chunk value, and an arriving row emits a pair for every
stored signature within max_hamming.  Pigeonhole recall is unchanged —
any pair within max_hamming agrees on at least one whole chunk, so the
pair is emitted by at least one group.

Delivery is AT-LEAST-ONCE per pair: a pair agreeing on several chunks
is emitted by each agreeing group (bounded by n_chunks = max_hamming+1
duplicates).  Pairs are normalized (id_a < id_b), so the sink dedupes
on (id_a, id_b) — `foreachBatch` + dropDuplicates, or a downstream
batch distinct; keeping the cross-group dedup out of the stream avoids
chaining a second stateful operator behind applyInPandasWithState.

Scale shape: state is partitioned by chunk value exactly like the
batch join's shuffle key — each task owns its chunk buckets, nothing
is broadcast, and hamming is evaluated as a vectorized SWAR popcount
over the group's packed int64 signature array (numpy < 2 has no
bitwise_count).  Rows within one micro-batch see earlier rows of the
same batch (arrival order), so a batch containing both halves of a
pair still emits it.  State grows with distinct chunk values held —
the same unbounded-seen-set profile as streaming_urlseen; the batch
engine remains the bulk path, this serves continuous ingest.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_neardup_pairs", "NEARDUP_STATE_SCHEMA"]

NEARDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.BinaryType()),
        T.StructField("sigs", T.BinaryType()),
    ]
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("hamming", T.IntegerType()),
        T.StructField("chunk_no", T.IntegerType()),
    ]
)


def _popcount64(x):
    """Vectorized 64-bit SWAR popcount over a uint64 numpy array."""
    import numpy as np

    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return (x * h01) >> np.uint64(56)


def _make_kernel(max_hamming: int):
    def _kernel(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        chunk_no = int(key[0])
        if state.exists:
            tup = state.get
            ids = np.frombuffer(tup[0], dtype=np.int64).copy() if tup[0] else np.empty(0, np.int64)
            sigs = np.frombuffer(tup[1], dtype=np.int64).copy() if tup[1] else np.empty(0, np.int64)
        else:
            ids = np.empty(0, np.int64)
            sigs = np.empty(0, np.int64)
        n_before = len(ids)

        for pdf in pdfs:
            new_ids = pdf["_id"].to_numpy(dtype=np.int64)
            new_sigs = pdf["sig"].to_numpy(dtype=np.int64)
            out_a, out_b, out_h = [], [], []
            # arrival order: each row compares against state PLUS the
            # earlier rows of its own batch, then joins the seen set —
            # a micro-batch carrying both halves of a pair emits it
            for i in range(len(new_ids)):
                if len(ids):
                    x = np.bitwise_xor(
                        sigs.view(np.uint64), np.uint64(np.int64(new_sigs[i]).view(np.uint64))
                    )
                    ham = _popcount64(x)
                    hit = np.where(ham <= max_hamming)[0]
                    for j in hit:
                        a, b = int(ids[j]), int(new_ids[i])
                        if a == b:
                            continue
                        out_a.append(min(a, b))
                        out_b.append(max(a, b))
                        out_h.append(int(ham[j]))
                ids = np.append(ids, new_ids[i])
                sigs = np.append(sigs, new_sigs[i])
            if out_a:
                yield pd.DataFrame(
                    {
                        "id_a": np.array(out_a, dtype=np.int64),
                        "id_b": np.array(out_b, dtype=np.int64),
                        "hamming": np.array(out_h, dtype=np.int32),
                        "chunk_no": np.full(len(out_a), chunk_no, dtype=np.int32),
                    }
                )

        if len(ids) != n_before:
            state.update((ids.tobytes(), sigs.tobytes()))

    return _kernel


def _chunk_bounds(n_bits: int, n_chunks: int):
    """Same chunk split as operators/dedup.py (pigeonhole bands)."""
    base = n_bits // n_chunks
    extra = n_bits % n_chunks
    bounds = []
    start = 0
    for c in range(n_chunks):
        width = base + (1 if c < extra else 0)
        bounds.append((start, width))
        start += width
    return bounds


def streaming_neardup_pairs(
    sigs: DataFrame,
    max_hamming: int = 3,
    n_bits: int = 64,
    id_col: str = "doc_id",
    sig_col: str = "sig",
) -> DataFrame:
    """sigs: streaming DataFrame with (id, sig:long) — emits near-dup
    pairs (id_a, id_b, hamming, chunk_no) with id_a < id_b as rows
    arrive, at-least-once per pair (dedupe on (id_a, id_b) in the
    sink), state-store backed and restart-safe.

    The chunk explode mirrors the batch operator bit-for-bit (same
    _chunk_bounds split), so a drained stream's deduped pair set equals
    hamming_near_dup_pairs on the same rows (tested)."""
    n_chunks = max_hamming + 1
    chunked = sigs.select(
        F.col(id_col).alias("_id"),
        F.col(sig_col).cast("long").alias("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_no"),
                        F.shiftright(F.col(sig_col).cast("long"), start)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for c, (start, width) in enumerate(_chunk_bounds(n_bits, n_chunks))
                ]
            )
        ).alias("ch"),
    ).select("_id", "sig", "ch.chunk_no", "ch.chunk")
    return chunked.groupBy("chunk_no", "chunk").applyInPandasWithState(
        _make_kernel(max_hamming),
        outputStructType=_OUT_SCHEMA,
        stateStructType=NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
