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

from sosse_spark.operators.dedup import _chunk_bounds

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
            ids = np.frombuffer(tup[0], dtype=np.int64) if tup[0] else np.empty(0, np.int64)
            sigs = np.frombuffer(tup[1], dtype=np.int64) if tup[1] else np.empty(0, np.int64)
        else:
            ids = np.empty(0, np.int64)
            sigs = np.empty(0, np.int64)
        # first-sig-wins per id (the same first-occurrence identity as
        # streaming_urlseen): a replayed row (at-least-once upstream)
        # or a re-crawled id is SKIPPED, so state holds one row per id,
        # replays cannot re-emit already-emitted pairs, and state stays
        # bounded by distinct ids.  A content change under the same id
        # therefore keeps the original signature — recrawl-aware dedup
        # needs a fresh checkpoint (or a future replace-by-id state).
        seen_ids = set(ids.tolist())
        # fresh rows accumulate in a geometrically-grown ndarray: the
        # comparison slice buf_*[:buf_n] is a VIEW, so per-row cost is
        # O(|state| + fresh) — the old per-row np.array(list) rebuild
        # made the in-batch half O(B²) array-construction work (ADVICE
        # r5); the doubling resize amortizes to O(B) total copies
        cap = 1024
        buf_ids = np.empty(cap, np.int64)
        buf_sigs = np.empty(cap, np.int64)
        buf_n = 0

        for pdf in pdfs:
            new_ids = pdf["_id"].to_numpy(dtype=np.int64)
            new_sigs = pdf["sig"].to_numpy(dtype=np.int64)
            out_a, out_b, out_h = [], [], []
            # arrival order: each row compares against state PLUS the
            # earlier fresh rows of the run, then joins the seen set —
            # a micro-batch carrying both halves of a pair emits it.
            # State arrays stay frozen; fresh rows concatenate into
            # state ONCE at state.update.
            for i in range(len(new_ids)):
                nid = int(new_ids[i])
                if nid in seen_ids:
                    continue
                sig_u = np.uint64(np.int64(new_sigs[i]).view(np.uint64))
                for cand_ids, cand_sigs in (
                    (ids, sigs),
                    (buf_ids[:buf_n], buf_sigs[:buf_n]),
                ):
                    if not len(cand_ids):
                        continue
                    ham = _popcount64(np.bitwise_xor(cand_sigs.view(np.uint64), sig_u))
                    for j in np.where(ham <= max_hamming)[0]:
                        a = int(cand_ids[j])
                        out_a.append(min(a, nid))
                        out_b.append(max(a, nid))
                        out_h.append(int(ham[j]))
                seen_ids.add(nid)
                if buf_n == cap:
                    cap *= 2
                    buf_ids = np.resize(buf_ids, cap)
                    buf_sigs = np.resize(buf_sigs, cap)
                buf_ids[buf_n] = nid
                buf_sigs[buf_n] = int(new_sigs[i])
                buf_n += 1
            if out_a:
                yield pd.DataFrame(
                    {
                        "id_a": np.array(out_a, dtype=np.int64),
                        "id_b": np.array(out_b, dtype=np.int64),
                        "hamming": np.array(out_h, dtype=np.int32),
                        "chunk_no": np.full(len(out_a), chunk_no, dtype=np.int32),
                    }
                )

        if buf_n:
            state.update(
                (
                    np.concatenate([ids, buf_ids[:buf_n]]).tobytes(),
                    np.concatenate([sigs, buf_sigs[:buf_n]]).tobytes(),
                )
            )

    return _kernel


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
