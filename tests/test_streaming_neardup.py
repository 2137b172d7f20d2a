"""Stateful streaming near-dup pairs (applyInPandasWithState): the
pigeonhole-banded hamming join over a signature stream — pair emission
across micro-batches AND across query restarts, deduped-pair parity
with the batch operator on the drained stream."""

import os

from pyspark.sql import functions as F

from sosse_spark.streaming.neardup_stream import streaming_neardup_pairs

_SCHEMA = "doc_id long, sig long"


def _run(spark, input_dir, output_dir, ckpt, max_hamming=3):
    raw = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    out = streaming_neardup_pairs(raw, max_hamming=max_hamming)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _write(spark, input_dir, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode("append").parquet(input_dir)


def _pairs(spark, output_dir):
    return {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in spark.read.parquet(output_dir).collect()
    }


def test_streaming_neardup_across_batches_and_restarts(spark, tmp_root):
    input_dir = os.path.join(tmp_root, "sig_in")
    output_dir = os.path.join(tmp_root, "sig_out")
    ckpt = os.path.join(tmp_root, "sig_ckpt")

    base = 0x0123456789ABCDEF
    far = 0x7EDCBA9876543210
    # batch 1 carries BOTH halves of one pair (in-batch emission) plus a
    # far-away signature; batch 2 brings a cross-batch neighbor of base
    _write(spark, input_dir, [(1, base), (2, base ^ 1), (9, far)])
    _write(spark, input_dir, [(3, base ^ (1 << 40))])
    _run(spark, input_dir, output_dir, ckpt)
    got1 = _pairs(spark, output_dir)
    assert (1, 2, 1) in got1  # in-batch pair
    assert (1, 3, 1) in got1 and (2, 3, 2) in got1  # cross-batch pairs
    assert not any(9 in (a, b) for a, b, _ in got1)

    # restart against the same checkpoint: state survives — a neighbor
    # arriving after restart still pairs with the ORIGINAL rows
    _write(spark, input_dir, [(4, base ^ 2)])
    _run(spark, input_dir, output_dir, ckpt)
    got2 = _pairs(spark, output_dir)
    assert (1, 4, 1) in got2 and (2, 4, 2) in got2 and (3, 4, 2) in got2

    # deduped-pair parity with the batch operator over the same rows
    from sosse_spark.operators.dedup import hamming_near_dup_pairs

    all_rows = spark.createDataFrame(
        [(1, base), (2, base ^ 1), (9, far), (3, base ^ (1 << 40)), (4, base ^ 2)],
        _SCHEMA,
    ).selectExpr("doc_id as _id", "sig")
    want = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_dup_pairs(all_rows, max_hamming=3).collect()
    }
    assert got2 == want


def test_streaming_neardup_at_least_once_normalized(spark, tmp_root):
    """Identical signatures agree on EVERY chunk: the pair is emitted by
    multiple groups (at-least-once), but always normalized id_a < id_b —
    dedup on (id_a, id_b) recovers exactly-once."""
    input_dir = os.path.join(tmp_root, "dup_in")
    output_dir = os.path.join(tmp_root, "dup_out")
    ckpt = os.path.join(tmp_root, "dup_ckpt")
    _write(spark, input_dir, [(7, 42), (8, 42)])
    _run(spark, input_dir, output_dir, ckpt)
    rows = spark.read.parquet(output_dir).collect()
    assert len(rows) == 4  # one emission per agreeing chunk group (h=3 → 4 chunks)
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in rows} == {(7, 8, 0)}
    assert len({r["chunk_no"] for r in rows}) == 4


def test_popcount64_swar():
    import numpy as np

    from sosse_spark.streaming.neardup_stream import _popcount64

    xs = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF, 1 << 63, 0x5555555555555555], dtype=np.uint64)
    got = _popcount64(xs).astype(int).tolist()
    assert got == [0, 1, 2, 64, 1, 32]


def test_streaming_neardup_replay_is_idempotent(spark, tmp_root):
    """At-least-once upstream: a replayed (id, sig) row is skipped
    (first-sig-wins, same identity rule as streaming_urlseen) — no
    duplicate pair re-emission, no state growth."""
    import os as _os

    input_dir = _os.path.join(tmp_root, "rp_in")
    output_dir = _os.path.join(tmp_root, "rp_out")
    ckpt = _os.path.join(tmp_root, "rp_ckpt")
    base = 0x0123456789ABCDEF
    _write(spark, input_dir, [(1, base), (2, base ^ 1)])
    _run(spark, input_dir, output_dir, ckpt)
    n1 = spark.read.parquet(output_dir).count()
    # replay the SAME rows (new files, same ids) — and a changed sig
    # under an existing id, which first-sig-wins also skips
    _write(spark, input_dir, [(1, base), (2, base ^ 1), (1, base ^ 3)])
    _run(spark, input_dir, output_dir, ckpt)
    n2 = spark.read.parquet(output_dir).count()
    assert n2 == n1  # nothing re-emitted
    assert _pairs(spark, output_dir) == {(1, 2, 1)}
