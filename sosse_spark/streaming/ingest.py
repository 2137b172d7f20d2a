"""Structured Streaming ingest: corpus parquet drops → validated
documents sink.

The reference's "stream" is a polling worker loop (SURVEY §2 note);
here the idiomatic Spark shape is a file-source stream: new corpus
parquet files landing in a directory are picked up incrementally,
streaming-deduped on image_id, enriched with payload-validation stats
(decode ok, phash match — Arrow mapInPandas), and appended to a parquet
sink with exactly-once file-source checkpointing.  foreachBatch emits
per-micro-batch metrics rows (≙ CrawlerStats minutely rows,
se/models.py:196-228).

Tests drive it with trigger=availableNow (bounded, deterministic).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sosse_spark.functions.images import DECODE_STATS_SCHEMA, decode_stats_map_in_pandas

__all__ = ["CORPUS_STRUCT", "ingest_stream", "run_ingest_available_now"]

CORPUS_STRUCT = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)


_VALIDATED_SCHEMA = T.StructType(
    CORPUS_STRUCT.fields
    + [
        T.StructField("decode_ok", T.BooleanType()),
        T.StructField("phash_match", T.BooleanType()),
        T.StructField("psnr_db", T.DoubleType()),
    ]
)


def _validate_kernel(batches):
    """ONE pass: payload columns + validation stats emitted together.
    (A stats-derived self-join here would be a stream-stream join —
    unbounded state + a second source scan; this kernel reuses the
    decode-stats logic row-aligned instead.)"""
    for pdf in batches:
        stats = next(decode_stats_map_in_pandas(iter([pdf])))
        out = pdf.copy()
        out["decode_ok"] = stats["decode_ok"].to_numpy()
        out["phash_match"] = stats["phash_match"].to_numpy()
        out["psnr_db"] = stats["psnr_db"].to_numpy()
        yield out


def ingest_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream over a corpus drop directory → validated rows (single
    source scan; PSNR ≥ 40 is part of the ingest gate per the north
    rule's decoded-pixel invariant — NaN/None psnr rows fail it).

    Cross-batch dedup is Spark's stateful streaming dropDuplicates:
    seen image_ids live in the state store (checkpointed, restart-safe),
    so each micro-batch pays one state lookup per row — the sink is
    NEVER rescanned, unlike a per-batch anti-join against the output
    directory, whose cost grows with everything ever ingested.  Dedup
    runs BEFORE validation so duplicate payloads are not re-decoded.
    """
    raw = (
        spark.readStream.schema(CORPUS_STRUCT)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    deduped = raw.dropDuplicates(["image_id"])
    validated = deduped.mapInPandas(_validate_kernel, _VALIDATED_SCHEMA)
    return validated.withColumn(
        "ingested_ok",
        F.col("decode_ok") & F.col("phash_match") & (F.coalesce(F.col("psnr_db"), F.lit(0.0)) >= 40.0),
    )


def run_ingest_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    metrics_path: Optional[str] = None,
) -> None:
    """Process everything currently in input_dir exactly once (resumable:
    the file-source checkpoint remembers processed files across runs).

    The sink layout is one ingest_batch=N directory per micro-batch.  A
    sink written by the pre-state-store version (flat parquet files at
    the root) cannot be mixed with that layout — Spark rejects the
    conflicting partition structure on read — and its contents are not
    in the new dedup state, so resuming over it would also re-ingest.
    Refuse loudly instead of corrupting: migrate by re-running into a
    fresh output_dir/checkpoint pair.
    """
    if os.path.isdir(output_dir) and any(
        name.endswith(".parquet") for name in os.listdir(output_dir)
    ):
        raise ValueError(
            f"{output_dir} holds a legacy flat-file ingest sink; re-ingest into a "
            "fresh output_dir (+ fresh checkpoint) — mixing layouts corrupts reads"
        )
    validated = ingest_stream(spark, input_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # cross-batch dedup already happened upstream in the stateful
        # streaming dropDuplicates — batch_df carries only first-ever
        # occurrences.  Crash replay: foreachBatch side effects are
        # at-least-once, so the write must be idempotent — one OVERWRITE
        # directory per micro-batch id means a batch retried after a
        # crash mid-write rewrites its own dir and the sink stays
        # exactly-once, with no sink rescan/anti-join on any path.
        batch_df.persist()
        n = batch_df.count()
        ok_rows = batch_df.filter(F.col("ingested_ok"))
        ok_rows.write.mode("overwrite").parquet(
            os.path.join(output_dir, f"ingest_batch={batch_id}")
        )
        ok = ok_rows.count()
        batch_df.unpersist()
        if metrics_path:
            with open(metrics_path, "a") as fh:
                fh.write(
                    json.dumps(
                        {"batch_id": batch_id, "rows": n, "ok": ok, "ts": time.time()}
                    )
                    + "\n"
                )

    q = (
        validated.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
