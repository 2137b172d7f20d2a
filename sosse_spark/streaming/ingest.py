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


def ingest_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream over a corpus drop directory → validated rows."""
    raw = (
        spark.readStream.schema(CORPUS_STRUCT)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    stats = raw.mapInPandas(decode_stats_map_in_pandas, DECODE_STATS_SCHEMA)
    return (
        raw.join(stats.select("image_id", "decode_ok", "phash_match", "psnr_db"), "image_id")
        .withColumn("ingested_ok", F.col("decode_ok") & F.col("phash_match"))
    )


def run_ingest_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    metrics_path: Optional[str] = None,
) -> None:
    """Process everything currently in input_dir exactly once (resumable:
    the file-source checkpoint remembers processed files across runs)."""
    validated = ingest_stream(spark, input_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        deduped = batch_df.dropDuplicates(["image_id"])
        n = deduped.count()
        ok = deduped.filter(F.col("ingested_ok")).count()
        deduped.filter(F.col("ingested_ok")).write.mode("append").parquet(output_dir)
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
