"""Structured Streaming ingest: incremental file pickup, exactly-once
across restarts (file-source checkpoint), validation gating."""

import os

from pyspark.sql import functions as F

from sosse_spark.sources.corpus import corpus_df
from sosse_spark.streaming.ingest import run_ingest_available_now


def test_ingest_available_now_exactly_once(spark, tmp_root):
    input_dir = os.path.join(tmp_root, "drops")
    output_dir = os.path.join(tmp_root, "docs")
    ckpt = os.path.join(tmp_root, "ckpt")
    metrics = os.path.join(tmp_root, "metrics.jsonl")

    corpus_df(spark, 20, partitions=2).write.mode("overwrite").parquet(input_dir)
    run_ingest_available_now(spark, input_dir, output_dir, ckpt, metrics)
    out1 = spark.read.parquet(output_dir)
    assert out1.count() == 20
    assert out1.filter(~F.col("ingested_ok")).count() == 0

    # second drop: only NEW files are processed on restart (exactly-once)
    corpus_df(spark, 35, partitions=2).filter(F.col("image_id") > "img-000000000019").write.mode(
        "append"
    ).parquet(input_dir)
    run_ingest_available_now(spark, input_dir, output_dir, ckpt, metrics)
    out2 = spark.read.parquet(output_dir)
    assert out2.count() == 35
    assert out2.select("image_id").distinct().count() == 35

    # third run with nothing new: no duplicates appended
    run_ingest_available_now(spark, input_dir, output_dir, ckpt, metrics)
    assert spark.read.parquet(output_dir).count() == 35

    # fourth drop REPLAYS already-ingested image_ids in new files: the
    # stateful streaming dropDuplicates (state-store backed, restart-
    # safe) must drop them without ever rescanning the sink
    corpus_df(spark, 10, partitions=1).write.mode("append").parquet(input_dir)
    run_ingest_available_now(spark, input_dir, output_dir, ckpt, metrics)
    out4 = spark.read.parquet(output_dir)
    assert out4.count() == 35
    assert out4.select("image_id").distinct().count() == 35
    # the dedup state lives in the streaming state store, not the sink
    assert os.path.isdir(os.path.join(ckpt, "state"))
