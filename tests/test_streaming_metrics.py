"""Watermarked windowed crawl metrics: windows finalize once the
watermark passes, late stragglers beyond it are dropped (bounded
state), append-mode emits each window exactly once."""

import os
from datetime import datetime

from pyspark.sql import functions as F

from sosse_spark.streaming.metrics_stream import windowed_crawl_metrics

_SCHEMA = "url string, status string, t timestamp"


def _run(spark, input_dir, output_dir, ckpt):
    raw = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(input_dir)
    )
    out = windowed_crawl_metrics(raw, "1 minute", "2 minutes")
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


def test_windowed_metrics_watermark_drops_stragglers(spark, tmp_root):
    input_dir = os.path.join(tmp_root, "ev_in")
    output_dir = os.path.join(tmp_root, "ev_out")
    ckpt = os.path.join(tmp_root, "ev_ckpt")
    t = lambda m, s=0: datetime(2024, 1, 1, 0, m, s)

    # run 1: events in minutes 0 and 1 (one run per drop: the file
    # source may reorder files WITHIN a run, but the event-time
    # watermark is checkpointed ACROSS runs, so the straggler in run 3
    # deterministically faces the watermark advanced by run 2)
    _write(
        spark,
        input_dir,
        [
            ("u1", "success", t(0, 10)),
            ("u2", "error", t(0, 40)),
            ("u3", "success", t(1, 5)),
        ],
    )
    _run(spark, input_dir, output_dir, ckpt)
    # run 2: advance event time to minute 5 → watermark = 3:00 passes
    # windows [0,1) and [1,2); plus an IN-TIME row for window [1,2)
    _write(spark, input_dir, [("u4", "redirect", t(1, 30)), ("u5", "success", t(5, 0))])
    _run(spark, input_dir, output_dir, ckpt)
    # run 3: a straggler for the long-closed window [0,1) — dropped
    _write(spark, input_dir, [("u6", "success", t(0, 50))])
    _run(spark, input_dir, output_dir, ckpt)

    got = {
        r["window_start"]: (r["fetched"], r["success"], r["errors"], r["redirects"])
        for r in spark.read.parquet(output_dir).collect()
    }
    assert got.get(t(0)) == (2, 1, 1, 0)  # straggler u6 NOT counted
    assert got.get(t(1)) == (2, 1, 0, 1)  # u3 + u4, cross-batch
    # rate column derived from the window length
    rates = {r["window_start"]: r["urls_per_sec"] for r in spark.read.parquet(output_dir).collect()}
    assert abs(rates[t(0)] - 2 / 60) < 1e-6

    # restart with new events: state store continues, closed windows
    # never re-emit (exactly-once append)
    _write(spark, input_dir, [("u7", "success", t(6, 1)), ("u8", "error", t(9, 0))])
    _run(spark, input_dir, output_dir, ckpt)
    out2 = spark.read.parquet(output_dir)
    assert out2.filter(F.col("window_start") == t(0)).count() == 1  # still exactly one row
