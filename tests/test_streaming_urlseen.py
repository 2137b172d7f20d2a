"""Stateful streaming URL-seen dedup (applyInPandasWithState):
first-occurrence semantics across micro-batches AND across query
restarts (state-store checkpoint)."""

import os

from pyspark.sql import functions as F

from sosse_spark.streaming.urlseen_stream import streaming_urlseen

_SCHEMA = "url string, collection_id int"


def _run(spark, input_dir, output_dir, ckpt):
    raw = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(input_dir)
    )
    out = streaming_urlseen(raw)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _write(spark, input_dir, urls):
    spark.createDataFrame([(u, 1) for u in urls], _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)


def test_streaming_urlseen_dedups_across_batches_and_restarts(spark, tmp_root):
    input_dir = os.path.join(tmp_root, "urls_in")
    output_dir = os.path.join(tmp_root, "urls_out")
    ckpt = os.path.join(tmp_root, "ckpt")

    # two files → two micro-batches within one run; overlap between them
    _write(spark, input_dir, [f"http://h/{i}" for i in range(10)] + ["http://h/3"])
    _write(spark, input_dir, [f"http://h/{i}" for i in range(5, 15)])
    _run(spark, input_dir, output_dir, ckpt)
    got1 = spark.read.parquet(output_dir)
    urls1 = [r.url for r in got1.collect()]
    assert len(urls1) == 15  # 0..14 once each, in-batch + cross-batch dups dropped
    assert len(set(urls1)) == 15

    # restart with a third file: state survives the checkpoint — only
    # the genuinely new urls come out
    _write(spark, input_dir, [f"http://h/{i}" for i in range(12, 20)])
    _run(spark, input_dir, output_dir, ckpt)
    got2 = spark.read.parquet(output_dir)
    assert got2.count() == 20
    assert got2.select("url").distinct().count() == 20
    # derived identity matches the batch engine's (bucket = pmod(
    # xxhash64(url), n_buckets) with the CrawlEngine default 16)
    row = got2.filter(F.col("url") == "http://h/3").collect()[0]
    import pyspark.sql.functions as FF
    expect = spark.range(1).select(FF.xxhash64(FF.lit("http://h/3")).alias("h")).collect()[0]["h"]
    assert row.url_hash == expect and row.bucket == expect % 16

    # identity is (url, collection_id), matching the batch anti-join:
    # an already-seen URL arriving under a NEW collection admits
    spark.createDataFrame([("http://h/3", 2), ("http://h/4", 1)], _SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(input_dir)
    _run(spark, input_dir, output_dir, ckpt)
    got3 = spark.read.parquet(output_dir)
    assert got3.count() == 21
    assert got3.filter((F.col("url") == "http://h/3") & (F.col("collection_id") == 2)).count() == 1


def test_kernel_hash_collision_falls_through_to_exact_check():
    """An int64 pair-hash collision between DISTINCT keys must not drop
    a URL: the hash prefilter positive falls through to the exact key
    set (the bloom/exact invariant, applied to the streaming path)."""
    from sosse_spark.streaming.urlseen_stream import _dedupe_kernel
    import pandas as pd

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    st = FakeState()
    pdf1 = pd.DataFrame(
        {"bucket": [0], "url": ["http://h/a"], "url_hash": [11], "collection_id": [1],
         "pair_hash": [42]}
    )
    out1 = pd.concat(list(_dedupe_kernel((0,), iter([pdf1]), st)))
    assert list(out1["url"]) == ["http://h/a"]

    # same pair_hash, different exact key → must still be emitted;
    # a true duplicate of the first key → dropped
    pdf2 = pd.DataFrame(
        {"bucket": [0, 0], "url": ["http://h/b", "http://h/a"], "url_hash": [12, 11],
         "collection_id": [1, 1], "pair_hash": [42, 42]}
    )
    out2 = pd.concat(list(_dedupe_kernel((0,), iter([pdf2]), st)))
    assert list(out2["url"]) == ["http://h/b"]

    # and the collided key is now itself remembered exactly
    out3 = list(_dedupe_kernel((0,), iter([pdf2]), st))
    assert out3 == []
