#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency ≥ 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the driver instruction we
run the IDENTICAL frontier-dedup + fetch-schedule job on the SAME input
at two parallelism levels — local[8] and local[32] — and report URLs/sec
at both plus efficiency = (throughput_32 / throughput_8) / 4.

The job is the north-rule core: eligibility filter → salted per-host
politeness window → global top-N claim → Bloom-prefiltered URL-seen
dedup of discovered candidates.  Input: deterministic synthetic frontier
(default 10^7 rows; the 10^10 target is the same column algebra over
more partitions — extrapolation documented in BENCH/BASELINE.md).

Usage: python BENCH/scaling.py [n_frontier] — writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_job(cpus: int, n_frontier: int) -> dict:
    from bench import make_spark, synthetic_frontier
    from sosse_spark.operators.frontier import bloom_build, urlseen_dedup, with_bucket
    from sosse_spark.operators.scheduler import select_batch

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        frontier = synthetic_frontier(spark, n_frontier).cache()
        n = frontier.count()  # materialize input outside the timed section

        seen = with_bucket(frontier.select("url", F.lit(1).alias("collection_id")), 256).cache()
        seen.count()

        t0 = time.time()
        now = F.lit("2024-01-03 00:00:00").cast("timestamp")
        batch = select_batch(
            frontier, now, batch_size=n_frontier // 10, per_host_budget=max(n_frontier // 5000, 50),
            salt_buckets=8,
        )
        n_batch = batch.count()

        bloom = bloom_build(seen, None, m_bits=1 << 24).cache()
        bloom.count()

        cand_n = n_frontier // 5
        cands = with_bucket(
            spark.range(cand_n).select(
                F.concat(
                    F.lit("http://img"),
                    F.pmod(F.col("id") * 7919, F.lit(1000)).cast("string"),
                    F.lit(".example.com/doc/"),
                    (F.col("id") * 3 % (n_frontier * 2)).cast("string"),
                ).alias("url"),
                F.lit(1).alias("collection_id"),
                F.lit(0).cast("int").alias("crawl_recurse"),
                F.col("id").alias("disc_order"),
                F.lit("h").alias("url_domain"),
                F.lit("/p").alias("url_path"),
            ),
            256,
        )
        n_new = urlseen_dedup(cands, seen, bloom, m_bits=1 << 24).count()
        dt = time.time() - t0

        processed = n + cand_n  # frontier rows scanned+ranked, candidates deduped
        return {
            "cpus": cpus,
            "n_frontier": n,
            "n_batch": n_batch,
            "n_candidates": cand_n,
            "n_new": n_new,
            "seconds": round(dt, 2),
            "urls_per_sec": round(processed / dt, 1),
        }
    finally:
        spark.stop()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("SCALING_N", "10000000"))
    r8 = run_job(8, n)
    print(json.dumps(r8), file=sys.stderr)
    r32 = run_job(32, n)
    print(json.dumps(r32), file=sys.stderr)
    eff = (r32["urls_per_sec"] / r8["urls_per_sec"]) / 4.0

    md = f"""# BENCH/BASELINE.md — measured scaling evidence

North-rule criterion: frontier-dedup + fetch-schedule throughput scaling
efficiency >= 0.8 from N to 4N executors.  No real cluster in this
sandbox, so (per driver instruction) the IDENTICAL job ran at two local
parallelism levels on the same input.

## Job

eligibility filter -> salted per-host politeness window -> global top-N
claim -> partitioned-Bloom-prefiltered URL-seen dedup, over a
deterministic synthetic frontier of {r8['n_frontier']:,} URLs
(zipf-skewed hosts) + {r8['n_candidates']:,} candidate links.

## Results

| parallelism | wall sec | URLs/sec |
|---|---|---|
| local[8]  | {r8['seconds']} | {r8['urls_per_sec']:,} |
| local[32] | {r32['seconds']} | {r32['urls_per_sec']:,} |

**Scaling efficiency (8 -> 32 cores) = (T32/T8)/4 = {eff:.3f}**
(target >= 0.8: {"PASS" if eff >= 0.8 else "MISS"})

## Extrapolation to 10^10 URLs

The job is pure column algebra + two bounded windows + one
bucket-cogrouped Bloom probe + one thin anti-join; no stage collects
more than the round batch to the driver and every shuffle is keyed by
url-hash bucket or host.  Cost is O(rows/partition); at 10^10 rows with
1000 executors (~10^7 rows/core, the same per-core load as this
measurement at local[8..32]) per-round wall time stays in the same
regime, with the caveat that the frontier MERGE rewrites only touched
buckets (see sosse_spark/sources/tables.py).

Raw: {json.dumps(r8)}
     {json.dumps(r32)}
"""
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    with open(out, "w") as fh:
        fh.write(md)
    print(md)


if __name__ == "__main__":
    main()
