#!/usr/bin/env python3
"""Throwaway A/B profiler: old vs new frontier/scheduler plans, one
session, interleaved, best-of per variant.  Not part of the suite."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import make_spark, synthetic_frontier
from sosse_spark.operators.frontier import (
    bloom_build,
    bloom_prefilter,
    urlseen_dedup,
    with_bucket,
)
from sosse_spark.operators.scheduler import select_batch


def old_dedup(cands, seen, bloom, m_bits, k=5):
    deduped = cands.groupBy("url", "url_hash", "bucket", "collection_id").agg(
        F.max("crawl_recurse").alias("crawl_recurse"),
        F.min("disc_order").alias("disc_order"),
        F.first("url_domain").alias("url_domain"),
        F.first("url_path").alias("url_path"),
    )
    flagged = bloom_prefilter(deduped, bloom, m_bits, k)
    definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspects = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    survivors = suspects.join(
        seen.select("url", "collection_id"), ["url", "collection_id"], "left_anti"
    )
    return definitely_new.unionByName(survivors)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    now = F.lit("2024-01-03 00:00:00").cast("timestamp")

    frontier = synthetic_frontier(spark, n).cache()
    frontier.count()
    seen = with_bucket(frontier.select("url", F.lit(1).alias("collection_id")), 256).cache()
    seen.count()
    cand_n = n // 5
    cands = with_bucket(
        spark.range(cand_n).select(
            F.concat(
                F.lit("http://img"),
                F.pmod(F.col("id") * 7919, F.lit(1000)).cast("string"),
                F.lit(".example.com/doc/"),
                (F.col("id") * 3 % (n * 2)).cast("string"),
            ).alias("url"),
            F.lit(1).alias("collection_id"),
            F.lit(0).cast("int").alias("crawl_recurse"),
            F.col("id").alias("disc_order"),
            F.lit("h").alias("url_domain"),
            F.lit("/p").alias("url_path"),
        ),
        256,
    )
    budget = max(n // 5000, 50)

    # warmup both variants untimed
    select_batch(frontier, now, n // 10, per_host_budget=budget, salt_buckets=8,
                 exact_global_order=False, thin_rank=False).count()
    select_batch(frontier, now, n // 10, per_host_budget=budget, salt_buckets=8,
                 exact_global_order=False, thin_rank=True).count()

    res = {}
    for rnd in range(rounds):
        for name, fn in [
            ("sched_old", lambda: select_batch(frontier, now, n // 10, per_host_budget=budget,
                                               salt_buckets=8, exact_global_order=False,
                                               thin_rank=False).count()),
            ("sched_new", lambda: select_batch(frontier, now, n // 10, per_host_budget=budget,
                                               salt_buckets=8, exact_global_order=False,
                                               thin_rank=True).count()),
        ]:
            t0 = time.time()
            cnt = fn()
            dt = time.time() - t0
            res.setdefault(name, []).append(round(dt, 2))
            print(json.dumps({"variant": name, "round": rnd, "sec": round(dt, 2), "n": cnt}), flush=True)

        for name, k in [("bloom_old_k5", 5), ("bloom_new_k3", 3)]:
            t0 = time.time()
            bl = bloom_build(seen, None, m_bits=1 << 22, k=k).cache()
            bl.count()
            dt = time.time() - t0
            res.setdefault(name, []).append(round(dt, 2))
            print(json.dumps({"variant": name, "round": rnd, "sec": round(dt, 2)}), flush=True)

            dname = "dedup_old" if k == 5 else "dedup_new"
            t0 = time.time()
            if k == 5:
                cnt = old_dedup(cands, seen, bl, 1 << 22, k=5).count()
            else:
                cnt = urlseen_dedup(cands, seen, bl, m_bits=1 << 22, k=3).count()
            dt = time.time() - t0
            res.setdefault(dname, []).append(round(dt, 2))
            print(json.dumps({"variant": dname, "round": rnd, "sec": round(dt, 2), "n": cnt}), flush=True)
            bl.unpersist()

    print("BEST", json.dumps({k: min(v) for k, v in res.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
