#!/usr/bin/env python3
"""Time a subset of declared queries with the frozen bench.py methodology
(same session config, same df.count() action) — for in-round A/B work.

Usage: SPARK_GRAFT_SF_DIR=... python BENCH/time_queries.py name [name...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import bench

    spark = bench.make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()
    # warmup (same spirit as bench.py)
    spark.read.parquet(f"{sf_dir}/events.parquet").limit(1000).groupBy().count().collect()
    qs["f15_priority_order"](spark, sf_dir).count()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
        print(f"  {name}: {out[name]}s ({n} rows)", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
