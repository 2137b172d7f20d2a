#!/usr/bin/env python3
"""Raw-CPU control for the scaling evidence: N independent busy
processes (no Spark, no shared state, no I/O) at two process counts.
Whatever ratio THIS shows is the sandbox's intrinsic ceiling for the
same N→4N comparison — a Spark job cannot scale past the host.

Usage: python BENCH/cpu_control.py [seconds_per_leg]
Prints one JSON line with ops/sec at each level and the ceiling
efficiency; interleaves legs (lo,hi,lo,hi) best-per-level like
BENCH/scaling.py.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _burn(stop_t: float, out) -> None:
    # integer work: no memory bandwidth, no SIMD variance
    x, n = 1469598103934665603, 0
    while time.time() < stop_t:
        for _ in range(10_000):
            x = (x * 1099511628211) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 33
        n += 10_000
    out.put(n)


def leg(n_procs: int, seconds: float) -> float:
    q: mp.Queue = mp.Queue()
    stop_t = time.time() + seconds
    ps = [mp.Process(target=_burn, args=(stop_t, q)) for _ in range(n_procs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / seconds


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    lo = int(os.environ.get("SCALING_CPUS_LO", "8"))
    hi = int(os.environ.get("SCALING_CPUS_HI", str(lo * 4)))
    legs = []
    for n in (lo, hi, lo, hi):
        r = leg(n, seconds)
        legs.append({"procs": n, "ops_per_sec": round(r)})
        print(json.dumps(legs[-1]), file=sys.stderr)
    best_lo = max(l["ops_per_sec"] for l in legs if l["procs"] == lo)
    best_hi = max(l["ops_per_sec"] for l in legs if l["procs"] == hi)
    print(
        json.dumps(
            {
                "lo_procs": lo,
                "hi_procs": hi,
                "best_lo_ops": best_lo,
                "best_hi_ops": best_hi,
                "ceiling_efficiency": round((best_hi / best_lo) / (hi / lo), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
