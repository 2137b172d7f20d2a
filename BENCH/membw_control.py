#!/usr/bin/env python3
"""Memory-bandwidth control for the scaling evidence: N independent
processes each streaming over a private 256 MB numpy buffer (copy +
add — pure load/store traffic, no Spark, no shared state).  The
frontier-dedup job's per-row work is exchange/hash/sort — load/store
bound, not register bound — so THIS control, not the integer busy-loop
(cpu_control.py), is the host ceiling that class of job can reach when
core count quadruples on one box: cores scale 4x, the memory controller
does not.

Usage: python BENCH/membw_control.py [seconds_per_leg]
Interleaves lo/hi legs, best per level, like BENCH/scaling.py.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _stream(seconds: float, out) -> None:
    import numpy as np

    # allocate + fault the pages BEFORE the timing window — the control
    # must measure steady-state load/store traffic, not page faults
    a = np.ones(8 * 1024 * 1024, dtype=np.float64)  # 64 MB
    b = np.empty_like(a)
    np.copyto(b, a)
    b += 1.0
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        np.copyto(b, a)
        b += 1.0
        n += 1
    out.put(n / (time.time() - t0))


def leg(n_procs: int, seconds: float) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_stream, args=(seconds, q)) for _ in range(n_procs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 15.0
    lo = int(os.environ.get("SCALING_CPUS_LO", "8"))
    hi = int(os.environ.get("SCALING_CPUS_HI", str(lo * 4)))
    best = {lo: 0.0, hi: 0.0}
    for n in (lo, hi, lo, hi):
        ops = leg(n, seconds)
        print(json.dumps({"procs": n, "passes_per_sec": round(ops, 2)}), file=sys.stderr)
        best[n] = max(best[n], ops)
    eff = (best[hi] / best[lo]) / (hi / lo)
    print(
        json.dumps(
            {
                "lo_procs": lo,
                "hi_procs": hi,
                "best_lo_passes": round(best[lo], 2),
                "best_hi_passes": round(best[hi], 2),
                "membw_ceiling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
