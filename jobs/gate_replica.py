"""One-off replica of the DRIVER's correctness gate at a chosen scale
factor — the protocol CLAUDE.md prescribes whenever the 50-entry
certification window changes membership.

The driver certifies exactly the first 50 entries of
__spark_entry__.queries() in dict insertion order at sf0.01;
tests/test_entry_oracle.py replicates the compare at sf0.001 for speed.
Scale-sensitive divergence (guard arms, empty branches, quantile edges)
only shows up at the driver's scale, so this script re-runs the SAME
normalize-and-compare at sf0.01 (or any --sf-dir) with the driver-shaped
session: local[32], UTC, shuffle=32.

Usage:
    python jobs/gate_replica.py                 # first 50, sf0.01
    python jobs/gate_replica.py --all           # every oracle entry
    python jobs/gate_replica.py --sf-dir /root/testdata/sf0.001
"""

import argparse
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _normalize(rows, columns):
    # identical to tests/test_entry_oracle.py (and the driver's compare):
    # sort columns by name, round doubles to 9, NaN sentinel, sort rows
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true",
                    help="run every oracle entry, not just the first 50")
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--only", default=None,
                    help="comma-separated entry names to run (overrides --all/--window)")
    args = ap.parse_args()

    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/sosse-tests"
        os.makedirs(shm, exist_ok=True)
        os.environ["TMPDIR"] = shm
        tempfile.tempdir = None

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("gate-replica")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .config("spark.cleaner.periodicGC.interval", "30s")
        .config("spark.sql.maxPlanStringLength", "4096")
        .config("spark.local.dir", tempfile.gettempdir())
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = list(queries)
    if args.only:
        wanted = [n.strip() for n in args.only.split(",") if n.strip()]
        missing = [n for n in wanted if n not in queries]
        if missing:
            raise SystemExit(f"unknown entries: {missing}")
        names = wanted
    elif not args.all:
        names = names[: args.window]

    failures = []
    for pos, name in enumerate(names):
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"[{pos:3}] {name}: rows-only ({len(srows)} rows) "
                      f"{time.time()-t0:.1f}s")
                continue
            res = con.execute(oracles[name])
            dcols = [d[0].lower() for d in res.description]
            drows = res.fetchall()
            if sorted(scols) != sorted(dcols):
                failures.append((name, f"columns {scols} vs {dcols}"))
            elif len(srows) != len(drows):
                failures.append((name, f"rowcount {len(srows)} vs {len(drows)}"))
            else:
                sn = _normalize(srows, scols)
                dn = _normalize(drows, dcols)
                bad = [(a, b) for a, b in zip(sn, dn) if a != b]
                if bad:
                    failures.append((name, f"first value mismatch {bad[:2]}"))
            status = "FAIL" if failures and failures[-1][0] == name else "ok"
            print(f"[{pos:3}] {name}: {status} ({len(srows)} rows) "
                  f"{time.time()-t0:.1f}s")
        except Exception as e:  # noqa: BLE001 — report and continue
            failures.append((name, f"exception {type(e).__name__}: {e}"))
            print(f"[{pos:3}] {name}: EXCEPTION {e}")

    print(f"\n{len(names) - len(failures)}/{len(names)} green "
          f"at {args.sf_dir}")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
