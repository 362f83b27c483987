"""Dev harness: time a subset of registered queries.

Usage: python tools/timeq.py [--sf DIR] [--reps N] query1 query2 ...
(no names = all). Mirrors bench.py methodology: 2 warm passes at
sf0.001 + 1 at target, then a GC-fenced timed pass.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kingsfoil_seed_data_ingestor_spark import plans  # noqa: F401
from kingsfoil_seed_data_ingestor_spark.plans.core import QUERIES
from kingsfoil_seed_data_ingestor_spark.session import get_spark, pin_comparable_conf


def drain(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 1

    spark = get_spark(app_name="kingsfoil-timeq")
    pin_comparable_conf(spark)
    warm_dir = "/root/testdata/sf0.001"
    for wdir in [warm_dir, warm_dir, args.sf]:
        for n in names:
            try:
                drain(QUERIES[n].spark(spark, wdir))
            except Exception as e:  # surfaces in the timed run
                print(f"warm {n}: {type(e).__name__}: {e}", file=sys.stderr)
            spark.catalog.clearCache()

    for _ in range(args.reps):
        total = 0.0
        for n in names:
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            drain(QUERIES[n].spark(spark, args.sf))
            dt = time.perf_counter() - t0
            total += dt
            print(f"{n:32s} {dt:8.3f}s")
        print(f"{'TOTAL':32s} {total:8.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
