"""Count Spark jobs per registered query — the fused-round witness.

Usage: python tools/count_jobs.py [--sf DIR] query1 query2 ...

Drains each query once to warm (codegen/caches), then drains again and
reports the number of Spark jobs the second drain submitted (via the
status tracker's cumulative job-id list). Job count is the durable
signal for per-round fixed cost in iterative operators: at 100 TB every
job is a full scheduling barrier.
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
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or list(QUERIES)

    spark = get_spark(app_name="kingsfoil-count-jobs")
    pin_comparable_conf(spark)
    tracker = spark.sparkContext.statusTracker()

    for n in names:
        drain(QUERIES[n].spark(spark, args.sf))  # warm pass
        spark.catalog.clearCache()
        before = len(tracker.getJobIdsForGroup())
        t0 = time.perf_counter()
        drain(QUERIES[n].spark(spark, args.sf))
        dt = time.perf_counter() - t0
        after = len(tracker.getJobIdsForGroup())
        spark.catalog.clearCache()
        print(f"{n:36s} jobs={after - before:4d}  {dt:7.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
