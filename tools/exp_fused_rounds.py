"""Experiment: fused vs unfused min-label rounds — jobs, wall, plan.

Usage: python tools/exp_fused_rounds.py [fuse]
Runs connected_components' minlabel phase on a fixed spider+chain graph
with the given fuse factor, reports job count / wall / round count.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kingsfoil_seed_data_ingestor_spark.operators import components as CC  # noqa: E402
from kingsfoil_seed_data_ingestor_spark.operators.caching import CacheScope  # noqa: E402
from kingsfoil_seed_data_ingestor_spark.session import get_spark, pin_comparable_conf  # noqa: E402


def main() -> int:
    fuse = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark(app_name="exp-fused-rounds")
    pin_comparable_conf(spark)
    tracker = spark.sparkContext.statusTracker()

    # spider of doubling legs — the collapsing-frontier fixture
    edges, nid = [], 1
    for leg in (1, 2, 4, 8, 16, 32, 64):
        prev = 0
        for _ in range(leg):
            edges.append((prev, nid))
            prev, nid = nid, nid + 1
    df = spark.createDataFrame(edges, "i long, j long")

    def run():
        scope = CacheScope()
        labels, conv, rounds = CC._minlabel_phase(
            df, "i", "j", 3, scope, jump=True, extend=True, fuse=fuse
        )
        labels.write.format("noop").mode("overwrite").save()
        scope.release()
        return conv, rounds

    run()  # warm
    spark.catalog.clearCache()
    before = len(tracker.getJobIdsForGroup())
    t0 = time.perf_counter()
    conv, rounds = run()
    dt = time.perf_counter() - t0
    after = len(tracker.getJobIdsForGroup())
    print(f"fuse={fuse} jobs={after - before} wall={dt:.3f}s conv={conv} rounds={rounds}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
