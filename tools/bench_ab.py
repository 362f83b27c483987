"""A/B harness for the suite-level bench-drift investigation
(VERDICT r6 #1 / PERF_NOTES §r7).

Runs ``bench.bench_batch`` (EXACT driver methodology: cold pass +
best-of-2 warm, cache-clear + GC fence per execution) over an
arbitrary subset of the registry in THIS fresh process, then dumps the
per-query warm table plus the JVM diagnostics snapshot. Comparing a
35-query run against a 94-query run in fresh JVMs isolates whether
per-query inflation is a function of how much OTHER work the same JVM
session has done (codegen cache, JIT code cache, metaspace, GC) or of
the measurement environment.

Usage::

    python tools/bench_ab.py --out /tmp/ab_full.json            # all
    python tools/bench_ab.py --names-file /tmp/r5common.json \
        --out /tmp/ab_sub.json                                  # subset
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from kingsfoil_seed_data_ingestor_spark.plans.core import QUERIES  # noqa: E402
from kingsfoil_seed_data_ingestor_spark.session import (  # noqa: E402
    get_spark,
    pin_comparable_conf,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--names-file", default=None, help="JSON list of query names")
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--prime",
        action="store_true",
        help="before timing the subset, execute every NON-subset registry "
        "query once (drained, untimed) — ages the session the way the "
        "full bench does, isolating accumulated-session-state effects "
        "from the subset's own cost",
    )
    args = ap.parse_args()

    if args.names_file:
        names = json.load(open(args.names_file))
        unknown = [n for n in names if n not in QUERIES]
        if unknown:
            print(f"unknown: {unknown}", file=sys.stderr)
            return 1
        subset = {n: QUERIES[n] for n in names}
    else:
        subset = dict(QUERIES)

    spark = get_spark(app_name="kingsfoil-bench-ab")
    pin_comparable_conf(spark)
    if args.prime:
        for n, q in QUERIES.items():
            if n in subset:
                continue
            try:
                bench.drain(q.spark(spark, args.sf))
            except Exception as exc:
                print(f"prime {n}: {exc}", file=sys.stderr)
            spark.catalog.clearCache()
    cold, warm, _retries = bench.bench_batch(spark, args.sf, queries=subset)
    diag = bench.jvm_diagnostics(spark)
    out = {
        "n_queries": len(subset),
        "sf": args.sf,
        "warm_total": round(sum(t for t in warm.values() if t >= 0), 4),
        "cold_total": round(sum(t for t in cold.values() if t >= 0), 4),
        "warm": warm,
        "cold": cold,
        "jvm": diag,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps({"n": len(subset), "warm_total": out["warm_total"],
                      "jvm": diag}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
