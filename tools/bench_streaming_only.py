"""Run ONLY bench.py's streaming micro-bench, in a fresh session, with
the exact bench methodology — for isolated A/Bs of streaming changes
and for the VERDICT r11 #3 noise re-measures.

Usage: python tools/bench_streaming_only.py [--sf DIR] [--reps N]
Prints one line per rep: the per-entry seconds dict.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from kingsfoil_seed_data_ingestor_spark.session import (  # noqa: E402
    get_spark,
    pin_comparable_conf,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    ))
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    probe = bench.cpu_probe()
    spark = get_spark(app_name="bench-streaming-only")
    pin_comparable_conf(spark)
    for _ in range(args.reps):
        out = bench.bench_streaming(spark, args.sf)
        print(json.dumps({"cpu_probe": probe, **out}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
