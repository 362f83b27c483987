"""Dump ``explain("formatted")`` for named registered queries.

Usage: python tools/dump_plans.py <out_dir> <suffix> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each named query (all
registered queries when none are named) — the optimization-round
evidence files (``plans/r11/*_before.txt`` / ``*_after.txt``).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kingsfoil_seed_data_ingestor_spark import plans  # noqa: F401, E402
from kingsfoil_seed_data_ingestor_spark.plans.core import QUERIES  # noqa: E402
from kingsfoil_seed_data_ingestor_spark.session import (  # noqa: E402
    get_spark,
    pin_comparable_conf,
)


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or list(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-dump")
    pin_comparable_conf(spark)
    for name in names:
        df = QUERIES[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
