"""Local stand-in for the driver's correctness gate.

Runs every registered query's Spark plan AND its DuckDB oracle at the
given scale factor, canonicalizes both results (columns sorted by name,
rows sorted), and reports row-count / schema / exact-value matches.
Catches oracle drift before the driver does.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from kingsfoil_seed_data_ingestor_spark.session import get_spark, pin_comparable_conf  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True, key=lambda s: s.map(str))


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if (a is None or a is pd.NaT or (isinstance(a, float) and math.isnan(a))) and (
        b is None or b is pd.NaT or (isinstance(b, float) and math.isnan(b))
    ):
        return True
    return a == b or str(a) == str(b)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="correctness-check")
    pin_comparable_conf(spark)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = queries(), oracle_sql()
    failures = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            continue
        if sql is None:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle — rows-only check)")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            continue

        s, o = canon(sdf), canon(odf)
        problems = []
        if list(s.columns) != list(o.columns):
            problems.append(f"columns differ: spark={list(s.columns)} oracle={list(o.columns)}")
        elif len(s) != len(o):
            problems.append(f"row counts differ: spark={len(s)} oracle={len(o)}")
        else:
            mismatch = 0
            first = None
            for i in range(len(s)):
                for c in s.columns:
                    if not values_equal(s.iloc[i][c], o.iloc[i][c]):
                        mismatch += 1
                        if first is None:
                            first = (i, c, s.iloc[i][c], o.iloc[i][c])
            if mismatch:
                problems.append(f"{mismatch} cell mismatches; first={first}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(s)} rows")

    print(f"\n{checked - len(failures)}/{checked} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
