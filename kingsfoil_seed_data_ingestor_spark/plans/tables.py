"""Testdata table access.

The driver testdata (TESTDATA.md) is a TPC-H-ish star schema plus
`events`, `documents`, `embeddings` — one parquet file per table.
Reading through this module keeps every query on the same loader so
scan options stay consistent (columnar parquet scans; Catalyst handles
column pruning / predicate pushdown from the lazy plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # events.ts is parquet TIMESTAMP(NANOS) — beyond Spark's µs
        # precision. Read as epoch-nanos (`nanosAsLong`, see session.py),
        # keep the exact value as ts_ns and derive the µs timestamp the
        # same way DuckDB does at read time (truncation), so event-time
        # results are bit-identical across engines.
        # integer `div`, NOT `/` — double division loses precision at
        # epoch-nanos magnitude (~1.7e18 exceeds double's 53-bit mantissa)
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df
