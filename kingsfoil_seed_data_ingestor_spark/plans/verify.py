"""Cross-engine oracle comparison — the correctness gate's core.

Shared by ``tools/check_correctness.py`` (manual, any sf) and
``tests/test_oracle_parity.py`` (pytest, sf0.001) so that EVERY
registered oracle is a hard test gate regardless of how many queries
the external driver's capped correctness window happens to cover.

Canonicalization mirrors the driver: columns sorted by name, rows
sorted by stringified values, exact cell equality (NaN==NaN, None
families unified, everything else compared as-is with a string
fallback for dtype wrappers).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

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


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """A DuckDB connection with every testdata table as a view."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    return df.sort_values(
        by=list(df.columns), ignore_index=True, key=lambda s: s.map(str)
    )


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


def compare_frames(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Problems between a Spark result and its oracle result ([] = match)."""
    s, o = canon(sdf), canon(odf)
    if list(s.columns) != list(o.columns):
        return [f"columns differ: spark={list(s.columns)} oracle={list(o.columns)}"]
    if len(s) != len(o):
        return [f"row counts differ: spark={len(s)} oracle={len(o)}"]
    mismatch, first = 0, None
    for i in range(len(s)):
        for c in s.columns:
            if not values_equal(s.iloc[i][c], o.iloc[i][c]):
                mismatch += 1
                if first is None:
                    first = (i, c, s.iloc[i][c], o.iloc[i][c])
    if mismatch:
        return [f"{mismatch} cell mismatches; first={first}"]
    return []
