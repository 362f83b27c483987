"""Skew-resistant operators: salting for hot keys.

AQE's skew-join handles oversized *join* partitions by splitting them
at runtime, and algebraic aggregates reduce map-side before the
shuffle — but a **window over a skewed partition key cannot be split**:
``row_number().over(Window.partitionBy(k))`` funnels every row of a hot
key through ONE task. At 100 TB one viral key (a boilerplate document,
a bot user) serializes the stage.

Salting restores parallelism for the decomposable cases: spread each
key over ``n_salts`` sub-groups with a deterministic salt, compute the
per-(key, salt) partial, then reduce the (tiny) partials per key. For
top-k the union of per-salt top-k supersets the true top-k, so the
two-phase result is EXACT — the same algebraic trick map-side partial
aggregation plays, extended to ranking.

The salt is a hash of stable row attributes, not ``rand()`` — results
are reproducible and engine-comparable (the DuckDB oracle for the
registered query computes plain per-key top-k; salting must be
invisible in the output).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_from: list[str], n_salts: int = 16) -> DataFrame:
    """Add a deterministic ``_salt`` in [0, n_salts) hashed from the
    ``salt_from`` columns (pick columns that distribute within a hot
    key — a row id, not the skewed key itself)."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(n_salts))
    )


def salted_top_k(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    salt_from: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Exact per-key top-k that survives a hot key.

    Phase 1 ranks within (key, salt) — the hot key's rows spread over
    ``n_salts`` parallel tasks and at most ``k·n_salts`` rows per key
    survive. Phase 2 ranks the survivors within the key alone — a
    bounded-size input, so the unsplittable window is now harmless.
    Output = the plain single-window top-k, bit for bit (every true
    top-k row is necessarily in its salt group's top-k).

    ``order_by`` must be a TOTAL order (include a tiebreaker column) —
    same requirement the single-window form has for determinism.
    """
    salted = with_salt(df, salt_from, n_salts)
    w1 = Window.partitionBy(*partition_by, "_salt").orderBy(*order_by)
    partial = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        partial.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )
