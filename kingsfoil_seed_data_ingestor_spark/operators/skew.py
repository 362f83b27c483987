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

from kingsfoil_seed_data_ingestor_spark.operators.caching import (
    CacheScope,
    scope_or_own,
)


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


def bucketed_prefix_sum(
    df: DataFrame,
    partition_by: list[str],
    order_col: str,
    val_col: str,
    out_col: str = "cum",
    bucket_rows: int = 1024,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Exact running sum per key, ordered by ``order_col``, that never
    funnels a whole key stratum through one task.

    ``F.sum(v).over(Window.partitionBy(K).orderBy(o))`` is the
    unsplittable-window hazard again — only now for prefix sums
    (sequence packing, byte offsets, cumulative quotas): every row of a
    key runs through ONE task, and a key stratum is unbounded at 100 TB.
    Salting can't help (a prefix sum is order-dependent), but a
    two-phase scan does — the textbook parallel prefix sum:

    1. split the order domain into deterministic buckets
       (``floor(order_col / bucket_rows)`` — no range-sampling, so the
       split is stable across stage retries) and running-sum within
       ``(K, bucket)``: parallel across buckets;
    2. per-bucket totals → running-sum *offsets* across buckets within
       the key (one narrow row per non-empty bucket per key — the only
       single-task-per-key stage, shrunk ``bucket_rows``-fold; recurse
       if even that is too big), broadcast back and add.

    Requires ``order_col`` to be non-negative integral and unique per
    key (ids, byte positions). Output = input columns + ``out_col``,
    bit-identical to the single-window form.
    """
    scope, own = scope_or_own(scope)
    # persisted because local sums AND bucket totals both consume it —
    # the alternative recomputes the (possibly expensive) val_col
    # expression once per branch
    bucketed = scope.persist(
        df.withColumn("_bkt", F.floor(F.col(order_col) / F.lit(bucket_rows)))
    )
    w_local = (
        Window.partitionBy(*partition_by, "_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn("_local_cum", F.sum(val_col).over(w_local))
    totals = bucketed.groupBy(*partition_by, "_bkt").agg(
        F.sum(val_col).alias("_tot")
    )
    w_off = (
        Window.partitionBy(*partition_by)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *partition_by,
        "_bkt",
        F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off"),
    )
    out = (
        local.join(F.broadcast(offsets), [*partition_by, "_bkt"])
        .withColumn(out_col, F.col("_local_cum") + F.col("_off"))
        .drop("_bkt", "_local_cum", "_off")
    )
    return scope.attach(out) if own else out
