"""As-of (point-in-time) join — the one non-equi join shape the
reference's data model implies (SURVEY.md §2.3: ``effective_date <=
DOS < deletion_date`` analyzer lookups, seed_data.py:316-323).

A naive ``left.join(right, (key ==) & (right.t <= left.t))`` plans as a
broadcast-nested-loop or cartesian at scale. The scalable form is the
union-window trick:

1. tag both sides and union them into one (key, t, side, payload) set;
2. one window per key ordered by (t, side) carries the most recent
   right-side payload forward (``last(..., ignorenulls=True)``);
3. keep left rows; their carried value IS the as-of match.

Cost: exactly one shuffle on the key (the window), regardless of how
many right rows precede each left row — no row explosion, no range
duplication. Ties (right.t == left.t): the right row sorts first, so
equality matches, same as SQL ``ASOF JOIN ... ON left.t >= right.t``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach ``value_cols`` of the latest right row
    with ``right_on <= left_on`` within the same ``by`` key (null when
    no right row precedes). Output: all left columns + value_cols.
    """
    # The whole right payload travels as ONE struct and is carried by a
    # single last(..., ignorenulls=True): the matched row's fields are
    # projected together, so a NULL field in the latest preceding right
    # row stays NULL (never backfilled from an older row) and multi-
    # column payloads can never be stitched from different right rows.
    rhs = right.select(
        F.col(right_by).alias("_k"),
        F.col(right_on).cast(dict(left.dtypes)[left_on]).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("_l")
            ).schema["_l"].dataType
        ).alias("_left"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_payload"),
    )
    lhs = left.select(
        F.col(left_by).alias("_k"),
        F.col(left_on).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        F.lit(None).cast(rhs.schema["_payload"].dataType).alias("_payload"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "_side",
        "_left",
        F.last("_payload", ignorenulls=True).over(w).alias("_match"),
    )
    out = carried.filter(F.col("_side") == 1)
    return out.select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"_match.{c}").alias(c) for c in value_cols],
    )
