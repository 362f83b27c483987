"""Snapshot diff (CDC) and change apply (MERGE) between two keyed
datasets.

The reference's version store answers "which VERSION is current"
(``app/services/ingestor.py`` two-phase versioning; our
``operators/versioning.py``) but has no operator for "what CHANGED
between version A and version B" — the changelog a downstream consumer
(cache invalidation, incremental re-train, audit) actually wants, and
the row-level primitive every table format (Delta/Iceberg/Hudi) builds
its CDC feed from. Two halves:

* :func:`snapshot_diff` — classify every key as ``added`` / ``removed``
  / ``changed`` (unchanged rows are dropped: a 100 TB snapshot pair
  with 0.1 % churn must emit 0.1 %, never the full table). One
  full-outer join co-partitioned on the key — the minimal plan for a
  diff: both sides shuffle on the key ONCE (or not at all when the
  snapshots are already bucketed/partitioned by key — the operator adds
  no repartition of its own), and all column comparison is null-safe
  JVM-side expression work on the joined row, no second pass.
* :func:`apply_changes` — replay a changelog onto the old snapshot:
  delete ``removed`` keys, upsert ``added``/``changed`` payloads
  (left-anti join + unionByName). ``apply_changes(old,
  snapshot_diff(old, new), keys)`` reconstructs ``new`` exactly — the
  roundtrip law the registered ``snapshot_merge_apply`` query pins
  against its oracle.

Output contract of :func:`snapshot_diff`: the key columns (coalesced
across sides), ``change_type`` (``added``/``removed``/``changed``),
``changed_cols`` (comma-joined sorted-by-schema-order payload column
names that differ; ``''`` for added/removed), and every payload column
twice as ``old_<col>`` / ``new_<col>`` (null on the absent side) so the
changelog is self-contained for both replay and audit.

At 100 TB: the join is the only exchange; comparison cost is linear in
rows, no UDFs; skewless by construction (keys are unique per side). For
repeated diffs against a slowly-changing base, bucket both snapshots on
the key (``operators/bucketed.py``) and the exchange disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ADDED = "added"
REMOVED = "removed"
CHANGED = "changed"


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Row-level changelog turning ``old`` into ``new``; see module doc.

    Both inputs must share a schema and be unique on ``keys`` (a
    snapshot, not a log). Payload columns = all non-key columns, in
    ``old``'s schema order.
    """
    payload = [c for c in old.columns if c not in keys]
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"snapshot schemas differ: {sorted(old.columns)} vs {sorted(new.columns)}"
        )
    o = old.select([F.col(c).alias(f"__o_{c}") for c in old.columns])
    n = new.select([F.col(c).alias(f"__n_{c}") for c in old.columns])
    cond = None
    for k in keys:
        eq = F.col(f"__o_{k}") == F.col(f"__n_{k}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")

    in_old = F.col(f"__o_{keys[0]}").isNotNull()
    in_new = F.col(f"__n_{keys[0]}").isNotNull()
    col_differs = [
        ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in payload
    ]
    any_diff = None
    for d in col_differs:
        any_diff = d if any_diff is None else (any_diff | d)
    change_type = (
        F.when(~in_old, F.lit(ADDED))
        .when(~in_new, F.lit(REMOVED))
        .when(any_diff, F.lit(CHANGED))
    )  # else NULL → unchanged, filtered below
    changed_cols = F.when(
        change_type == CHANGED,
        F.array_join(
            F.array_compact(
                F.array(
                    *[
                        F.when(d, F.lit(c))
                        for c, d in zip(payload, col_differs)
                    ]
                )
            ),
            ",",
        ),
    ).otherwise(F.lit(""))

    out_cols = (
        [
            F.coalesce(F.col(f"__o_{k}"), F.col(f"__n_{k}")).alias(k)
            for k in keys
        ]
        + [change_type.alias("change_type"), changed_cols.alias("changed_cols")]
        + [F.col(f"__o_{c}").alias(f"old_{c}") for c in payload]
        + [F.col(f"__n_{c}").alias(f"new_{c}") for c in payload]
    )
    return j.filter(change_type.isNotNull()).select(out_cols)


def apply_changes(
    old: DataFrame, changes: DataFrame, keys: list[str]
) -> DataFrame:
    """Replay a :func:`snapshot_diff` changelog onto ``old``: rows whose
    key appears in the changelog are dropped (left-anti join — covers
    ``removed`` and the old image of ``changed``), then ``added`` /
    ``changed`` keys re-enter with their ``new_*`` payload. Output
    schema = ``old``'s. The anti-join and the changelog projection
    shuffle only the (small) changelog when the churn rate is small —
    Spark broadcasts the right side under AQE — so replay cost is
    O(old + changes), the same class as one scan."""
    payload = [c for c in old.columns if c not in keys]
    upserts = changes.filter(F.col("change_type") != REMOVED).select(
        *keys, *[F.col(f"new_{c}").alias(c) for c in payload]
    )
    kept = old.join(changes.select(*keys), keys, "left_anti")
    return kept.select(old.columns).unionByName(upserts)
