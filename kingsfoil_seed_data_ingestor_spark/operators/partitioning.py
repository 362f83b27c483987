"""Input-parallelism guard for CPU-amplifying operators.

A parquet row group is unsplittable, so a small file scans as ONE task
no matter how many cores the cluster has — and every narrow downstream
stage (explode, per-token hashing, Arrow batch kernels, map-side
partial aggregation) inherits that single partition. For operators
whose per-row work is heavy (simhash computes 64 digest-nibble parities
per token; shingling explodes every token), that serializes the whole
job on one core.

``fan_out`` repartitions ONLY when the input has fewer partitions than
the session's parallelism. At real scale (100 TB ⇒ thousands of
splits) it is a structural no-op — the condition can only fire when the
input is small, in which case the round-robin shuffle it inserts is by
definition cheap relative to the amplified CPU work it unlocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure ``df`` has at least ``min_partitions`` (default: the
    session's ``defaultParallelism``) partitions before a CPU-heavy
    stage. Downstream semantics must be row-order-independent (grouped
    aggregation, joins) — the repartition is round-robin."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
