"""Data-layout operators: partition-pruned and range-clustered writes.

At 100 TB the fastest scan is the one that never reads the file. Two
complementary layout disciplines make that happen, both plain Spark
writers here so every downstream query inherits the pruning for free:

* **Hive partitioning** (`write_partitioned`): low-cardinality
  predicate columns (event_type, ingest date) become directory keys;
  a filter on them is resolved by the FILE INDEX — pruned partitions
  are never listed into the scan (`PartitionFilters` in the plan, zero
  I/O). This is the coarse knife: directory count = partition-value
  product, so it is for columns with tens-to-thousands of values, not
  keys.
* **Range clustering** (`write_range_clustered`): within (or instead
  of) directory partitions, `repartitionByRange + sortWithinPartitions`
  lays rows out so each file covers a narrow slice of the cluster
  column. Parquet stores per-row-group min/max; a range predicate then
  skips whole files/row groups whose stats cannot match. This is the
  fine knife for high-cardinality columns (timestamps, ids) where
  directories are impossible — the single-column special case of
  Z-ordering.

``files_touched`` measures the effect from the OUTSIDE — the distinct
files that actually produced rows for a filtered read — which is what
the layout tests pin: a narrow range filter over a range-clustered
table touches ~1 of N files; the same filter over a round-robin layout
touches all N.

Reference parity note: the reference stores row batches per version
partition (``app/services/ingestor.py`` write path) with no intra-file
ordering contract; this module is part of the beyond-reference scale
surface (SURVEY.md §7.2), and `VersionStore.write_records` already
uses the directory-partition half of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
) -> None:
    """Hive-partitioned parquet write. ``partition_cols`` become
    directory keys (pruned by the file index before any I/O);
    ``sort_cols`` additionally orders rows inside each output file so
    range predicates on them skip row groups via parquet min/max
    stats. One output file per (shuffle partition × directory) — the
    repartition on the partition keys keeps that to one file per
    directory here; production would size it by target file size."""
    out = df.repartition(*[F.col(c) for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int,
) -> None:
    """Range-clustered parquet write: global range partitioning on
    ``cluster_col`` (contiguous, non-overlapping slices per file via a
    sampled range boundary exchange) + an in-file sort, so parquet
    min/max stats make range predicates skip non-matching files
    entirely."""
    range_layout(df, cluster_col, n_files).write.mode("overwrite").parquet(path)


def files_touched(spark: SparkSession, path: str, predicate) -> tuple[int, int]:
    """(files that produced rows under ``predicate``, total data files)
    — the outside-view measurement of layout quality. For a pruned
    directory or a skipped file, no row carries its
    ``input_file_name``, so the first count is exactly the files the
    filtered scan drew data from."""
    df = spark.read.parquet(path)
    touched = (
        df.filter(predicate)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    total = (
        df.select(F.input_file_name().alias("f")).distinct().count()
    )
    return touched, total


def morton_interleave(a, b, bits: int = 16):
    """Morton (Z-order) code: interleave the low ``bits`` bits of two
    non-negative integer Columns — a at odd positions, b at even — so
    locality in EITHER dimension becomes locality in the code. Pure
    Column arithmetic (shift/and/or), constant-folded by codegen into
    one expression; no UDF."""
    code = F.lit(0).cast("long")
    for i in range(bits):
        # bit positions are disjoint, so + IS the bitwise OR here
        code = (
            code
            + F.shiftleft((F.shiftright(a, i) % 2).cast("long"), 2 * i + 1)
            + F.shiftleft((F.shiftright(b, i) % 2).cast("long"), 2 * i)
        )
    return code


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Z-order-clustered parquet write — the TWO-dimensional extension
    of ``write_range_clustered``: min/max-scale both cluster columns
    to ``bits``-bit buckets, interleave them into a Morton code, and
    range-partition + sort on the code. Each output file then covers a
    small RECTANGLE of (a, b) space rather than a slice of one column,
    so parquet min/max stats skip files for predicates on EITHER
    column (a single-column layout only skips for its own column — a
    filter on the other one touches every file). The pinned test:
    a filter on the non-clustered dimension touches ~all files of a
    range-clustered layout but only ~1/4 of the Z-ordered one.

    Scale shape: one 4-value aggregate for the bounds (broadcast
    back), one range exchange on the code (sampled boundaries), and
    the in-file sort — identical cost profile to the single-column
    writer. Production systems expose exactly this as OPTIMIZE ...
    ZORDER BY; here it is three Column expressions and a writer."""
    (
        zorder_layout(df, col_a, col_b, n_files, bits)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_layout(
    df: DataFrame, col_a: str, col_b: str, n_files: int, bits: int = 16
) -> DataFrame:
    """The Z-order transform behind ``write_zorder_clustered``, exposed
    so other writers (notably ``VersionStore.compact_version``) can
    apply the same layout to their own commit protocol: returns ``df``
    range-partitioned into ``n_files`` and sorted by the Morton code of
    the two min/max-scaled cluster columns, code column dropped."""
    stats = df.agg(
        F.min(F.col(col_a)).alias("_la"), F.max(F.col(col_a)).alias("_ha"),
        F.min(F.col(col_b)).alias("_lb"), F.max(F.col(col_b)).alias("_hb"),
    )
    top = float((1 << bits) - 1)

    def bucket(col, lo, hi):
        span = F.greatest(F.col(hi) - F.col(lo), F.lit(1)).cast("double")
        frac = (F.col(col) - F.col(lo)).cast("double") / span
        return F.least(
            F.floor(frac * top).cast("long"), F.lit((1 << bits) - 1)
        )

    coded = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "_z",
            morton_interleave(
                bucket(col_a, "_la", "_ha"), bucket(col_b, "_lb", "_hb"), bits
            ),
        )
        .drop("_la", "_ha", "_lb", "_hb")
    )
    return (
        coded.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def range_layout(df: DataFrame, cluster_col: str, n_files: int) -> DataFrame:
    """Single-column twin of ``zorder_layout`` (the transform behind
    ``write_range_clustered``), for writers with their own commit
    protocol."""
    return df.repartitionByRange(n_files, F.col(cluster_col)).sortWithinPartitions(
        cluster_col
    )
