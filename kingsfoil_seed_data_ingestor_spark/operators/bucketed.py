"""Bucketed co-located joins: shuffle elimination for repeated fact⋈fact joins.

A join between two large tables shuffles BOTH sides on the key — at
100 TB that shuffle dominates the query. When the same join runs
repeatedly (the warehouse pattern: lineitem⋈orders every dashboard
refresh), pre-bucketing both tables on their join key with the same
bucket count makes Spark read matching buckets pairwise: the
SortMergeJoin planner sees ``HashPartitioning(key, n)`` already
satisfied on both sides and plans **zero Exchange** nodes.
``tools/explain_audit.py`` appends the measured proof to `PLANS.md`;
`tests/test_ingest.py::test_bucketed_join_eliminates_shuffle` pins it.

This is the single-cluster analogue of co-partitioned storage in
distributed warehouses; with a shared metastore the bucketed layout
persists across sessions and every downstream join on the bucket key
inherits the shuffle-free plan (bucket pruning included for point
lookups on the key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and sorted) by ``key``.

    ``sortBy`` stores each bucket file key-sorted so the co-located
    join can merge without a runtime sort as files allow. ``path``
    makes the table external (catalog entry + explicit location) —
    handy for tests; production would use the shared warehouse.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket keys. With equal
    bucket counts the physical plan contains no Exchange on either
    side — the defining property this module exists for."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, F.col(left_key) == F.col(right_key))


def orders_lineitem_bucketed_demo(
    spark: SparkSession, sf_dir: str, warehouse: str, buckets: int = 8
) -> DataFrame:
    """The canonical warehouse shape: bucket lineitem and orders by
    orderkey, join co-located, aggregate revenue per order priority.
    Returns the aggregated DataFrame whose executed plan must show 0
    Exchange below the join (the only shuffle left is the final small
    groupBy)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, "lineitem_bkt", "l_orderkey", buckets, f"{warehouse}/lineitem_bkt")
    write_bucketed(od, "orders_bkt", "o_orderkey", buckets, f"{warehouse}/orders_bkt")
    joined = cobucketed_join(spark, "lineitem_bkt", "orders_bkt", "l_orderkey", "o_orderkey")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
        )
        .cast("decimal(24,6)")
        .cast("double")
        .alias("revenue"),
    )
