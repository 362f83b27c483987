"""Training-shard writer: materialize the seeded global shuffle.

``plans/corpus.corpus_shard_plan`` is the audit side; this operator is
the sink: write the corpus as N shard directories whose within-shard
file order IS the training order (the md5(seed:doc_id) permutation
key). A training loader then streams shard files sequentially and gets
a reproducible, well-mixed document order with zero runtime shuffling.

Scale shape: ONE range exchange (``repartitionByRange(shard, k)``) —
rows land on executors in shard-contiguous, key-sorted ranges — then a
partition-local sort completes the order and ``partitionBy("shard")``
writes each shard as its own directory. No global sort materializes on
one node; shard balance comes from the uniform hash key. At 100 TB,
raise ``n_shards`` so a shard fits the downstream loader's unit of
work — the write cost is the same single exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: keep in sync with plans/corpus.corpus_shard_plan (oracle-pinned)
SHARD_SEED = "shard-v1"
N_SHARDS = 8


def with_shard_key(
    docs: DataFrame,
    seed: str = SHARD_SEED,
    n_shards: int = N_SHARDS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Append the permutation key ``k`` and ``shard`` columns — the
    same md5 hex-order construction the oracle-checked plan pins.

    The shard comes from the key's first FIFTEEN hex digits (60 bits,
    fits a signed long) mod ``n_shards`` — a single digit (0–15) would
    leave shards ≥ 16 empty and skew any ``n_shards`` not dividing 16
    ~2× (round-6 fix; balance pinned for n_shards ∈ {3, 5, 10, 32} by
    ``test_shard_key_balance_any_n_shards``)."""
    k = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    docs = docs.withColumn("k", k)
    h60 = F.conv(F.substring(F.col("k"), 1, 15), 16, 10).cast("long")
    return docs.withColumn("shard", h60 % n_shards)


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    seed: str = SHARD_SEED,
    n_shards: int = N_SHARDS,
    id_col: str = "doc_id",
) -> None:
    """Write ``out_dir/shard=<i>/`` parquet in training order.

    One range exchange + local sort; no collect. Order contract: every
    part file is key-sorted internally, and part-file NAMES sort in
    range order (partition ids ascend with the key range), so a loader
    streaming a shard's files in name order reads the exact permutation
    — pinned by ``test_write_training_shards_order_and_partition``.
    Readers that cannot honor file order use
    :func:`read_shard_in_order`'s explicit sort instead.
    """
    keyed = with_shard_key(docs, seed, n_shards, id_col)
    (
        keyed.repartitionByRange(n_shards, "shard", "k")
        .sortWithinPartitions("shard", "k")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(out_dir)
    )


def read_shard_in_order(spark_df_reader, out_dir: str, shard: int) -> DataFrame:
    """Read one shard; re-assert the training order (parquet row order
    within the written files is preserved, but a defensive sort keeps
    the contract explicit for multi-file shards)."""
    return (
        spark_df_reader.parquet(f"{out_dir}/shard={shard}").orderBy("k")
    )
