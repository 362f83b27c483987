"""Vector similarity search over an embedding column (``array<float>``).

Two search paths over an ``embeddings``-shaped table
(``vec_id long, embedding array<float>, label int``):

* **brute force** — broadcast the (small) query set against every
  vector; exact cosine; per-query top-k via a ranking window. The
  correctness baseline, O(Q × N) but embarrassingly parallel: at 100 TB
  the scan partitions by vector rows and no shuffle moves the vectors —
  only Q × N score rows reduce through the per-query top-k
  (TakeOrdered-style, partial top-k per partition).
* **IVF-style partitioned search** — a coarse quantizer maps each query
  to one partition (here: nearest deterministic representative per
  ``label``), then brute-force only inside that partition: the classic
  inverted-file trade (recall bounded by the quantizer) that turns a
  full scan into a 1/nlist scan.

Determinism contract (for the DuckDB oracles): dot products fold
left-to-right over the array in index order with double accumulation —
both engines produce bit-identical IEEE results, so even un-rounded
scores hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i], left-to-right double fold (order-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def knn_bruteforce(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).

    The query side is filtered then broadcast — the big side never
    shuffles for the join; the only reduction is the per-query top-k.
    """
    queries = vectors.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    scored = (
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v"))
        .join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", cosine(F.col("q_vec"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("score", 6).alias("cosine"))
    )


def ivf_representatives(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    part_col: str = "label",
) -> DataFrame:
    """One deterministic representative vector per partition: the
    member with the minimum id. (A trained quantizer would use k-means
    centroids; the min-id medoid keeps results engine-reproducible —
    mean-of-floats depends on reduction order.)"""
    w = Window.partitionBy(part_col).orderBy(F.asc(id_col))
    return (
        vectors.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(part_col).alias("part"), F.col(vec_col).alias("rep_vec"))
    )


def knn_ivf(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    part_col: str = "label",
) -> DataFrame:
    """IVF search: route each query to its nearest representative's
    partition (nprobe=1), then exact top-k inside that partition only.

    Both stages broadcast the tiny side (representatives, then routed
    queries); the vector table is scanned once, filtered by partition —
    the plan a 1000-executor cluster wants.
    """
    reps = ivf_representatives(vectors, id_col, vec_col, part_col)
    queries = vectors.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    routed = (
        queries.join(F.broadcast(reps))
        .withColumn("rep_score", cosine(F.col("q_vec"), F.col("rep_vec")))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("rep_score"), F.asc("part"))
    probe = (
        routed.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") == 1)
        .select("query_id", "q_vec", "part")
    )
    scored = (
        vectors.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("v"),
            F.col(part_col).alias("part"),
        )
        .join(F.broadcast(probe), "part")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", cosine(F.col("q_vec"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("score", 6).alias("cosine"))
    )


def near_dup_pairs_exact(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 2048,
) -> DataFrame:
    """Exact all-pairs cosine join: every ordered pair ``kept_id <
    dup_id`` with ``cosine >= threshold`` — the verification kernel of
    embedding-based near-duplicate detection (reference has no vector
    ops; this extends `SCHEMA.md`'s dedup story to dense embeddings).

    Physical shape: a **distributed block-grid GEMM**. Rows are hashed
    into ``ceil(N / block_rows)`` blocks by id; each block aggregates
    into one matrix row (id-sorted ``collect_list``); the upper
    triangle of the block × block grid joins block pairs; and a numpy
    GEMM inside ``mapInPandas`` scores one (tile_a, tile_b) cell per
    input row, emitting only surviving pairs. Nothing is ever collected
    to the driver, and per-task memory is bounded by two tiles plus one
    ``block_rows²`` score block regardless of N — the shape that
    survives a 1000-executor cluster. Each unordered pair is scored in
    exactly one cell (diagonal cells take the id-upper-triangle), so
    no dedup pass is needed afterwards.

    Cost model: the O(N²·d) multiply is inherent to *exact* all-pairs;
    the grid spreads it over N²/(2·block_rows²) independent tasks. At
    100 TB you bound compute, not just memory, by pre-blocking with
    LSH (see ``simhash``/``lsh_candidate_pairs`` in ``text_dedup``) and
    running this exact kernel per bucket — the per-cell kernel is
    unchanged.
    """
    import numpy as np
    import pandas as pd

    n_rows = vectors.count()  # distributed aggregate; O(1) driver result
    n_blocks = max(1, -(-n_rows // block_rows))
    blocked = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("_blk"),
    )
    # one matrix row per block, members sorted by id so that inside a
    # diagonal cell row-index order == id order (upper triangle == i<j)
    tiles = blocked.groupBy("_blk").agg(
        F.sort_array(F.collect_list(F.struct("_id", "_v"))).alias("_rows")
    )
    a = tiles.select(F.col("_blk").alias("blk_a"), F.col("_rows").alias("rows_a"))
    b = tiles.select(F.col("_blk").alias("blk_b"), F.col("_rows").alias("rows_b"))
    n_cells = n_blocks * (n_blocks + 1) // 2
    grid = (
        a.join(F.broadcast(b), F.col("blk_a") <= F.col("blk_b"))
        # spread cells so one task owns ~one GEMM (cap the tiny-N case)
        .repartition(min(n_cells, 10_000))
    )

    out_schema = "dup_id long, kept_id long, cosine double"

    def gemm_cells(batches):
        for pdf in batches:
            for blk_a, rows_a, blk_b, rows_b in pdf[
                ["blk_a", "rows_a", "blk_b", "rows_b"]
            ].itertuples(index=False):
                ids_a = np.fromiter((r["_id"] for r in rows_a), dtype=np.int64)
                A = np.array([r["_v"] for r in rows_a], dtype=np.float64)
                A /= np.linalg.norm(A, axis=1, keepdims=True)
                if blk_a == blk_b:
                    ids_b, B = ids_a, A
                else:
                    ids_b = np.fromiter((r["_id"] for r in rows_b), dtype=np.int64)
                    B = np.array([r["_v"] for r in rows_b], dtype=np.float64)
                    B /= np.linalg.norm(B, axis=1, keepdims=True)
                S = A @ B.T
                mask = S >= threshold
                if blk_a == blk_b:
                    # ids sorted ascending ⇒ upper triangle is exactly i<j
                    mask &= np.triu(np.ones_like(mask), k=1).astype(bool)
                ri, ci = np.nonzero(mask)
                ia, ib = ids_a[ri], ids_b[ci]
                yield pd.DataFrame(
                    {
                        "dup_id": np.maximum(ia, ib),
                        "kept_id": np.minimum(ia, ib),
                        "cosine": S[ri, ci],
                    }
                )

    return grid.mapInPandas(gemm_cells, schema=out_schema)
