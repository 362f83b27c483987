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
) -> DataFrame:
    """Exact all-pairs cosine join: every ordered pair ``kept_id <
    dup_id`` with ``cosine >= threshold`` — the verification kernel of
    embedding-based near-duplicate detection (reference has no vector
    ops; this extends `SCHEMA.md`'s dedup story to dense embeddings).

    Physical shape: a broadcast block-nested-loop join with a
    vectorized GEMM kernel. The (id, unit-vector) matrix is broadcast
    once; each Arrow batch of rows multiplies its block against the
    broadcast matrix in one numpy ``B @ M.T`` and emits only the
    surviving pairs — no n² row materialization ever reaches Spark, and
    the scan side stays fully partitioned (no shuffle until the
    keep-first reduction). At 100 TB the broadcast side is tiled
    (grid-decompose the matrix and union the tile joins) or pre-blocked
    with LSH; the per-tile kernel is unchanged.
    """
    import numpy as np
    import pandas as pd

    sdf = vectors.select(id_col, vec_col)
    collected = sdf.collect()
    ids = np.array([r[0] for r in collected], dtype=np.int64)
    mat = np.array([r[1] for r in collected], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bc = vectors.sparkSession.sparkContext.broadcast((ids, mat))

    out_schema = "dup_id long, kept_id long, cosine double"

    def block(batches):
        b_ids, b_mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            rid = pdf[id_col].to_numpy(dtype=np.int64)
            B = np.array(list(pdf[vec_col]), dtype=np.float64)
            B /= np.linalg.norm(B, axis=1, keepdims=True)
            S = B @ b_mat.T
            ri, ci = np.nonzero(S >= threshold)
            keep = b_ids[ci] < rid[ri]  # kept_id < dup_id; also drops self
            ri, ci = ri[keep], ci[keep]
            yield pd.DataFrame(
                {"dup_id": rid[ri], "kept_id": b_ids[ci], "cosine": S[ri, ci]}
            )

    return sdf.mapInPandas(block, schema=out_schema)
