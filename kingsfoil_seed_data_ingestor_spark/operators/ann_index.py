"""Persisted IVF ANN index: build once, search many.

Round-4 review flagged that ``knn_ivf_kmeans`` retrains its coarse
quantizer (Lloyd iterations over the full corpus) on every execution —
at 100 TB the index *build* is a once-per-corpus batch job, and the
*search* is a cheap read. This module separates them:

* :func:`build_ivf_index` — train the deterministic k-means quantizer
  (``similarity.kmeans_centroids``), assign every vector to its list,
  and persist two tables under one directory:

  - ``centroids``   (cluster int, c_vec array<double>) — k·d rows;
  - ``assignments`` (vec_id long, embedding array<float>) parquet
    **partitioned by cluster**, so a search that probes ``nprobe``
    lists prunes to those partitions at the file level — the inverted
    file IS the storage layout, no post-scan filter needed.

  The build is atomic (stage to a temp dir, ``os.rename`` into place)
  and stamped with the source parquet's size+mtime and the quantizer
  params, so a stale or parameter-mismatched index is rebuilt, never
  silently reused.

* :func:`search_ivf_index` — route the query vectors to their
  ``nprobe`` nearest centroids (one tiny job: |queries| × k cosines),
  then scan ONLY the probed assignment partitions for the exact top-k.
  The probed-cluster set is collected (≤ |queries|·nprobe ints) and
  pushed as a static partition filter — ``.explain`` shows
  ``PartitionFilters: [cluster IN (...)]`` with only those directories
  read.

Training determinism (seeded lowest-id init, integer-scaled partial
sums — see ``similarity.kmeans_centroids``) makes the persisted index a
pure function of (source data, params): rebuilding yields bit-identical
centroids, so results never depend on *when* the index was built.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kingsfoil_seed_data_ingestor_spark.operators.caching import CacheScope
from kingsfoil_seed_data_ingestor_spark.operators.similarity import (
    assign_clusters,
    cosine,
    kmeans_centroids,
)

#: default root for persisted indexes — under the (gitignored) local
#: warehouse; a cluster deployment points this at shared storage
INDEX_ROOT = os.environ.get(
    "KINGSFOIL_ANN_INDEX_DIR", os.path.join(os.getcwd(), "spark-warehouse", "ann_index")
)


def _source_stamp(source_path: str) -> str:
    """Cheap freshness fingerprint of a parquet file or directory:
    total byte size + max mtime (ns). Catches the driver regenerating
    testdata between rounds without a Spark job."""
    if os.path.isdir(source_path):
        size = mtime = 0
        for root, _dirs, files in os.walk(source_path):
            for f in files:
                st = os.stat(os.path.join(root, f))
                size += st.st_size
                mtime = max(mtime, st.st_mtime_ns)
        return f"{size}:{mtime}"
    st = os.stat(source_path)
    return f"{st.st_size}:{st.st_mtime_ns}"


def _meta(source_path: str, n_clusters: int, iters: int) -> dict:
    return {
        "source": os.path.abspath(source_path),
        "stamp": _source_stamp(source_path),
        "n_clusters": n_clusters,
        "iters": iters,
        "format": 1,
    }


def build_ivf_index(
    vectors: DataFrame,
    dest_dir: str,
    source_path: str,
    n_clusters: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Train and persist the index; returns ``dest_dir``.

    Stages into a temp sibling and renames into place, so a concurrent
    builder (bench + correctness harness overlapping) can never leave a
    half-written index: the loser of the rename race discards its
    staging dir and uses the winner's output (identical by training
    determinism).
    """
    scope = CacheScope()
    try:
        vectors = scope.persist(vectors)
        cents = kmeans_centroids(
            vectors, k=n_clusters, iters=iters, id_col=id_col, vec_col=vec_col,
            scope=scope,
        )
        spark = vectors.sparkSession
        os.makedirs(os.path.dirname(dest_dir) or ".", exist_ok=True)
        staging = tempfile.mkdtemp(
            prefix=".build-", dir=os.path.dirname(dest_dir) or "."
        )
        try:
            cent_df = spark.createDataFrame(
                [(i, c) for i, c in enumerate(cents)], "cluster int, c_vec array<double>"
            )
            cent_df.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(staging, "centroids")
            )
            assigned = assign_clusters(
                vectors, cents, id_col=id_col, vec_col=vec_col
            )
            # partitionBy(cluster): the inverted lists become directories,
            # so nprobe search is file-level partition pruning
            assigned.write.partitionBy("cluster").mode("overwrite").parquet(
                os.path.join(staging, "assignments")
            )
            with open(os.path.join(staging, "meta.json"), "w") as fh:
                json.dump(_meta(source_path, n_clusters, iters), fh)
            try:
                os.rename(staging, dest_dir)
            except OSError:
                # lost the race — a finished identical index is in place
                shutil.rmtree(staging, ignore_errors=True)
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            raise
    finally:
        scope.release()
    return dest_dir


def ensure_ivf_index(
    vectors: DataFrame,
    source_path: str,
    n_clusters: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    root: str | None = None,
) -> str:
    """Return the directory of a fresh index for ``source_path``,
    building it if absent or stale. The index key hashes the source
    identity + params, so different SFs and parameter choices coexist."""
    import hashlib

    want = _meta(source_path, n_clusters, iters)
    key = hashlib.md5(json.dumps(want, sort_keys=True).encode()).hexdigest()[:16]
    dest = os.path.join(root or INDEX_ROOT, f"ivf-{key}")
    meta_path = os.path.join(dest, "meta.json")
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as fh:
                if json.load(fh) == want:
                    return dest
        except (OSError, json.JSONDecodeError):
            pass
        shutil.rmtree(dest, ignore_errors=True)  # stale or corrupt
    return build_ivf_index(
        vectors, dest, source_path, n_clusters, iters, id_col, vec_col
    )


def search_ivf_index(
    spark: SparkSession,
    index_dir: str,
    query_ids: list[int],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k against a persisted index — no training, no full scan.

    Stage 1 (tiny): load centroids (k rows) and the query vectors, rank
    clusters per query by cosine, keep ``nprobe``; collect the routing
    table (≤ |queries|·nprobe rows) to the driver. Stage 2: scan only
    the probed assignment partitions (static ``cluster IN (...)``
    filter → file-level pruning), broadcast-join the routed queries,
    exact cosine top-k. Ties break by (score desc, neighbor_id asc),
    same total order as the brute-force baseline.
    """
    cent_df = spark.read.parquet(os.path.join(index_dir, "centroids"))
    assigned = spark.read.parquet(os.path.join(index_dir, "assignments"))
    queries = assigned.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    routed = queries.join(F.broadcast(cent_df)).withColumn(
        "rep_score", cosine(F.col("q_vec"), F.col("c_vec"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("rep_score"), F.asc("cluster"))
    probe_rows = (
        routed.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "q_vec", "cluster")
        .collect()  # ≤ |queries|·nprobe rows — the routing table
    )
    probe = spark.createDataFrame(
        [(r["query_id"], r["q_vec"], r["cluster"]) for r in probe_rows],
        "query_id long, q_vec array<float>, cluster int",
    )
    probed_clusters = sorted({r["cluster"] for r in probe_rows})
    scored = (
        assigned.filter(F.col("cluster").isin(probed_clusters))
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v"), "cluster")
        .join(F.broadcast(probe), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", cosine(F.col("q_vec"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("score", 6).alias("cosine"))
    )


# ----------------------------------------------------------------------
# IVF-SQ8: scalar-quantized inverted lists (the faiss workhorse layout)
# ----------------------------------------------------------------------


def with_sq8_columns(df: DataFrame, vec_col: str) -> DataFrame:
    """Append (qv byte[], scale float, qnorm double) quantization columns.

    Same symmetric scheme as the ``embed_quantize_int8`` plan: scale =
    max|v|/127, q = round-half-up(v/scale). ``qnorm`` is the exact L2
    norm of the DEQUANTIZED vector (scale·√Σq²), precomputed at build
    so search never touches the float payload for scoring. Two chained
    projections so ``scale`` materializes once per row — inlining the
    array_max subtree into the per-element lambda would evaluate it per
    LANE (O(d²) per row).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = df.withColumn(
        "_scale", F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    )
    qv = F.when(
        F.col("_scale") > 0,
        F.transform(v, lambda x: F.floor(x / F.col("_scale") + 0.5).cast("byte")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("byte")))  # all-zero vector
    staged = staged.withColumn("qv", qv)
    qsq = F.aggregate(
        F.transform(F.col("qv"), lambda q: q.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        staged.withColumn("qnorm", F.col("_scale") * F.sqrt(qsq))
        .withColumn("scale", F.col("_scale").cast("float"))
        .drop("_scale")
    )


def build_ivf_sq8_index(
    vectors: DataFrame,
    dest_dir: str,
    source_path: str,
    n_clusters: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """IVF index whose inverted lists store int8-quantized vectors.

    Assignments carry BOTH payloads: ``qv/scale/qnorm`` (1 B/lane — the
    columns the approximate scoring pass reads; parquet column pruning
    makes the 4× read reduction real) and the original float
    ``embedding`` (read only for the exact rescore of the shortlist).
    Same atomic staging + rename, same determinism contract as
    :func:`build_ivf_index`.
    """
    scope = CacheScope()
    try:
        vectors = scope.persist(vectors)
        cents = kmeans_centroids(
            vectors, k=n_clusters, iters=iters, id_col=id_col, vec_col=vec_col,
            scope=scope,
        )
        spark = vectors.sparkSession
        os.makedirs(os.path.dirname(dest_dir) or ".", exist_ok=True)
        staging = tempfile.mkdtemp(
            prefix=".build-", dir=os.path.dirname(dest_dir) or "."
        )
        try:
            cent_df = spark.createDataFrame(
                [(i, c) for i, c in enumerate(cents)], "cluster int, c_vec array<double>"
            )
            cent_df.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(staging, "centroids")
            )
            assigned = with_sq8_columns(
                assign_clusters(vectors, cents, id_col=id_col, vec_col=vec_col),
                vec_col,
            ).select(id_col, vec_col, "cluster", "qv", "scale", "qnorm")
            assigned.write.partitionBy("cluster").mode("overwrite").parquet(
                os.path.join(staging, "assignments")
            )
            meta = _meta(source_path, n_clusters, iters)
            meta["quantize"] = "sq8"
            with open(os.path.join(staging, "meta.json"), "w") as fh:
                json.dump(meta, fh)
            try:
                os.rename(staging, dest_dir)
            except OSError:
                shutil.rmtree(staging, ignore_errors=True)
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            raise
    finally:
        scope.release()
    return dest_dir


def ensure_ivf_sq8_index(
    vectors: DataFrame,
    source_path: str,
    n_clusters: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    root: str | None = None,
) -> str:
    """Fresh-or-rebuilt SQ8 index directory for ``source_path``."""
    import hashlib

    want = _meta(source_path, n_clusters, iters)
    want["quantize"] = "sq8"
    key = hashlib.md5(json.dumps(want, sort_keys=True).encode()).hexdigest()[:16]
    dest = os.path.join(root or INDEX_ROOT, f"ivfsq8-{key}")
    meta_path = os.path.join(dest, "meta.json")
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as fh:
                if json.load(fh) == want:
                    return dest
        except (OSError, json.JSONDecodeError):
            pass
        shutil.rmtree(dest, ignore_errors=True)
    return build_ivf_sq8_index(
        vectors, dest, source_path, n_clusters, iters, id_col, vec_col
    )


def search_ivf_sq8_index(
    spark: SparkSession,
    index_dir: str,
    query_ids: list[int],
    k: int = 5,
    nprobe: int = 2,
    shortlist: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-pass ANN over quantized inverted lists.

    Pass 1 (approximate, cheap): asymmetric distance — the FLOAT query
    against int8 list vectors: score ≈ scale·dot(q, qv) / (|q|·qnorm).
    Reads only the byte payload of the probed partitions. Keeps
    ``shortlist × k`` candidates per query.

    Pass 2 (exact, tiny): rescore the shortlist against the float
    embeddings (same rows, column-pruned fetch), exact cosine, final
    top-k with the brute-force tie order (score desc, neighbor_id asc).
    Quantization error only costs recall if a true top-k neighbor falls
    outside the shortlist — the pytest recall gate measures exactly
    that.
    """
    cent_df = spark.read.parquet(os.path.join(index_dir, "centroids"))
    assigned = spark.read.parquet(os.path.join(index_dir, "assignments"))
    queries = assigned.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    routed = queries.join(F.broadcast(cent_df)).withColumn(
        "rep_score", cosine(F.col("q_vec"), F.col("c_vec"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("rep_score"), F.asc("cluster"))
    probe_rows = (
        routed.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "q_vec", "cluster")
        .collect()
    )
    probe = spark.createDataFrame(
        [(r["query_id"], r["q_vec"], r["cluster"]) for r in probe_rows],
        "query_id long, q_vec array<float>, cluster int",
    )
    probed_clusters = sorted({r["cluster"] for r in probe_rows})
    # pass 1: byte-payload scan only (embedding column pruned away)
    qdot = F.aggregate(
        F.zip_with(
            F.col("q_vec"),
            F.col("qv"),
            lambda x, q: x.cast("double") * q.cast("double"),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    qlen = F.sqrt(
        F.aggregate(
            F.transform(F.col("q_vec"), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    approx = (
        assigned.filter(F.col("cluster").isin(probed_clusters))
        .select(
            F.col(id_col).alias("neighbor_id"), "cluster", "qv", "scale", "qnorm"
        )
        .join(F.broadcast(probe), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "approx_score",
            (F.col("scale").cast("double") * qdot) / (qlen * F.col("qnorm")),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.desc("approx_score"), F.asc("neighbor_id")
    )
    short = (
        approx.withColumn("_rn", F.row_number().over(wa))
        .filter(F.col("_rn") <= shortlist * k)
        .select("query_id", "q_vec", "neighbor_id")
    )
    # pass 2: exact rescore of the shortlist only
    floats = assigned.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v"))
    scored = short.join(floats, "neighbor_id").withColumn(
        "score", cosine(F.col("q_vec"), F.col("v"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("score", 6).alias("cosine"))
    )
