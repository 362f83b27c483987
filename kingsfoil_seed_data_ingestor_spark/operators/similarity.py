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

from kingsfoil_seed_data_ingestor_spark.operators.caching import (
    CacheScope,
    scope_or_own,
)


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


def kmeans_centroids(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scope: CacheScope | None = None,
) -> "list[list[float]]":
    """Deterministic seeded k-means for the IVF coarse quantizer.

    Init = the k lowest-id vectors (engine-reproducible, no RNG);
    Lloyd iterations assign by cosine and update means from
    INTEGER-scaled per-dimension sums (components rounded at 1e-12
    inside the Arrow kernel), so the reduction is order-independent
    and the result identical under any partitioning. Driver state is
    O(k·d) per iteration (the k centroid rows) — never O(N); each
    iteration is ONE job: a map-side Arrow GEMM that emits k partial
    rows per batch, reduced by a k-row groupBy. The earlier
    formulation aggregated d decimal columns over every vector row
    (~1 s per iteration at 2 k×64 from the 64-lane codegen + Arrow
    row traffic); partials cut that to a k×batches-row reduction.
    """
    import numpy as np

    # the loop is fully eager (every iteration collects ≤ k rows), so
    # the vector-table persist lives entirely inside this call unless
    # the caller already holds it in an outer scope
    own = CacheScope() if scope is None else None
    vectors = (scope or own).persist(vectors)
    try:
        init = [
            list(map(float, r[0]))
            for r in vectors.orderBy(F.asc(id_col)).limit(k).select(vec_col).collect()
        ]
        if not init:
            return []
        d = len(init[0])
        cents = np.asarray(init, dtype=np.float64)
        for _ in range(iters):
            parts = _cluster_partials(vectors, cents, vec_col=vec_col)
            stats = (
                parts.groupBy("cluster")
                .agg(
                    F.sum("n").alias("n"),
                    *[
                        # long partials → decimal: exact far past the int64
                        # ceiling a billion-row cluster would overflow
                        F.sum(F.element_at("s", i + 1).cast("decimal(38,0)")).alias(f"s{i}")
                        for i in range(d)
                    ],
                )
                .collect()  # ≤ k rows — bounded by cluster count, not N
            )
            new = cents.copy()
            for r in stats:
                new[r["cluster"]] = [
                    float(r[f"s{i}"]) / 1e12 / r["n"] for i in range(d)
                ]
            cents = new
        return [list(map(float, c)) for c in cents]
    finally:
        if own is not None:
            own.release()


def _cluster_partials(vectors: DataFrame, centroids, vec_col: str = "embedding") -> DataFrame:
    """Per-Arrow-batch Lloyd partials: assign each vector to its
    nearest centroid (cosine argmax, ties → lowest id) and emit one
    ``(cluster, n, s)`` row per cluster per batch, where ``s`` holds
    per-dimension sums of ``rint(v·1e12)`` as int64 — exact integers,
    so cross-batch reduction order cannot change the result. Batch
    overflow headroom: 1e12 · |v| · batch_rows ≪ 2⁶³ for any sane
    embedding scale; the Spark-side reduction widens to decimal."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    def kern(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            cl = (Vn @ Cn.T).argmax(axis=1)
            S = np.rint(V * 1e12).astype(np.int64)
            out = []
            for c in np.unique(cl):
                m = cl == c
                out.append((int(c), int(m.sum()), S[m].sum(axis=0).tolist()))
            yield pd.DataFrame(out, columns=["cluster", "n", "s"])

    return vectors.select(vec_col).mapInPandas(kern, schema="cluster int, n long, s array<long>")


def assign_clusters(
    vectors: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Tag each vector with its nearest-centroid id (cosine argmax,
    ties → lowest cluster id). Map-side only: the k×d centroid matrix
    ships in the task closure and each Arrow batch scores via one numpy
    GEMM — no shuffle, no driver round-trip."""
    import numpy as np
    import pandas as pd  # noqa: F401 — Arrow batches arrive as pandas

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    out_schema = f"{id_col} long, {vec_col} array<float>, cluster int"

    def kern(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            cl = (Vn @ Cn.T).argmax(axis=1)  # first max ⇒ lowest cluster
            yield pdf[[id_col, vec_col]].assign(cluster=cl.astype("int32"))

    return vectors.select(id_col, vec_col).mapInPandas(kern, schema=out_schema)


def knn_ivf_kmeans(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_clusters: int = 8,
    iters: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scope: CacheScope | None = None,
) -> DataFrame:
    """IVF search over a trained quantizer: k-means centroids, each
    query probes its ``nprobe`` nearest inverted lists, exact top-k
    inside the probed lists only — a real recall/cost dial (nprobe=
    n_clusters degenerates to brute force). Both the centroid table and
    the routed queries broadcast; the vector table is scanned once with
    a cluster-membership filter.

    The vector table feeds k-means init, every Lloyd iteration, the
    assignment pass, and the query filter — persisted under ``scope``
    (auto-released with the result when no scope is passed)."""
    spark = vectors.sparkSession
    scope, own = scope_or_own(scope)
    vectors = scope.persist(vectors)
    cents = kmeans_centroids(
        vectors, k=n_clusters, iters=iters, id_col=id_col, vec_col=vec_col, scope=scope
    )
    assigned = assign_clusters(vectors, cents, id_col=id_col, vec_col=vec_col)
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cluster int, c_vec array<double>"
    )
    queries = vectors.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    routed = queries.join(F.broadcast(cent_df)).withColumn(
        "rep_score", cosine(F.col("q_vec"), F.col("c_vec"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("rep_score"), F.asc("cluster"))
    probe = (
        routed.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "q_vec", "cluster")
    )
    scored = (
        assigned.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v"), "cluster"
        )
        .join(F.broadcast(probe), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", cosine(F.col("q_vec"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("score", 6).alias("cosine"))
    )
    return scope.attach(out) if own else out


def _codebook_score_sql(vec_col: str, cent: "list[float]") -> str:
    """``dot(vec, cent) / ||cent||`` as ONE parsed fragment with the
    centroid as a double-literal array (17-sig-digit scientific
    notation parses to the identical double in Spark and DuckDB).
    Same fold shape as :func:`dot`, so the oracle's ``sql_dot`` twin
    produces bit-identical scores. ``||vec||`` is deliberately
    dropped: it is a common positive factor per row, so argmax and
    rank order are unchanged and both engines omit it identically."""
    arr = ", ".join(f"{v:.17e}D" for v in cent)
    d = (
        f"aggregate(zip_with(`{vec_col}`, array({arr}), "
        f"(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x)"
    )
    cn = (
        f"sqrt(aggregate(zip_with(array({arr}), array({arr}), "
        f"(x, y) -> x * y), 0.0D, (acc, x) -> acc + x))"
    )
    return f"({d} / {cn})"


def knn_ivf_frozen(
    vectors: DataFrame,
    codebook: "list[list[float]]",
    query_ids: list[int],
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scope: CacheScope | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """IVF search against a FROZEN literal codebook — zero Python in
    the plan: assignment, routing, probing, and scoring are all Column
    expressions, so (unlike the numpy-assigned trained path) every
    arithmetic step has an exact SQL twin and the query is
    hash-checkable cross-engine.

    Assignment = first cluster whose score weakly dominates all later
    ones (argmax, ties → lowest id) over ``dot(v, c)/||c||`` — the
    row-constant ``||v||`` is dropped from ranking scores in both
    engines. Routing explodes the per-query scores and keeps the top
    ``nprobe`` clusters; scoring probes only those clusters' members
    with the full exact cosine. One hash shuffle on cluster id for the
    probe join (broadcast on the ≤ |queries|·nprobe routed rows), one
    window for the final top-k — the same physical shape as the
    persisted-index search, minus the index-build scan pruning."""
    nc = len(codebook)
    s_cols = [
        F.expr(_codebook_score_sql(vec_col, c)).alias(f"_s{i}")
        for i, c in enumerate(codebook)
    ]
    scope, own = scope_or_own(scope)
    # scored base feeds assignment AND query routing — one scan
    base = scope.persist(vectors.select(F.col(id_col), F.col(vec_col), *s_cols))

    cluster = F.lit(nc - 1)
    for c in range(nc - 2, -1, -1):
        cond = F.lit(True)
        for j in range(c + 1, nc):
            cond = cond & (F.col(f"_s{c}") >= F.col(f"_s{j}"))
        cluster = F.when(cond, F.lit(c)).otherwise(cluster)
    assigned = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v"),
        cluster.cast("int").alias("cluster"),
    )

    routed = (
        base.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("cluster"), F.col(f"_s{i}").alias("rs")
                        )
                        for i in range(nc)
                    ]
                )
            ).alias("p"),
        )
        .select("query_id", "q_vec", "p.cluster", "p.rs")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("rs"), F.asc("cluster"))
    probe = (
        routed.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "q_vec", "cluster")
    )
    scored = (
        assigned.join(F.broadcast(probe), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", cosine(F.col("q_vec"), F.col("v")))
    )
    if stats is not None:
        # opt-in witness (extra count job): how many (query, neighbor)
        # rows the probe actually scored — the IVF scan-pruning metric
        # the scaling curves pin (Σ over probed clusters' sizes)
        stats["scored_rows"] = (
            assigned.join(F.broadcast(probe.select("query_id", "cluster")), "cluster")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .count()
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("score", 6).alias("cosine"))
    )
    return scope.attach(out) if own else out


def knn_ivf_sq8_frozen(
    vectors: DataFrame,
    codebook: "list[list[float]]",
    query_ids: list[int],
    k: int = 5,
    nprobe: int = 3,
    shortlist: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scope: CacheScope | None = None,
) -> DataFrame:
    """IVF-SQ8 two-pass search against a FROZEN literal codebook — the
    asymmetric-distance pass 1 (float query × int8 list vectors, read
    at 1 B/lane at scale) and the exact-rescore pass 2 of
    ``ann_index.search_ivf_sq8_index``, with assignment and routing as
    Column expressions over codebook literals instead of the persisted
    index. Every arithmetic step (scale = max|v|/127, round-half-up
    bytes, dequantized qnorm, scale-float round trip, asymmetric
    score) has an exact SQL twin, so the full quantized search shape
    is hash-checkable cross-engine (``embed_ann_ivf_sq8_frozen``)."""
    from kingsfoil_seed_data_ingestor_spark.operators.ann_index import (
        with_sq8_columns,
    )

    nc = len(codebook)
    s_cols = [
        F.expr(_codebook_score_sql(vec_col, c)).alias(f"_s{i}")
        for i, c in enumerate(codebook)
    ]
    scope, own = scope_or_own(scope)
    base = scope.persist(vectors.select(F.col(id_col), F.col(vec_col), *s_cols))

    cluster = F.lit(nc - 1)
    for c in range(nc - 2, -1, -1):
        cond = F.lit(True)
        for j in range(c + 1, nc):
            cond = cond & (F.col(f"_s{c}") >= F.col(f"_s{j}"))
        cluster = F.when(cond, F.lit(c)).otherwise(cluster)
    assigned = scope.persist(
        with_sq8_columns(
            base.select(
                F.col(id_col), F.col(vec_col), cluster.cast("int").alias("cluster")
            ),
            vec_col,
        )
    )

    routed = (
        base.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("cluster"), F.col(f"_s{i}").alias("rs")
                        )
                        for i in range(nc)
                    ]
                )
            ).alias("p"),
        )
        .select("query_id", "q_vec", "p.cluster", "p.rs")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("rs"), F.asc("cluster"))
    probe = (
        routed.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "q_vec", "cluster")
    )

    # pass 1: asymmetric distance against the byte payload
    qdot = F.aggregate(
        F.zip_with(
            F.col("q_vec"), F.col("qv"),
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
        assigned.select(
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
    floats = assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v")
    )
    scored = short.join(floats, "neighbor_id").withColumn(
        "score", cosine(F.col("q_vec"), F.col("v"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("score", 6).alias("cosine"))
    )
    return scope.attach(out) if own else out


def recall_vs_bruteforce(
    vectors: DataFrame,
    ann: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nprobe: int | None = None,
) -> DataFrame:
    """Recall@k of any ANN result (``query_id, neighbor_id`` rows)
    against the exact brute-force top-k over ``vectors`` — the honesty
    metric for an ANN index (a quantizer that routes badly shows up
    here as recall, not as a silent wrong answer). One row:
    (n_queries, k, nprobe, avg_recall)."""
    brute = knn_bruteforce(vectors, query_ids, k=k).select("query_id", "neighbor_id")
    ann = ann.select("query_id", "neighbor_id")
    # both join inputs are ≤ |queries|·k rows (top-k outputs), but the
    # static planner can't see that through the window/agg lineage and
    # falls back to sort-merge — broadcast explicitly so the plan is
    # right even before AQE's runtime correction
    hits = ann.join(F.broadcast(brute), ["query_id", "neighbor_id"], "left_semi")
    per_q = brute.select("query_id").distinct().join(
        F.broadcast(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hits"))
        ),
        "query_id",
        "left",
    ).select(
        "query_id", F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits")
    )
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.lit(k).alias("k"),
        F.lit(-1 if nprobe is None else nprobe).alias("nprobe"),
        F.round(F.avg(F.col("n_hits") / k), 6).alias("avg_recall"),
    )


def ann_recall_at_k(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_clusters: int = 8,
    iters: int = 3,
    nprobe: int = 2,
    scope: CacheScope | None = None,
) -> DataFrame:
    """Recall@k of the in-session trained IVF path (trains the
    quantizer inline — for index-less use; the registered query goes
    through the persisted index via ``operators.ann_index`` instead).

    The vector table feeds the brute-force scan, every Lloyd
    iteration, and the final probe scan — persisted once under
    ``scope`` so the iterative driver loop doesn't re-read the source
    per job (auto-released with the result when no scope is passed)."""
    scope, own = scope_or_own(scope)
    vectors = scope.persist(vectors)
    ann = knn_ivf_kmeans(
        vectors, query_ids, k=k, n_clusters=n_clusters, iters=iters, nprobe=nprobe,
        scope=scope,
    )
    out = recall_vs_bruteforce(vectors, ann, query_ids, k=k, nprobe=nprobe)
    return scope.attach(out) if own else out


#: seed namespace for the deterministic random-hyperplane family
RHP_SEED = "rhp-v1"


def rhp_sign_planes(n_planes: int, dim: int, seed: str = RHP_SEED) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix: component (p, i) is the
    parity of ``md5(seed:p:i)``'s first byte. Sign-random hyperplanes
    (Charikar's SimHash for real vectors) need only ±1 components —
    the matrix is a *constant* derived from a public hash, so the Spark
    plan and the DuckDB oracle are generated from the same literals and
    cannot drift."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"{seed}:{p}:{i}".encode()).digest()[0] & 1 else -1.0
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def rhp_banded(
    vectors: DataFrame,
    planes: list[list[float]],
    bands: int,
    rows_per_band: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, bucket) rows: bucket = the band's ``rows_per_band``
    hyperplane sign bits packed into an int. Linear in N — each vector
    computes ``len(planes)`` dot products map-side and emits ``bands``
    narrow rows. Deliberately id-only: the vectors rejoin *after* the
    candidate-pair distinct, so the band shuffle moves 3 small ints per
    row instead of the embedding payload.

    Implementation history (round 6): the per-plane dots are an
    Arrow-batched ``mapInPandas`` kernel. Column-expression HOF folds
    (``aggregate(zip_with(...))``) run on Spark's INTERPRETED
    expression path — 16-32 folds × 64 lanes per row made banding the
    dominant cost of every RHP query (~0.8-1.7 s at sf0.1) — and a
    flat 2048-term codegen sum blew past JIT method limits and ran 4×
    slower still. The kernel computes each dot with an explicit
    dim-order accumulation loop (``acc = acc + V[:, i] * p_i``,
    vectorized across rows), which is the SAME IEEE left fold as
    :func:`dot` and the oracle's ``list_reduce`` — sign decisions and
    hashes are bit-identical, pinned by the unchanged cross-engine
    oracle matches of every RHP query."""
    import numpy as np

    P = np.asarray(planes, dtype=np.float64)
    nb, rpb = bands, rows_per_band

    def kern(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            n = len(V)
            bits = np.zeros((n, len(P)), dtype=np.int64)
            for p in range(len(P)):
                acc = np.zeros(n)
                for i in range(V.shape[1]):
                    # exact left-fold order: ((0 + t0) + t1) + ...
                    acc = acc + V[:, i] * P[p, i]
                bits[:, p] = acc > 0
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            out_id = np.repeat(ids, nb)
            out_band = np.tile(np.arange(nb, dtype=np.int32), n)
            weights = (1 << np.arange(rpb, dtype=np.int64))
            buckets = np.stack(
                [bits[:, b * rpb : (b + 1) * rpb] @ weights for b in range(nb)],
                axis=1,
            ).reshape(-1)
            yield pd.DataFrame(
                {"_id": out_id, "band": out_band, "bucket": buckets}
            )

    return vectors.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        kern, schema="_id long, band int, bucket long"
    )


def rhp_params_for(
    n: int,
    threshold: float = 0.9,
    target_per_vec: float = 16.0,
    recall: float = 0.95,
    max_bands: int = 12,
) -> tuple[int, int]:
    """N-aware LSH sizing: ``(bands, rows_per_band)`` for
    :func:`near_dup_pairs_rhp` such that RANDOM candidate mass stays
    ~linear in ``n`` while pairs at cosine ≥ ``threshold`` are still
    found with probability ≥ ``recall``.

    Why this must scale with N (round-8 scaling curves, PERF_NOTES
    §r8): with FIXED band width ``r``, unrelated pairs collide per band
    at ~2^-r of all pairs, so the candidate count grows Θ(b·N²/2^r) —
    quadratic with a small constant that stops being small at corpus
    scale. Holding candidates at ``target_per_vec`` per vector needs
    ``2^r ≳ b·N/target`` ⇒ ``r = Θ(log N)``; recall at the planted
    threshold then sags as p_band = p^r shrinks, so the band COUNT
    grows to compensate: ``b = ln(1/(1-recall)) / p^r``. Total planes
    ``b·r = Θ(log N)`` per vector — the standard S-curve tuning,
    applied as a function of corpus size instead of a constant.

    Uniform-bucket approximation on the random side; clustered data
    concentrates harder, which the measured curves (tools/
    scaling_curves.py) quantify against this rule."""
    import math

    p_plane = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi

    def r_for(b: int) -> int:
        return max(4, math.ceil(math.log2(max(b * n / target_per_vec, 2.0))))

    b = 4
    for _ in range(8):  # b and r are interdependent; a few rounds settle
        p_band = p_plane ** r_for(b)
        need_b = math.ceil(math.log(1.0 / (1.0 - recall)) / p_band)
        need_b = min(max_bands, max(1, need_b))
        if need_b == b:
            break
        b = need_b
    # r is ALWAYS recomputed from the final b: if the fixed-point loop
    # exhausts its iterations without converging (or oscillates between
    # two (b, r) pairs), returning the r of the PREVIOUS b alongside the
    # new b would hand the caller an internally inconsistent family
    # (round-9 ADVICE fix).
    return b, r_for(b)


def rhp_mask_bits(
    n: int,
    bands: int,
    target_per_vec: int = 16,
    lo: int = 4,
    hi: int = 24,
) -> int:
    """Smallest ``r`` in ``[lo, hi]`` with ``2^r · target ≥ bands · n``
    — the N-aware band WIDTH as pure integer arithmetic, so a SQL
    oracle can compute the identical ``r`` from a ``COUNT(*)`` scalar
    subquery (``MIN(r) FROM range(lo, hi+1) WHERE (1 << r) * target >=
    bands * n``) with zero float/log2 boundary hazard. Holding the
    expected RANDOM collision mass at ``target_per_vec`` candidates per
    vector per the uniform-bucket model (candidates ≈ bands·n²/2^r)
    needs exactly ``2^r ≳ bands·n/target`` — the same Θ(log N) growth
    as :func:`rhp_params_for`, but with the band COUNT held fixed so
    the plane pool (and hence the oracle's plane literals) is a
    compile-time constant and only the MASK varies with N.

    ``hi`` caps the pool size: with the default 24 the rule is exact up
    to ``n ≈ 2^24·target/bands`` (33 M vectors at 8 bands) and saturates
    above it — corpus runs beyond the cap belong on
    :func:`near_dup_pairs_rhp_auto`, which grows both ``b`` and ``r``
    unbounded."""
    for r in range(lo, hi + 1):
        if (1 << r) * int(target_per_vec) >= bands * int(n):
            return r
    return hi


def near_dup_pairs_rhp_auto(
    vectors: DataFrame,
    threshold: float,
    dim: int = 64,
    target_per_vec: float = 16.0,
    recall: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scope: CacheScope | None = None,
) -> DataFrame:
    """:func:`near_dup_pairs_rhp` with the band family sized to the
    corpus by :func:`rhp_params_for` (one cheap count job first).

    This is the variant to deploy at scale. The round-8 curves
    (SCALING_r8.json / PERF_NOTES §r8) measured the fixed 4-band×8-bit
    family at growth exponent 2.0 in candidate pairs — 3 252 → 3.57 M
    candidates from 600 → 20 000 vectors, and 150 s wall for the
    blocked-clusters query at sf1 — while this N-aware family held
    exponent ~1.17 at ≥ 0.95 recall on planted cosine-0.99 twins. The
    FIXED family stays the registered/oracle-pinned shape (its banding
    appears literally in the cross-engine SQL); production corpus runs
    should come through here."""
    n = vectors.count()
    bands, rows_per_band = rhp_params_for(
        n, threshold=threshold, target_per_vec=target_per_vec, recall=recall
    )
    return near_dup_pairs_rhp(
        vectors,
        threshold,
        n_planes=bands * rows_per_band,
        bands=bands,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
        scope=scope,
    )


def near_dup_pairs_rhp(
    vectors: DataFrame,
    threshold: float,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scope: CacheScope | None = None,
    bucket_mask: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs by random-hyperplane LSH, verified by
    exact cosine ≥ ``threshold`` — the 100 TB path for embedding dedup.

    The block-grid GEMM (:func:`near_dup_pairs_exact`) bounds *memory*
    but its O(N²·d) compute is inherent to exactness; this operator
    bounds *compute*: only pairs colliding in ≥ 1 of ``bands`` LSH
    bands (each ``n_planes // bands`` sign bits) are scored. Collision
    probability follows the standard S-curve 1-(1-(1-θ/π)^r)^b — pairs
    at cosine ≥ 0.9 are found with p ≈ 0.95 at 4×4, while the ~N²·d
    work on unrelated pairs never happens.

    Shape, in shuffle order: band self-join on id-only rows (3 ints per
    row) → distinct (kept_id, dup_id) pairs → rejoin the two embeddings
    by id → exact cosine. Candidate pairs through the join+distinct are
    16 bytes each, not 2·d floats — at sf0.1 that one change (plus
    per-vector norms computed once instead of per pair) took the query
    from 13.5 s to the low seconds. Per-vector ``l2_norm`` is folded in
    the same index order as the per-pair form, so ``dot/(nᵢ·nⱼ)`` is
    bit-identical to the oracle's ``dot/(√dot(a,a)·√dot(b,b))``.

    Caller contract: ``vectors`` is scanned TWICE — once to build the
    banded table, once to build the normed rejoin table (each persisted
    under ``scope`` after its scan). This is deliberate: both are
    narrow column-pruned parquet reads, and pinning the full embedding
    payload in executor memory just to save the second scan is exactly
    the O(N·d)-resident footprint this operator avoids. Callers holding
    ``vectors`` already persisted (e.g. inside a multi-query scope) pay
    nothing extra.
    """
    rows_per_band = n_planes // bands
    planes = rhp_sign_planes(n_planes, dim)
    scope, own = scope_or_own(scope)
    # both self-join sides read the banded table: persist so the
    # n_planes dot products per vector compute once, not twice
    banded = rhp_banded(vectors, planes, bands, rows_per_band, id_col, vec_col)
    if bucket_mask is not None:
        # N-aware masked banding (rhp_mask_bits): the kernel computes
        # the FULL rows_per_band-bit sign word from a fixed plane pool
        # and only the low `r` bits participate in the band key — the
        # pool (plane literals) stays a compile-time constant shared
        # with the SQL oracle while the effective band width grows
        # Θ(log N). The masked full-width word costs rows_per_band dots
        # per band instead of r; that waste is the price of a
        # cross-engine-verifiable family and is bounded by the pool cap
        # (production unverified runs take near_dup_pairs_rhp_auto).
        banded = banded.withColumn(
            "bucket", F.col("bucket").bitwiseAND(F.lit(int(bucket_mask)))
        )
    banded = scope.persist(banded)
    left = banded.select(F.col("_id").alias("kept_id"), "band", "bucket")
    right = banded.select(F.col("_id").alias("dup_id"), "band", "bucket")
    pairs = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("kept_id") < F.col("dup_id"))
        .select("kept_id", "dup_id")
        .distinct()
    )
    # norm once per vector (identical IEEE fold to the per-pair form),
    # then one dot per surviving candidate pair; persisted because both
    # rejoin sides scan it (else the source is read + normed per side)
    normed = scope.persist(
        vectors.select(
            F.col(id_col).alias("_nid"),
            F.col(vec_col).alias("_nv"),
            l2_norm(F.col(vec_col)).alias("_nn"),
        )
    )
    paired = pairs.join(
        normed.select(
            F.col("_nid").alias("kept_id"),
            F.col("_nv").alias("v_i"),
            F.col("_nn").alias("n_i"),
        ),
        "kept_id",
    ).join(
        normed.select(
            F.col("_nid").alias("dup_id"),
            F.col("_nv").alias("v_j"),
            F.col("_nn").alias("n_j"),
        ),
        "dup_id",
    )

    # per-pair exact cosine as an Arrow kernel with the explicit
    # dim-order accumulation loop — the same IEEE left fold as `dot`
    # and the oracle's list_reduce (see rhp_banded's note; the
    # interpreted HOF fold over 10^5-10^6 candidate pairs was the
    # other half of the RHP queries' cost). Hashes pinned unchanged by
    # the cross-engine oracle matches.
    thr = float(threshold)

    def rescore(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            A = np.array(list(pdf["v_i"]), dtype=np.float64)
            B = np.array(list(pdf["v_j"]), dtype=np.float64)
            acc = np.zeros(len(A))
            for i in range(A.shape[1]):
                acc = acc + A[:, i] * B[:, i]
            cos = acc / (pdf["n_i"].to_numpy() * pdf["n_j"].to_numpy())
            keep = cos >= thr
            yield pd.DataFrame(
                {
                    "dup_id": pdf["dup_id"].to_numpy(dtype=np.int64)[keep],
                    "kept_id": pdf["kept_id"].to_numpy(dtype=np.int64)[keep],
                    "cosine": cos[keep],
                }
            )

    out = paired.mapInPandas(
        rescore, schema="dup_id long, kept_id long, cosine double"
    )
    return scope.attach(out) if own else out


def near_dup_pairs_exact(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 512,
    scope: CacheScope | None = None,
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

    # block id by integer division — no count() pre-pass; sparse id
    # spaces just yield under-full tiles (efficiency, never correctness)
    blocked = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.expr(f"`{id_col}` div {int(block_rows)}").alias("_blk"),
    )
    # one matrix row per block, members sorted by id so that inside a
    # diagonal cell row-index order == id order (upper triangle == i<j)
    scope, own = scope_or_own(scope)
    tiles = scope.persist(  # consumed by both sides of the grid join
        blocked.groupBy("_blk").agg(
            F.sort_array(F.collect_list(F.struct("_id", "_v"))).alias("_rows")
        )
    )
    # the upper-triangle cell list carries BLOCK IDS ONLY (two longs per
    # cell); tile payloads then arrive via two keyed equi-joins, so no
    # executor ever holds more than the tiles of the cells it is
    # scoring — broadcasting the full tile table would re-create the
    # O(N·d)-per-node ceiling this operator exists to avoid. Shuffle
    # volume is O(N·d·n_blocks) = the O(N²·d) compute divided by
    # block_rows: streamed, never resident.
    cells = tiles.select(F.col("_blk").alias("blk_a")).join(
        tiles.select(F.col("_blk").alias("blk_b")), F.col("blk_a") <= F.col("blk_b")
    )
    grid = (
        cells.join(
            tiles.select(F.col("_blk").alias("blk_a"), F.col("_rows").alias("rows_a")),
            "blk_a",
        )
        .join(
            tiles.select(F.col("_blk").alias("blk_b"), F.col("_rows").alias("rows_b")),
            "blk_b",
        )
        # spread cells across tasks; AQE sizes the shuffle partition count
        .repartition("blk_a", "blk_b")
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

    out = grid.mapInPandas(gemm_cells, schema=out_schema)
    return scope.attach(out) if own else out


def frozen_cluster_profile(
    vectors: DataFrame,
    codebook: "list[list[float]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scope: CacheScope | None = None,
) -> DataFrame:
    """Corpus clustering with a FROZEN k-means codebook: hard-assign
    every vector to its nearest centroid and profile each cluster —
    size, majority ``label_col`` with its count and purity, and mean
    cosine-to-centroid (cluster tightness). The topic-bucketing /
    cluster-balance pass of a training-data pipeline, as the
    assignment half of k-means with the iterative training factored
    out into the shipped codebook (``operators/codebook.py``).

    Everything is closed-form Column arithmetic with an exact SQL
    twin: assignment is the same weak-dominance argmax as
    ``knn_ivf_frozen`` (ties → lowest cluster); the cosine to the
    ASSIGNED centroid is ``greatest(s_0..s_{nc-1}) / ||v||`` (the
    argmax's score IS the greatest score, tie-insensitive because
    tied scores are equal by definition); and the mean is a
    per-row-rounded exact-decimal sum divided once — no
    order-dependent float accumulation anywhere.

    Scale shape: ONE scan computes all ``nc`` scores per row and
    feeds a single vector-scale aggregation to (cluster, label)
    partials (map-side combinable, ≤ nc·|labels| groups); the
    per-cluster totals, majority-label window, and final join all run
    on the PERSISTED aggregate — the persist is what keeps it to one
    scan (the two consumers prune different columns, so Catalyst
    cannot reuse their exchanges). Nothing shuffles at vector scale.
    """
    nc = len(codebook)
    s_cols = [
        F.expr(_codebook_score_sql(vec_col, c)).alias(f"_s{i}")
        for i, c in enumerate(codebook)
    ]
    base = vectors.select(F.col(id_col), F.col(label_col), F.col(vec_col), *s_cols)

    cluster = F.lit(nc - 1)
    for c in range(nc - 2, -1, -1):
        cond = F.lit(True)
        for j in range(c + 1, nc):
            cond = cond & (F.col(f"_s{c}") >= F.col(f"_s{j}"))
        cluster = F.when(cond, F.lit(c)).otherwise(cluster)
    cos = F.greatest(*[F.col(f"_s{i}") for i in range(nc)]) / l2_norm(
        F.col(vec_col)
    )
    assigned = base.select(
        cluster.cast("int").alias("cluster"),
        F.col(label_col).alias("_lab"),
        F.round(cos, 9).cast("decimal(18,12)").alias("_cos"),
    )

    # ONE vector-scale aggregation: per-(cluster,label) partials carry
    # both the counts and the decimal cosine sums, and the per-cluster
    # totals re-aggregate from them (exact decimal addition is
    # associative, so the two-level sum is bit-identical to a direct
    # one) — the nc×dim score computation runs over the data once,
    # with the aggregate persisted so its two consumers share it.
    scope, own = scope_or_own(scope)
    lab = scope.persist(
        assigned.groupBy("cluster", "_lab").agg(
            F.count(F.lit(1)).alias("_ln"),
            F.sum("_cos").alias("_lsc"),
        )
    )
    per = lab.groupBy("cluster").agg(
        F.sum("_ln").alias("n_vectors"),
        F.sum("_lsc").alias("_sc"),
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("_ln"), F.asc("_lab"))
    top = (
        lab.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            "cluster",
            F.col("_lab").alias("top_label"),
            F.col("_ln").alias("top_label_n"),
        )
    )
    out = (
        per.join(top, "cluster")
        .select(
            "cluster",
            "n_vectors",
            "top_label",
            "top_label_n",
            F.round(
                F.col("top_label_n").cast("double") / F.col("n_vectors"), 6
            ).alias("purity"),
            F.round(
                F.col("_sc").cast("decimal(24,12)").cast("double")
                / F.col("n_vectors"),
                6,
            ).alias("avg_cosine"),
        )
        .orderBy("cluster")
    )
    return scope.attach(out) if own else out
