"""Connected components over duplicate-pair edges.

Near-dup detection (``text_dedup``, ``similarity``) emits *pairs*; a
real pipeline must turn pairs into duplicate CLUSTERS before choosing
keepers — similarity is not transitive, so "A≈B, B≈C" only groups
{A, B, C} after a transitive-closure step. This operator computes, for
every node that appears in at least one edge, the component label
``min(doc_id in component)`` — the deterministic keeper choice (the
same keep-smallest-id rule the pair operators use).

Algorithm: distributed min-label propagation. Each iteration every
node's label becomes the minimum of its own and its neighbors' labels —
one self-join + one min-aggregate per iteration, shuffling only
``(node, label)`` longs. Convergence after at most ``diameter``
iterations; duplicate clusters are near-cliques (LSH buckets), so the
expected iteration count is 2–3. The loop is driver-orchestrated but
the driver holds zero data — per-iteration state is one persisted
(node, label) table on the executors, and the convergence check is a
``count``. For adversarial long-chain graphs at the billion-edge scale,
the published alternating small-star/large-star rewiring (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14) replaces
the O(diameter) bound with O(log²) — same join/agg building blocks;
the per-iteration shape below is unchanged.

Reference parity note: the reference has no graph step (its dedup is
exact-key only, ``app/services/ingestor.py:468-496``); this extends the
dedup story the same way MinHash/SimHash do (SURVEY.md §7.2 step 10).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kingsfoil_seed_data_ingestor_spark.operators.caching import (
    CacheScope,
    scope_or_own,
)


def _ensure_checkpoint_dir(spark) -> None:
    """Iterative plans need ``checkpoint()`` to truncate lineage — an
    un-truncated loop doubles the Catalyst tree every iteration and
    analysis cost goes exponential (measured: a 12-hop chain never
    finished planning). Reliable checkpoints go to the configured dir;
    default one lazily for sessions (tests, the driver harness) that
    never set it. On a cluster, point this at shared storage.

    File lifetime: sessions built by ``session.get_spark`` set
    ``spark.cleaner.referenceTracking.cleanCheckpoints`` so files die
    with their RDDs; that conf is static, so for foreign sessions the
    defaulted tmp dir is registered for removal at interpreter exit —
    checkpoint data from finished runs never outlives the process."""
    import atexit
    import shutil

    sc = spark.sparkContext
    if sc._jsc.sc().checkpointDir().isEmpty():
        ckpt_dir = tempfile.mkdtemp(prefix="kingsfoil-ckpt-")
        sc.setCheckpointDir(ckpt_dir)
        atexit.register(shutil.rmtree, ckpt_dir, True)


def connected_components(
    edges: DataFrame,
    src: str = "i",
    dst: str = "j",
    max_iterations: int = 25,
    scope: CacheScope | None = None,
    reliable_checkpoints: bool = True,
) -> DataFrame:
    """(node, component) for every node incident to an edge, where
    ``component`` is the smallest node id in the node's connected
    component.

    ``edges`` is treated as undirected; direction and duplicate edges
    are irrelevant. Raises if the propagation has not converged after
    ``max_iterations`` (a correctness guard — returning early would
    silently split components).

    ``reliable_checkpoints``: per-iteration lineage truncation
    defaults to durable checkpoint FILES — they cost a filesystem
    round-trip per iteration but pin no executor storage, which keeps
    the repo's cache-discipline contract (test_caching: zero persistent
    RDDs after a query drains — ``localCheckpoint`` blocks linger until
    the JVM context cleaner collects them). Pass ``False`` for
    executor-local checkpoint blocks in latency-sensitive interactive
    use; measured difference on local[32] is small (~0.2 s/round) and
    results are byte-equal either way.
    """
    scope, own = scope_or_own(scope)
    if reliable_checkpoints:
        _ensure_checkpoint_dir(edges.sparkSession)

    def _ckpt(df: DataFrame) -> DataFrame:
        if reliable_checkpoints:
            # eager: a lazy reliable checkpoint recomputes the plan a
            # second time for the checkpoint write
            return df.checkpoint(eager=True)
        # lazy local checkpoint: the convergence-sum aggregate right
        # after this call materializes the blocks AND computes the sum
        # in ONE job — eager=True would spend a separate job per
        # iteration just materializing (~0.3 s of pure scheduling
        # overhead per round on local[32])
        return df.localCheckpoint(eager=False)
    sym = scope.persist(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
    )
    # eager checkpoint per iteration: truncates BOTH the Catalyst plan
    # and the RDD lineage, so iteration cost stays flat instead of the
    # tree doubling every round; nothing stays pinned in executor
    # memory (checkpoints are files, cleaned with the checkpoint dir)
    # init with the first propagation hop pre-applied: label(n) =
    # min(n, neighbors(n)) comes straight off the edge aggregation,
    # saving one full join+checkpoint round
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.least(F.col("a"), F.min("b")).alias("label"))
    )
    labels = _ckpt(labels)

    def label_sum(df: DataFrame):
        # labels only ever DECREASE (least of own and neighbor min), so
        # the label total is a strictly decreasing convergence witness:
        # sum unchanged ⟺ no label changed. One cheap aggregate over the
        # checkpointed table replaces a per-iteration diff join.
        # decimal: exact far beyond int64 at billion-node × wide-id scale
        return df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]

    # ``max_iterations`` bounds CHANGING propagation rounds only — the
    # final no-change round that *confirms* the fixpoint is always
    # allowed, so a graph converging exactly on the last budgeted round
    # is not misreported as divergent
    prev_sum = label_sum(labels)
    changing_rounds = 0
    while True:
        # min label among each node's neighbors, then keep min(own, that)
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.alias("l")
            .join(neighbor_min.alias("n"), "node", "left")
            .select(
                "node",
                F.least(
                    F.col("l.label"), F.coalesce(F.col("n.nbr_label"), F.col("l.label"))
                ).alias("label"),
            )
        )
        labels = _ckpt(labels)
        new_sum = label_sum(labels)
        if new_sum == prev_sum:
            break
        changing_rounds += 1
        if changing_rounds > max_iterations:
            raise RuntimeError(
                f"connected_components did not converge in {max_iterations} "
                "iterations — pathological graph diameter; switch to "
                "small-star/large-star"
            )
        prev_sum = new_sum
    out = labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component_id")
    )
    return scope.attach(out) if own else out


def component_stats(components: DataFrame) -> DataFrame:
    """Per-cluster summary: size and id span — the table a dedup job
    reports (how many clusters, how big, which keeper)."""
    return components.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("doc_id").alias("max_doc_id"),
    )
