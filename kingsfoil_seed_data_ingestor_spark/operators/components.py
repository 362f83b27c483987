"""Connected components over duplicate-pair edges.

Near-dup detection (``text_dedup``, ``similarity``) emits *pairs*; a
real pipeline must turn pairs into duplicate CLUSTERS before choosing
keepers — similarity is not transitive, so "A≈B, B≈C" only groups
{A, B, C} after a transitive-closure step. This operator computes, for
every node that appears in at least one edge, the component label
``min(doc_id in component)`` — the deterministic keeper choice (the
same keep-smallest-id rule the pair operators use).

Two algorithms behind one output contract, composed adaptively:

* **Min-label propagation** (``connected_components_minlabel``): each
  round every node's label becomes the minimum of its own and its
  neighbors' labels — one join + min-aggregate per round, converging
  in at most ``diameter`` rounds. The cheapest path for real dup
  graphs (LSH buckets are near-cliques: 1-2 rounds), unbounded on
  adversarial chains.
* **Alternating small-star/large-star** (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14): each round rewires
  every edge toward its neighborhood minimum — large-star links each
  node's LARGER neighbors to the neighborhood min, small-star the
  smaller ones — contracting the graph toward a star forest rooted at
  component minima in **O(log² n) rounds regardless of diameter** (in
  practice ~log₂). Each round shuffles only id pairs, the same volume
  class as one label hop, but costs ~2 aggregate+join shapes instead
  of 1.

``connected_components`` (the production default) runs a BOUNDED
min-label prefix (``fast_rounds``, default 3 changing rounds) with
POINTER-JUMPING acceleration (optimization round 11: each round also
applies ``label(n) ← label(label(n))``, doubling label reach per round
— a diameter-d graph converges in ~log₂ d changing rounds instead of
d, so chains of near-dup clusters up to diameter ~15 stay inside the
cheap prefix; measured on the sf0.1 32-bit simhash pair graph,
diameter ≈ 9: 5.2 s → 3.5 s warm) and DELTA PROPAGATION (optimization
round 11, second pass: each round pushes only the labels that changed
last round — semi-naive evaluation with per-round label states
provably identical to the naive hop, so round counts are unchanged
while per-round volume decays with the frontier), and
on non-convergence contracts the graph by the partial labels and
finishes with the star algorithm, whose round count is logarithmic no
matter what the input looks like.
Total rounds ≤ fast_rounds + O(log² n); typical cost = min-label's.
``fast_rounds=0`` skips the prefix (pure star) — used by the
registered blocked semantic-clustering query so the star path runs
under the driver's oracle gate every round.

All loops are driver-orchestrated but the driver holds zero data —
per-round state is one checkpointed/cached edge-or-label table on the
executors, and convergence checks are single aggregates.

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


def _symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Both directions of every edge as (a, b) — via a 2-element
    explode, NOT a self-union: a union references its input twice, and
    when the input is an expensive un-materialized plan (LSH banding +
    rescore feeding the components step) that doubles the whole
    upstream compute in the job that first touches it."""
    return edges.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
            )
        ).alias("_e")
    ).select("_e.a", "_e.b")



def _minlabel_phase(
    edges: DataFrame,
    src: str,
    dst: str,
    budget: int,
    scope: CacheScope,
    reliable_checkpoints: bool = True,
    jump: bool = False,
    extend: bool = False,
    fuse: int = 1,
) -> tuple[DataFrame, bool, int]:
    """Bounded min-label propagation: returns ``(labels, converged,
    changing_rounds)`` with ``labels = (node, label)`` for every node
    incident to an edge. ``budget`` bounds CHANGING rounds only — the
    final no-change round that confirms the fixpoint is always allowed.
    Never raises on non-convergence; the caller decides (the adaptive
    operator falls through to the star algorithm, the pure min-label
    wrapper raises).

    Two execution-shape properties (optimization round 11) keep the
    per-round cost node-sized instead of edge-sized, without changing
    any round's label state (so round counts, convergence behavior and
    the budget semantics are exactly the pre-change ones):

    * **Delta propagation (semi-naive):** each round pushes only the
      labels that CHANGED last round. A label that did not change was
      pushed in full the round it last changed, so re-pushing it cannot
      lower any neighbor's min — per-round hop volume decays with the
      frontier instead of staying O(nodes): the hop's build side (the
      labels the planner broadcasts at bench scale) and the matched-row
      aggregate both shrink with the frontier. The per-row ``changed``
      flag (new < previous label — labels only ever decrease) doubles
      as the convergence witness: no flag set ⟺ fixpoint. Its count
      rides the checkpoint materialization as an ``Observation``, one
      Spark job per round (the pre-r11 decimal label-sum witness,
      specialized: sum unchanged ⟺ no flag set).
    * **The symmetrized edge table is persisted pre-partitioned (and
      pre-sorted) on the probe key ``b``.** At bench scale this is
      ~neutral (the labels side broadcasts, so the cached edges are
      never exchanged either way — verified in the hop plan); it is a
      SCALE-shape decision: once the label table outgrows the broadcast
      threshold the hop becomes a sort-merge join, and the cached
      hash-partitioning + sort order mean only the node-sized side is
      ever shuffled or sorted per round — the edge table is laid out
      once at cache fill (guide §2.4: operations keyed the same way
      share one exchange).

    ``extend`` (optimization round 11, closing session) softens the
    budget with a GEOMETRIC-COLLAPSE rule: a round past ``budget`` is
    allowed whenever the frontier at least HALVED in that round
    (``pending × 2 ≤ previous pending``). Motivation, measured on the
    registered sf0.1 graphs: ``dedup_simhash_groups``' pair graph runs
    pending = 4403 → 4001 → 3148 → 1864 → 9 — it gives up at the budget
    with 9 of 4403 labels unsettled and pays the whole
    contraction + star machinery for a frontier one hop from done. The
    rule is SELF-BOUNDING: every extended round requires another
    halving, so at most ⌈log₂(pending at the first over-budget round)⌉
    extra rounds can ever run — total changing rounds ≤ budget +
    log₂ n, the same complexity class as the star fallback it skips —
    and a frontier that stops halving (adversarial chains decay
    arithmetically: the 200-path fixture runs 201 → 199 → 196 → 190 →
    178 …) still gives up at the first non-halving over-budget round,
    exactly where the un-extended budget would. Label states per round
    are untouched — the rule only decides how long the loop runs, so
    converged results are identical and the fallback path is byte-equal.
    Kept OFF for the pure referee wrapper, whose ``max_iterations``
    contract is a documented hard bound.

    ``jump`` (optimization round 11) appends a POINTER-JUMPING shortcut
    to every round — Shiloach-Vishkin style: after the neighbor hop,
    ``label(n) ← label(label(n))``. Labels are monotone
    (``label(x) ≤ x``), so the jump is sound (``label(n)``'s label is
    an id in the same component) and DOUBLES the label's reach per
    round: a diameter-d graph converges in ~log₂ d changing rounds
    instead of d. The extra cost is one node-sized hash join per round
    (no edge shuffle). Kept OFF for the pure referee wrapper so
    ``connected_components_minlabel`` stays the independent O(diameter)
    formulation the parity tests pin the fast paths against.

    ``fuse`` (optimization round 12) runs ``fuse`` consecutive rounds
    inside ONE checkpointed plan. The decision sequence is byte-equal
    to the unfused loop: the fused frame carries each inner round's
    ``(label, changed)`` beside the final one, a single ``Observation``
    on the one materialization job yields every inner round's pending
    count, and the budget / geometric-collapse / convergence checks
    replay those counts in order — when the unfused loop would have
    stopped after an inner round, the fused loop returns THAT round's
    carried label state. **Measured and REJECTED as the default**
    (kept as an option so the negative result stays reproducible —
    ``tools/exp_fused_rounds.py``): each round's subtree is referenced
    up to 4× by the next round's plan (delta filter, keep-own side,
    and twice via the pointer self-join), and those references are NOT
    deduplicated — the fused plan for two rounds carries 16 checkpoint
    scans / 22 BroadcastExchanges with zero ReusedExchange nodes, and
    under AQE every one of them is a separately-scheduled stage job.
    Measured: spider fixture 74 jobs (fuse=2) vs 42 (fuse=1) at equal
    wall; the 5-consumer component suite 46–129 jobs/query fused vs
    23–63 unfused with wall 1.3–1.4× WORSE. The per-round checkpoint
    is precisely what caps the reference blowup — removing it trades
    one scheduling barrier for O(refs^rounds) duplicated stages.
    """
    if reliable_checkpoints:
        _ensure_checkpoint_dir(edges.sparkSession)

    from pyspark.sql import Observation

    def _ckpt_with_pendings(df: DataFrame, flag_cols: list):
        """Checkpoint one round and return ``(df, [counts...])`` — one
        pending count per boolean flag column, all collected by the
        SAME materialization job (the fused loop observes every inner
        round's pending count here).

        A parquet write + read-back instead of the eager reliable
        checkpoint was tried and REJECTED by measurement (optimization
        round 12): the checkpoint's second pass (the RDD checkpoint
        write re-running the plan) reuses the round's shuffle files and
        already-materialized broadcasts, so it is nearly free, while
        the parquet route pays the file-committer protocol + listing
        per round — the 5-consumer component suite measured 14.3–15.7 s
        (checkpoint) vs 22.4–30.2 s (parquet) best-of-3 interleaved."""
        aggs = [
            F.sum(F.col(c).cast("long")).alias(f"c{i}")
            for i, c in enumerate(flag_cols)
        ]
        if reliable_checkpoints:
            # eager: a lazy reliable checkpoint recomputes the plan a
            # second time for the checkpoint write; the observed counts
            # are collected by the same materialization job
            obs = Observation()
            out = df.observe(obs, *aggs).checkpoint(eager=True)
            got = obs.get
            return out, [got[f"c{i}"] for i in range(len(flag_cols))]
        # lazy local checkpoint: the observed pending count right after
        # this call materializes the blocks AND computes the count in
        # ONE job — eager=True would spend a separate job per iteration
        # just materializing
        out = df.localCheckpoint(eager=False)
        row = out.agg(*aggs).first()
        return out, list(row)

    def _ckpt_with_pending(df: DataFrame):
        out, counts = _ckpt_with_pendings(df, ["changed"])
        return out, counts[0]

    sym = scope.persist(
        _symmetrize(edges, src, dst)
        .repartition(F.col("b"))
        .sortWithinPartitions("b")
    )
    # eager checkpoint per iteration: truncates BOTH the Catalyst plan
    # and the RDD lineage, so iteration cost stays flat instead of the
    # tree doubling every round; nothing stays pinned in executor
    # memory (checkpoints are files, cleaned with the checkpoint dir)
    # init with the first propagation hop pre-applied: label(n) =
    # min(n, neighbors(n)) comes straight off the edge aggregation,
    # saving one full join+checkpoint round. Every node starts dirty:
    # its init label is unpushed information for all its neighbors.
    # (A pointer jump at init was tried and REJECTED by measurement:
    # jump trajectories are not pointwise comparable — accelerating
    # one node can leave another's label a round behind — and on the
    # sf0.1 simhash graph the init-jump variant needed 4 changing
    # rounds where the plain init needs 3.)
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.least(F.col("a"), F.min("b")).alias("label"))
    ).withColumn("changed", F.lit(True))
    labels, pending = _ckpt_with_pending(labels)

    def _one_round(cur: DataFrame, carry: list) -> DataFrame:
        """One min-label round over ``cur`` (node, label, changed,
        *carry): min label among each node's CHANGED neighbors (delta
        push), then keep min(own, that), then the optional pointer
        jump. Returns (node, *carry, label, changed); ``carry`` columns
        pass through untouched — the fused loop uses them to keep every
        inner round's state beside the final one."""
        delta = cur.filter("changed").select("node", "label")
        neighbor_min = (
            sym.join(delta, sym.b == delta.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        out = (
            cur.alias("l")
            .join(neighbor_min.alias("n"), "node", "left")
            .select(
                "node",
                *[F.col(f"l.{c}").alias(c) for c in carry],
                F.col("l.label").alias("_prev"),
                F.least(
                    F.col("l.label"),
                    F.coalesce(F.col("n.nbr_label"), F.col("l.label")),
                ).alias("label"),
            )
        )
        if jump:
            # pointer-jumping shortcut: label(n) ← label(label(n)).
            # Every label value is itself a node incident to an edge
            # (it is min of a neighborhood ∪ self), so it has a row in
            # the label table; the left join + coalesce only defends
            # the self-plan reference. Monotonicity (label(x) ≤ x)
            # makes the composed value a further decrease within the
            # same component — the changed-flag convergence witness is
            # intact (the jump can only lower ``label`` further below
            # ``_prev``).
            ptr = out.select(
                F.col("node").alias("_pn"), F.col("label").alias("_pl")
            )
            out = (
                out.join(ptr, out.label == F.col("_pn"), "left")
                .select(
                    "node",
                    *carry,
                    "_prev",
                    F.coalesce(F.col("_pl"), F.col("label")).alias("label"),
                )
            )
        return out.select(
            "node",
            *carry,
            "label",
            (F.col("label") < F.col("_prev")).alias("changed"),
        )

    prev_pending = pending
    changing_rounds = 0
    converged = True
    hops = max(1, int(fuse))
    done = False
    while not done:
        # ``hops`` rounds built into ONE plan; inner-round states ride
        # along as carried (_l{i}, _c{i}) columns so one checkpoint job
        # materializes everything and one Observation reports every
        # inner round's pending count
        frame = labels
        flags = []
        for h in range(hops - 1):
            frame = _one_round(frame, [c for pair in flags for c in pair])
            lc = (f"_l{h}", f"_c{h}")
            frame = frame.withColumn(lc[0], F.col("label")).withColumn(
                lc[1], F.col("changed")
            )
            flags.append(lc)
        frame = _one_round(frame, [c for pair in flags for c in pair])
        flag_cols = [c for _, c in flags] + ["changed"]
        labels, pendings = _ckpt_with_pendings(frame, flag_cols)
        # replay the unfused loop's decision sequence over the inner
        # rounds' pending counts, in order; when the unfused loop would
        # have stopped after inner round ``h``, adopt THAT round's
        # carried label state (byte-equal results and round counts)
        for h, pending in enumerate(pendings):
            if not pending:
                done = True
            elif changing_rounds + 1 > budget and not (
                extend and pending * 2 <= prev_pending
            ):
                changing_rounds += 1
                converged = False
                done = True
            else:
                changing_rounds += 1
                prev_pending = pending
                continue
            if h < hops - 1:  # stopped at an inner round: restore it
                labels = labels.select(
                    "node",
                    F.col(f"_l{h}").alias("label"),
                    F.col(f"_c{h}").alias("changed"),
                )
            break
    return labels.select("node", "label"), converged, changing_rounds


def connected_components_minlabel(
    edges: DataFrame,
    src: str = "i",
    dst: str = "j",
    max_iterations: int = 25,
    scope: CacheScope | None = None,
    reliable_checkpoints: bool = True,
) -> DataFrame:
    """(node, component) for every node incident to an edge, where
    ``component`` is the smallest node id in the node's connected
    component — via min-label propagation (O(diameter) rounds).

    ``edges`` is treated as undirected; direction and duplicate edges
    are irrelevant. Raises if the propagation has not converged after
    ``max_iterations`` changing rounds (a correctness guard — returning
    early would silently split components). The adaptive default
    ``connected_components`` never has that failure mode; this wrapper
    is the independent referee the parity tests pin it against.

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
    labels, converged, _ = _minlabel_phase(
        edges, src, dst, max_iterations, scope, reliable_checkpoints
    )
    if not converged:
        raise RuntimeError(
            f"connected_components_minlabel did not converge in "
            f"{max_iterations} iterations — pathological graph diameter; "
            "use the default adaptive connected_components"
        )
    out = labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component_id")
    )
    return scope.attach(out) if own else out


# ----------------------------------------------------------------------
# alternating small-star / large-star (round 7 — the production path)
# ----------------------------------------------------------------------


def _canonical_edges(df: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Orient every edge larger→smaller, drop self loops, distinct."""
    return (
        df.select(
            F.greatest(F.col(a), F.col(b)).alias("u"),
            F.least(F.col(a), F.col(b)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Link every node's strictly-LARGER neighbors to its neighborhood
    minimum. With m = min(N(x) ∪ {x}) ≤ x < y the output is already
    oriented u > v with no self loops. NOT deduplicated: output volume
    is ≤ |e| either way (each input edge contributes exactly one (y, m)
    from its smaller endpoint's grouping), so the composed round defers
    the dedup shuffle to small-star's single canonical distinct."""
    sym = e.select(F.col("u").alias("x"), F.col("v").alias("y")).union(
        e.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    mins = (
        sym.groupBy("x")
        .agg(F.min("y").alias("mn"))
        .select("x", F.least("mn", F.col("x")).alias("m"))
    )
    return (
        sym.join(mins, "x")
        .where(F.col("y") > F.col("x"))
        .select(F.col("y").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Link every node's smaller-or-equal neighbors (all of them, given
    the larger→smaller orientation) plus the node itself to its
    neighborhood minimum."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    relinked = (
        e.join(mins, "u")
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .union(mins.select(F.col("u").alias("a"), F.col("m").alias("b")))
    )
    return _canonical_edges(relinked)


def _star_round(e: DataFrame) -> DataFrame:
    """One fused small∘large round in three exchanges.

    Expanding the composition: with m1(x) = min(N(x) ∪ {x}) the
    large-star edge set is L = {(y, m1(x)) : (x,y) ∈ sym, y > x}, and
    small-star over L needs only m2(y) = min of y's L-neighborhood =
    min{m1(x) : x ∈ N(y), x < y}, emitting {(m1(x), m2(y))} per edge
    plus {(y, m2(y))} per grouped node. Both aggregates and their
    consuming joins share one exchange each (ReuseExchange: sym by x,
    half by y), so the whole round is sym-by-x, half-by-y, and the
    canonical distinct — versus ~6 exchanges for the literal
    ``_small_star(_large_star(e))`` composition, which tests pin this
    against on random graphs."""
    sym = _symmetrize(e, "u", "v").select(
        F.col("a").alias("x"), F.col("b").alias("y")
    )
    m1 = (
        sym.groupBy("x")
        .agg(F.min("y").alias("mn"))
        .select("x", F.least("mn", F.col("x")).alias("m1"))
    )
    half = (
        sym.join(m1, "x")
        .where(F.col("y") > F.col("x"))
        .select("y", "m1")
    )
    m2 = half.groupBy("y").agg(F.min("m1").alias("m2"))
    out = (
        half.join(m2, "y")
        .select(F.col("m1").alias("a"), F.col("m2").alias("b"))
        .union(m2.select(F.col("y").alias("a"), F.col("m2").alias("b")))
    )
    return _canonical_edges(out)


def _star_forest(
    edges: DataFrame,
    src: str,
    dst: str,
    max_rounds: int,
    scope: CacheScope,
    stats: dict | None = None,
) -> DataFrame:
    """Run the alternating algorithm to its star-forest fixpoint and
    return the converged canonical edge set ``(u=child, v=root)`` —
    cached under ``scope`` so downstream consumers read it back instead
    of recomputing.

    Convergence: the loop stops as soon as the edge set IS a star
    forest — no node appears as both child and root, and every child
    has exactly one edge. That state is the algorithm's unique fixed
    point (small-star and large-star both map a star to itself), and
    since every intermediate graph partitions nodes into the original
    components (Kiveris et al., Thm 1), each star's root — smaller than
    all its children by edge orientation — is the component minimum.
    Checking the PROPERTY instead of comparing consecutive edge sets
    saves one full rewiring round plus an EXCEPT every call: the check
    is a single union + groupBy aggregate (one job, one shuffle of
    id/flag pairs).

    Round lifecycle — each round's plan executes exactly ONCE: persist
    the round output → convergence check (a SINGLE-SCAN explode/agg, so
    the cache-filling execution runs the round plan once, not twice) →
    if not converged, durable checkpoint WRITTEN FROM THE CACHE (a bare
    eager checkpoint re-executes the plan for the file write — measured
    ~2× the round cost) → unpersist, so nothing stays pinned. The
    per-round truncation bounds the Catalyst tree (e appears 4× in a
    round; un-truncated analysis goes exponential — measured on a
    9-round chain: no materialization 93 s vs ~10 s truncated)."""
    _ensure_checkpoint_dir(edges.sparkSession)
    # persisted: each round references e twice (sym) — the convergence
    # check fills the cache first, so those are cache reads
    e = scope.persist(
        _canonical_edges(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")))
    )

    def is_star_forest(df: DataFrame) -> bool:
        # single reference to df (explode, not union): this check is
        # the action that materializes df's cache, and a union would
        # execute the un-filled plan once per branch
        deg = (
            df.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("u").alias("n"),
                            F.lit(1).alias("c"),
                            F.lit(0).alias("r"),
                        ),
                        F.struct(
                            F.col("v").alias("n"),
                            F.lit(0).alias("c"),
                            F.lit(1).alias("r"),
                        ),
                    )
                ).alias("_d")
            )
            .groupBy(F.col("_d.n").alias("n"))
            .agg(F.sum("_d.c").alias("as_child"), F.sum("_d.r").alias("as_root"))
        )
        bad = deg.where(
            ((F.col("as_child") > 0) & (F.col("as_root") > 0))
            | (F.col("as_child") > 1)
        )
        return bad.isEmpty()

    rounds = 0
    while not is_star_forest(e):
        if rounds >= max_rounds:
            raise RuntimeError(
                f"connected_components did not converge in {max_rounds} "
                "star rounds — exceeds the O(log² n) bound; likely a bug"
            )
        # truncate lineage from the just-filled cache, then release it:
        # the next round builds on the checkpoint leaf, keeping the
        # Catalyst tree flat (it would otherwise 4× per round) and
        # pinning no storage past the loop
        truncated = e.checkpoint(eager=True)
        e.unpersist()
        e = scope.persist(_star_round(truncated))
        rounds += 1
    if stats is not None:
        stats["rounds"] = rounds
    return e


def connected_components(
    edges: DataFrame,
    src: str = "i",
    dst: str = "j",
    max_rounds: int = 40,
    scope: CacheScope | None = None,
    stats: dict | None = None,
    fast_rounds: int = 3,
) -> DataFrame:
    """(node, component) for every node incident to an edge, where
    ``component`` is the smallest node id in the node's connected
    component.

    Adaptive two-phase execution (see module docstring): a min-label
    prefix bounded to ``fast_rounds`` changing rounds — which finishes
    every realistic duplicate graph at the cheap per-round shape — then,
    only if unconverged, the graph is CONTRACTED by the partial labels
    (label endpoints, drop intra-cluster edges) and the alternating
    small-star/large-star algorithm finishes it in O(log² n) rounds
    regardless of diameter. The prefix budget is soft at its boundary
    (``extend`` in ``_minlabel_phase``): over-budget rounds run only
    while the changed-label frontier keeps HALVING — a self-bounding
    rule (≤ log₂ n extra rounds possible) that spares a
    99.8 %-converged graph the whole contraction + star epilogue while
    arithmetically-decaying adversarial chains still fall back exactly
    at the budget. ``fast_rounds=0`` runs pure star. Total rounds ≤
    fast_rounds + log₂ n + O(log² n); there is no input that makes this
    operator's round count unbounded, unlike pure min-label.

    The contraction is sound because min-label labels are always ids of
    nodes in the same component (so contracted components biject with
    original ones), and the component's global minimum node keeps
    itself as its own label (nothing smaller exists to displace it), so
    the star phase's per-supernode minimum IS the original component
    minimum.

    ``edges`` is treated as undirected; duplicate edges, direction and
    self loops are all irrelevant (self-loop-only nodes still appear in
    the output, labeled by themselves). Raises if the star phase is not
    converged within ``max_rounds`` — with the logarithmic bound that
    indicates a bug, not a pathological input.

    ``stats``: optional dict; on return ``stats["rounds"]`` holds the
    star rounds executed (0 when the prefix converged) and
    ``stats["fast_rounds"]`` the changing min-label rounds — tests
    assert the logarithmic bound directly.
    """
    scope, own = scope_or_own(scope)

    if fast_rounds > 0:
        labels, converged, used = _minlabel_phase(
            edges, src, dst, fast_rounds, scope, jump=True, extend=True
        )
        if stats is not None:
            stats["fast_rounds"] = used
        if converged:
            if stats is not None:
                stats["rounds"] = 0
            out = labels.select(
                F.col("node").alias("doc_id"),
                F.col("label").alias("component_id"),
            )
            return scope.attach(out) if own else out
        # contract: relabel both endpoints with the partial labels and
        # drop already-merged (intra-cluster) edges; the star phase then
        # runs on the strictly smaller supernode graph
        labels = scope.persist(labels)
        l1 = labels.select(F.col("node").alias("_n1"), F.col("label").alias("_l1"))
        l2 = labels.select(F.col("node").alias("_n2"), F.col("label").alias("_l2"))
        contracted = (
            edges.select(F.col(src).alias("_n1"), F.col(dst).alias("_n2"))
            .join(l1, "_n1")
            .join(l2, "_n2")
            .where(F.col("_l1") != F.col("_l2"))
            .select(F.col("_l1").alias("i"), F.col("_l2").alias("j"))
        )
        star = _star_forest(contracted, "i", "j", max_rounds, scope, stats)
        # compose: a node's label is either a star child (→ its root),
        # or a root / untouched supernode (→ itself)
        roots = star.select(
            F.col("u").alias("label"), F.col("v").alias("root")
        )
        out = (
            labels.join(roots, "label", "left")
            .select(
                F.col("node").alias("doc_id"),
                F.coalesce(F.col("root"), F.col("label")).alias("component_id"),
            )
        )
        return scope.attach(out) if own else out

    # pure star: persist the raw edge projection FIRST — the node
    # universe scans it twice and the canonical edges once, and the
    # upstream pair-generation plan (LSH banding + rescore) is far too
    # expensive to recompute per reference
    base = scope.persist(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    )
    # node universe from the ORIGINAL edges (before the canonical
    # self-loop drop) so the output contract matches
    nodes = scope.persist(
        base.select(F.col("a").alias("node"))
        .union(base.select(F.col("b").alias("node")))
        .distinct()
    )
    star = _star_forest(base, "a", "b", max_rounds, scope, stats)
    if stats is not None:
        stats["fast_rounds"] = 0
    comp = star.select(F.col("u").alias("node"), F.col("v").alias("label"))
    out = (
        nodes.join(comp, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce(F.col("label"), F.col("node")).alias("component_id"),
        )
    )
    return scope.attach(out) if own else out


def component_stats(components: DataFrame) -> DataFrame:
    """Per-cluster summary: size and id span — the table a dedup job
    reports (how many clusters, how big, which keeper)."""
    return components.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("doc_id").alias("max_doc_id"),
    )
