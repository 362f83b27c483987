"""Deterministic sampling + benchmark decontamination for training data.

Two pipeline-critical operators the large-scale story needs beyond
dedup (a training mix must be REPRODUCIBLE and CLEAN):

* **Deterministic content-hash sampling** — ``rand()`` sampling is
  neither reproducible across runs nor portable across engines. Here a
  row is sampled iff ``md5(content)`` is lexicographically below a hex
  threshold string: md5 hex is fixed-width, so string order == numeric
  order, the hash is uniform, and both Spark and DuckDB produce the
  identical sample set bit for bit. Per-stratum rates (the training-mix
  weighting pattern, e.g. 100 % wiki / 10 % web) compile to one CASE
  over the stratum column — single scan, no shuffle before the
  reporting aggregate, and re-running the pipeline reselects exactly
  the same rows (the property that makes ablations comparable).
* **Decontamination** — benchmark/eval text must not leak into the
  training set. The detector flags any (train, eval) pair sharing ≥ 1
  word n-gram via the same inverted-index join the Jaccard dedup path
  uses: explode n-grams, join on the gram, never the |train| × |eval|
  pair space. At 100 TB the eval side is tiny — Catalyst broadcasts its
  posting list — so the train side is one pruned scan, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from kingsfoil_seed_data_ingestor_spark.operators.text_dedup import shingle_table


def hash_threshold(rate: float, digits: int = 8) -> str:
    """Hex-string threshold ``t`` such that ``P[md5(x) < t] ≈ rate``
    (exact to 16^-digits). Comparing fixed-width lowercase hex strings
    is numeric comparison — portable to any engine with md5."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate == 1.0:
        # 'g' sorts above every hex digit, so every digest qualifies —
        # the natural "keep all" threshold under string comparison
        # (format would give a 9-digit string that fails lexicographic
        # comparison against 32-char digests)
        return "g"
    return format(int(rate * (16**digits)), f"0{digits}x")


def deterministic_sample_flag(content: Column, rate: float) -> Column:
    """TRUE for rows in the reproducible ``rate``-sample of ``content``."""
    return F.md5(content) < F.lit(hash_threshold(rate))


def stratified_sample(
    df: DataFrame,
    content_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Training-mix sampling: keep each stratum at its own rate,
    deterministically. One CASE expression — no per-stratum scans, no
    shuffle, and the selected set is stable across runs and engines."""
    flag: Column = F.lit(None)
    expr = None
    for stratum, rate in sorted(rates.items()):
        cond = F.col(stratum_col) == stratum
        branch = deterministic_sample_flag(F.col(content_col), rate)
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    flag = (
        expr.otherwise(deterministic_sample_flag(F.col(content_col), default_rate))
        if expr is not None
        else deterministic_sample_flag(F.col(content_col), default_rate)
    )
    return df.filter(flag)


def contamination_pairs(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(train_id, eval_id, shared_ngrams) for every pair sharing ≥ 1
    word ``n``-gram — the benchmark-leak detector.

    Inverted-index shape: both sides explode to (id, gram) posting
    lists and join on the gram; only colliding pairs materialize. The
    eval posting list is small by construction (benchmarks are), so the
    join broadcasts it and the train side never shuffles.
    """
    t = shingle_table(train, n, id_col, text_col).withColumnRenamed(
        "doc_id", "train_id"
    )
    e = shingle_table(eval_set, n, id_col, text_col).withColumnRenamed(
        "doc_id", "eval_id"
    )
    return (
        t.join(F.broadcast(e), "shingle")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
