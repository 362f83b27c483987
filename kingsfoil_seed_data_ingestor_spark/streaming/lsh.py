"""Incremental MinHash-LSH near-dup dedup of a GROWING corpus.

The batch near-dup family (``operators/text_dedup.minhash_near_dups``)
answers "which pairs in THIS corpus are near-duplicates". A live
ingestion pipeline needs the incremental question: documents arrive in
batches forever, and each batch must be checked against EVERYTHING seen
so far without recomputing history — at 100 TB, re-running corpus-wide
LSH per drop is the difference between minutes and days.

Design — ``foreachBatch`` + an accumulating on-disk index, NOT
``applyInPandasWithState``:

* The state here is an INDEX (banded signature rows + hashed shingle
  posting lists), which grows linearly with the corpus. That belongs in
  an append-only table the cluster can shuffle-join and prune — not in
  the streaming state store, whose per-key payloads are rewritten on
  update and checkpointed via changelog (right for per-key
  accumulators like the exact-dedup fold in ``streaming/dedup.py``,
  wrong for a corpus-sized posting index).
* Each micro-batch computes signatures ONCE for the new documents
  (one shingle pass + 96 codegen min-hash lanes, identical to the
  batch operator), probes the banded index for collisions, verifies
  candidates by exact Jaccard over hashed shingle sets, and appends
  its rows to the index — O(batch) new work per batch, never O(corpus)
  signature recomputation. The only corpus-sized cost is the probe
  join against the banded index, which shuffles on (band, bucket);
  at scale, write the index with ``bucketBy(band)`` (see
  ``operators/bucketed.py``) so the probe co-locates instead.
* Per-batch writes land under ``batch_id=N`` subdirectories with
  overwrite, so ``foreachBatch``'s at-least-once redelivery is
  idempotent: a replayed batch rewrites byte-identical rows instead of
  double-appending.

Parity contract (pinned by ``test_streaming_lsh_matches_batch``): a
pair is emitted by exactly ONE batch — the one that completes it (both
endpoints present; earlier-batch pairs never recur because a probe
always includes ≥1 new endpoint). Signatures, banding, and Jaccard
verification reuse the batch operator's exact formulas, so after all
batches the UNION of emitted pairs equals batch
``minhash_near_dups`` over the union of the documents, regardless of
how arrival split them.

Reference scope: the reference engine has no streaming surface (this
module extends ``SURVEY.md §2.11``); the dedup semantics mirror the
LLM-pipeline batch family, not a reference operator.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kingsfoil_seed_data_ingestor_spark.operators.text_dedup import (
    minhash_lanes_from_hashed_posts,
    shingle_hash_table,
)


class StreamingLSHIndex:
    """Disk-backed incremental LSH index; one instance per stream.

    ``process_batch(df, batch_id)`` is the ``foreachBatch`` hook;
    ``near_dup_pairs(spark)`` reads the verified pairs accumulated so
    far; ``seen_ids(spark)`` the indexed document ids.

    Banding/verification parameters must stay fixed for the life of an
    index (a probe is only correct against rows banded the same way);
    they are pinned to ``_params.json`` on first use and validated on
    every subsequent construction over the same directory.
    """

    def __init__(
        self,
        store_dir: str,
        threshold: float = 0.8,
        num_hashes: int = 96,
        bands: int = 32,
        rows_per_band: int = 3,
        n: int = 3,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        if bands * rows_per_band > num_hashes:
            raise ValueError(
                f"bands*rows_per_band = {bands * rows_per_band} exceeds "
                f"num_hashes = {num_hashes}"
            )
        self.store_dir = store_dir
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = rows_per_band
        self.n = n
        self.id_col = id_col
        self.text_col = text_col
        self._check_params()

    # ------------------------------------------------------------------
    def _params(self) -> dict:
        return {
            "threshold": self.threshold,
            "num_hashes": self.num_hashes,
            "bands": self.bands,
            "rows_per_band": self.rows_per_band,
            "n": self.n,
        }

    def _check_params(self) -> None:
        import json

        os.makedirs(self.store_dir, exist_ok=True)
        path = os.path.join(self.store_dir, "_params.json")
        if os.path.exists(path):
            with open(path) as fh:
                stored = json.load(fh)
            if stored != self._params():
                raise ValueError(
                    f"index at {self.store_dir} was built with {stored}; "
                    f"refusing to probe it with {self._params()} — banded "
                    "rows are only comparable under identical parameters"
                )
        # a fresh directory is pinned lazily by the first process_batch

    def _pin_params(self) -> None:
        import json

        path = os.path.join(self.store_dir, "_params.json")
        if not os.path.exists(path):
            tmp = path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(self._params(), fh)
            os.replace(tmp, path)

    def _sub(self, table: str) -> str:
        return os.path.join(self.store_dir, table)

    def _band_expr(self) -> str:
        # same single-parsed-expression shape as lsh_candidate_pairs
        # (per-band Column construction costs ~5 py4j round trips each)
        structs = ", ".join(
            f"struct({b} AS band, hash(slice(signature, "
            f"{b * self.rows_per_band + 1}, {self.rows_per_band})) AS bucket)"
            for b in range(self.bands)
        )
        return f"explode(array({structs}))"

    # ------------------------------------------------------------------
    def process_batch(self, batch_docs: DataFrame, batch_id: int) -> None:
        """Index + probe one micro-batch (the ``foreachBatch`` hook).

        Work per batch: one shingle pass over the NEW documents, the
        min-hash lane aggregate, a banded probe join against the
        accumulated index, exact-Jaccard verification of the
        candidates, three ``batch_id``-scoped overwrites.
        """
        spark = batch_docs.sparkSession
        self._pin_params()
        docs = batch_docs.select(
            F.col(self.id_col).cast("long").alias("doc_id"),
            F.col(self.text_col).alias("text"),
        )

        posts_new = shingle_hash_table(docs, self.n, distinct=False).persist()
        sigs_new = minhash_lanes_from_hashed_posts(posts_new, self.num_hashes)
        banded_new = (
            sigs_new.select("doc_id", F.expr(self._band_expr()).alias("bk"))
            .select("doc_id", "bk.band", "bk.bucket")
            .persist()
        )

        # idempotent per-batch writes: a foreachBatch replay overwrites
        # the same subdirectory with identical rows
        banded_new.write.mode("overwrite").parquet(
            os.path.join(self._sub("banded"), f"batch_id={batch_id}")
        )
        posts_new.select("doc_id", "sh").write.mode("overwrite").parquet(
            os.path.join(self._sub("posts"), f"batch_id={batch_id}")
        )

        # probe: every candidate pair has ≥1 endpoint in THIS batch, so
        # a pair is emitted exactly once — by the batch that completes it
        banded_all = spark.read.parquet(self._sub("banded"))
        cands = (
            banded_new.join(banded_all, ["band", "bucket"])
            .filter(banded_new["doc_id"] != banded_all["doc_id"])
            .select(
                F.least(banded_new["doc_id"], banded_all["doc_id"]).alias("i"),
                F.greatest(banded_new["doc_id"], banded_all["doc_id"]).alias("j"),
            )
            .distinct()
        )
        # new-new pairs surface twice (once per endpoint's probe row)
        # before the distinct; old-old pairs cannot surface at all.

        # verification reads shingle sets for candidate docs only —
        # O(candidates), never O(corpus)
        posts_all = spark.read.parquet(self._sub("posts"))
        cand_docs = (
            cands.select(F.col("i").alias("doc_id"))
            .union(cands.select(F.col("j").alias("doc_id")))
            .distinct()
        )
        sets = (
            posts_all.join(F.broadcast(cand_docs), "doc_id", "left_semi")
            .groupBy("doc_id")
            .agg(F.collect_set("sh").alias("shset"))
        )
        paired = (
            sets.select(F.col("doc_id").alias("i"), F.col("shset").alias("sh_i"))
            .join(F.broadcast(cands), "i")
            .join(
                sets.select(
                    F.col("doc_id").alias("j"), F.col("shset").alias("sh_j")
                ),
                "j",
            )
        )
        common = F.size(F.array_intersect("sh_i", "sh_j"))
        jac = common / (F.size("sh_i") + F.size("sh_j") - common)
        verified = (
            paired.select("i", "j", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= self.threshold)
            .select("i", "j", F.round("jaccard", 6).alias("jaccard"))
        )
        verified = verified.persist()
        verified.write.mode("overwrite").parquet(
            os.path.join(self._sub("pairs"), f"batch_id={batch_id}")
        )

        # novelty verdict for THIS batch (the ingestion filter): a new
        # document is a near-DUPLICATE iff it verified-pairs with any
        # document whose arrival key (batch_id, doc_id) is smaller —
        # the near-dup extension of first_seen_filter's keeper rule.
        # Chains stay greedy-by-arrival on purpose: C pairing only with
        # the duplicate B is still a duplicate (B is indexed either
        # way), exactly as a batch greedy-by-arrival pass decides.
        doc_batch = (
            spark.read.parquet(self._sub("banded"))
            .groupBy("doc_id")
            .agg(F.min("batch_id").alias("first_batch"))
        )
        new_ids = docs.select("doc_id").distinct()
        endpoints = verified.select(
            F.col("i").alias("doc_id"), F.col("j").alias("other")
        ).unionByName(
            verified.select(F.col("j").alias("doc_id"), F.col("i").alias("other"))
        )
        dup_ids = (
            endpoints.join(new_ids, "doc_id", "left_semi")
            .join(
                doc_batch.select(
                    F.col("doc_id").alias("other"),
                    F.col("first_batch").alias("other_batch"),
                ),
                "other",
            )
            .filter(
                (F.col("other_batch") < F.lit(batch_id))
                | (
                    (F.col("other_batch") == F.lit(batch_id))
                    & (F.col("other") < F.col("doc_id"))
                )
            )
            .select("doc_id")
            .distinct()
        )
        novel = new_ids.join(dup_ids, "doc_id", "left_anti")
        novel.write.mode("overwrite").parquet(
            os.path.join(self._sub("novel"), f"batch_id={batch_id}")
        )
        verified.unpersist()
        posts_new.unpersist()
        banded_new.unpersist()

    # ------------------------------------------------------------------
    def near_dup_pairs(self, spark: SparkSession) -> DataFrame:
        """All verified near-dup pairs (i < j, jaccard) emitted so far."""
        return spark.read.parquet(self._sub("pairs")).select(
            "i", "j", "jaccard"
        )

    def novel_ids(self, spark: SparkSession) -> DataFrame:
        """Ids of documents that were NOVEL at arrival — not a
        near-duplicate of anything arriving earlier (smaller
        (batch_id, doc_id) key). This is the ingestion filter: keep
        exactly these, drop the rest, and the retained corpus carries
        one representative per near-dup chain, chosen by arrival
        order. Documents too short to shingle are trivially novel
        (invisible to LSH, same as the batch family)."""
        return spark.read.parquet(self._sub("novel")).select("doc_id")

    def seen_ids(self, spark: SparkSession) -> DataFrame:
        """Distinct document ids the index has absorbed. Documents too
        short to produce a single n-gram shingle generate no banded
        rows and are absent here — exactly as they are invisible to the
        batch LSH family (no shingles ⇒ no signature ⇒ no pairs)."""
        return (
            spark.read.parquet(self._sub("banded")).select("doc_id").distinct()
        )


def stream_lsh_dedup(
    stream_docs: DataFrame,
    index: StreamingLSHIndex,
    checkpoint_dir: str,
    query_name: str = "lsh_dedup",
):
    """Wire a document stream into an incremental LSH index.

    Returns the started ``StreamingQuery`` (AvailableNow trigger — the
    drain-the-backlog mode the ingest stream also uses; swap the
    trigger for continuous feeds). The checkpoint makes batch ids
    stable across restarts, which the ``batch_id=N`` overwrite
    discipline turns into exactly-once index contents.
    """
    return (
        stream_docs.writeStream.foreachBatch(index.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
