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
  posting lists + an arrival registry), which grows linearly with the
  corpus. That belongs in append-only tables the cluster can
  shuffle-join and prune — not in the streaming state store, whose
  per-key payloads are rewritten on update and checkpointed via
  changelog (right for per-key accumulators like the exact-dedup fold
  in ``streaming/dedup.py``, wrong for a corpus-sized posting index).
* Each micro-batch computes signatures ONCE for its unseen documents
  (one shingle pass + 96 codegen min-hash lanes — literally the batch
  operator's code: banding uses ``text_dedup.lsh_band_expr`` and
  verification ``text_dedup.verify_candidates_from_sets``, so the two
  paths cannot drift), probes the banded index for collisions,
  verifies candidates by exact Jaccard over hashed shingle sets, and
  appends its rows to the index — O(batch) new work per batch, never
  O(corpus) signature recomputation. The corpus-sized costs per batch
  are the probe join against the banded index (shuffles on
  (band, bucket); at scale write the index with ``bucketBy(band)``,
  see ``operators/bucketed.py``, so it co-locates) and two narrow
  id-table scans (the arrival registry for re-delivery filtering and
  arrival keys — two longs per document, metadata-scale next to the
  corpus).
* Per-batch writes land under ``batch_id=N`` subdirectories with
  overwrite, so ``foreachBatch``'s at-least-once redelivery is
  idempotent: a replayed batch rewrites byte-identical rows instead of
  double-appending. A ``_progress.json`` high-water mark refuses batch
  ids BELOW the highest processed — the failure mode it kills is a
  stream restarted against a fresh checkpoint (batch ids restart at 0)
  silently overwriting historical batches of a store that outlived its
  checkpoint.
* Documents re-delivered with an already-seen ``doc_id`` in a LATER
  batch are dropped before processing (anti-join against the arrival
  registry): at-least-once upstreams re-drop files, and re-indexing
  the same id would re-emit all its pairs under a second batch,
  breaking the exactly-once pair contract.

Parity contract (pinned by ``test_streaming_lsh_matches_batch``): a
pair is emitted by exactly ONE batch — the one that completes it (both
endpoints present; earlier-batch pairs never recur because a probe
always includes ≥1 new endpoint). After all batches the UNION of
emitted pairs equals batch ``minhash_near_dups`` over the union of the
documents, regardless of how arrival split them.

Reference scope: the reference engine has no streaming surface (this
module extends ``SURVEY.md §2.11``); the dedup semantics mirror the
LLM-pipeline batch family, not a reference operator.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kingsfoil_seed_data_ingestor_spark.operators.text_dedup import (
    lsh_band_expr,
    minhash_lanes_from_hashed_posts,
    shingle_hash_table,
    verify_candidates_from_sets,
)

_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("i", T.LongType()),
        T.StructField("j", T.LongType()),
        T.StructField("jaccard", T.DoubleType()),
    ]
)
_IDS_SCHEMA = T.StructType([T.StructField("doc_id", T.LongType())])


class StreamingLSHIndex:
    """Disk-backed incremental LSH index; one instance per stream.

    ``process_batch(df, batch_id)`` is the ``foreachBatch`` hook;
    ``near_dup_pairs(spark)`` reads the verified pairs accumulated so
    far; ``novel_ids(spark)`` the arrival-order keeper set;
    ``seen_ids(spark)`` the registered document ids.

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
        path = os.path.join(self.store_dir, "_params.json")
        if not os.path.exists(path):
            tmp = path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(self._params(), fh)
            os.replace(tmp, path)

    def _progress_path(self) -> str:
        return os.path.join(self.store_dir, "_progress.json")

    def _highest_batch(self) -> int | None:
        try:
            with open(self._progress_path()) as fh:
                return int(json.load(fh)["highest_batch_id"])
        except (OSError, ValueError, KeyError):
            return None

    def _record_batch(self, batch_id: int) -> None:
        tmp = self._progress_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"highest_batch_id": int(batch_id)}, fh)
        os.replace(tmp, self._progress_path())

    def _sub(self, table: str) -> str:
        return os.path.join(self.store_dir, table)

    def _read_or_empty(
        self, spark: SparkSession, table: str, schema: T.StructType
    ) -> DataFrame:
        """Read an index table, or an empty frame with the right schema
        when the stream has processed zero batches — callers like
        ``bench.py`` drain the query unconditionally and an empty
        source directory must mean 'no pairs yet', not a crash."""
        path = self._sub(table)
        if not os.path.isdir(path):
            return spark.createDataFrame([], schema)
        return spark.read.parquet(path)

    # ------------------------------------------------------------------
    def process_batch(self, batch_docs: DataFrame, batch_id: int) -> None:
        """Index + probe one micro-batch (the ``foreachBatch`` hook).

        Work per batch: re-delivery filter against the arrival
        registry, one shingle pass over the unseen documents, the
        min-hash lane aggregate, a banded probe join against the
        accumulated index, exact-Jaccard verification of the
        candidates, four ``batch_id``-scoped overwrites, one progress
        commit.
        """
        spark = batch_docs.sparkSession
        self._pin_params()
        highest = self._highest_batch()
        if highest is not None and batch_id < highest:
            raise ValueError(
                f"index at {self.store_dir} has processed up to batch "
                f"{highest} but received batch {batch_id}: the stream's "
                "checkpoint restarted behind the store (fresh checkpoint "
                "dir, or a second query on the same store). Processing "
                "would overwrite historical batches with different "
                "documents — keep the checkpoint and index directories "
                "together, or start a fresh index."
            )
        docs = batch_docs.select(
            F.col(self.id_col).cast("long").alias("doc_id"),
            F.col(self.text_col).alias("text"),
        )

        # arrival registry: EVERY id of the batch (even shingle-less
        # docs), used for (a) dropping at-least-once re-deliveries of
        # already-seen ids — re-indexing an id would re-emit its pairs
        # under a second batch — and (b) O(1)-width arrival keys for
        # the novelty verdict. Reads exclude the current batch id so a
        # replay of THIS batch does not filter itself out.
        ids_prev = (
            self._read_or_empty(spark, "ids", _IDS_SCHEMA)
            .filter(F.col("batch_id") < F.lit(batch_id))
            if os.path.isdir(self._sub("ids"))
            else spark.createDataFrame([], "doc_id long, batch_id long")
        )
        docs = docs.join(
            ids_prev.select("doc_id"), "doc_id", "left_anti"
        ).persist()
        docs.select("doc_id").distinct().write.mode("overwrite").parquet(
            os.path.join(self._sub("ids"), f"batch_id={batch_id}")
        )

        posts_new = shingle_hash_table(docs, self.n, distinct=False).persist()
        sigs_new = minhash_lanes_from_hashed_posts(posts_new, self.num_hashes)
        banded_new = (
            sigs_new.select(
                "doc_id",
                F.expr(lsh_band_expr(self.bands, self.rows_per_band)).alias("bk"),
            )
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
        # a pair is emitted exactly once — by the batch that completes
        # it. New-new pairs surface twice (once per endpoint's probe
        # row) before the distinct; old-old pairs cannot surface.
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

        # verification reads shingle sets for candidate docs only —
        # O(candidates), never O(corpus); the formula is the batch
        # operator's own (verify_candidates_from_sets)
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
        verified = verify_candidates_from_sets(sets, cands, self.threshold).persist()
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
        # Arrival keys come from the narrow ids registry, semi-joined
        # down to the verified endpoints — never a corpus-wide
        # aggregate over the banded index.
        endpoints = verified.select(
            F.col("i").alias("doc_id"), F.col("j").alias("other")
        ).unionByName(
            verified.select(F.col("j").alias("doc_id"), F.col("i").alias("other"))
        )
        other_ids = endpoints.select(F.col("other").alias("doc_id")).distinct()
        # re-delivery filtering makes ids unique across batches, so the
        # registry row IS the arrival key — no aggregate needed
        other_batch = (
            spark.read.parquet(self._sub("ids"))
            .join(F.broadcast(other_ids), "doc_id", "left_semi")
            .select(
                F.col("doc_id").alias("other"),
                F.col("batch_id").alias("other_batch"),
            )
        )
        new_ids = docs.select("doc_id").distinct()
        dup_ids = (
            endpoints.join(new_ids, "doc_id", "left_semi")
            .join(other_batch, "other")
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
        docs.unpersist()
        self._record_batch(batch_id)

    # ------------------------------------------------------------------
    def near_dup_pairs(self, spark: SparkSession) -> DataFrame:
        """All verified near-dup pairs (i < j, jaccard) emitted so far;
        empty (with schema) before the first batch."""
        return self._read_or_empty(spark, "pairs", _PAIRS_SCHEMA).select(
            "i", "j", "jaccard"
        )

    def novel_ids(self, spark: SparkSession) -> DataFrame:
        """Ids of documents that were NOVEL at arrival — not a
        near-duplicate of anything arriving earlier (smaller
        (batch_id, doc_id) key). This is the ingestion filter: keep
        exactly these, drop the rest, and the retained corpus carries
        one representative per near-dup chain, chosen by arrival
        order. Documents too short to shingle are trivially novel
        (invisible to LSH, same as the batch family); re-deliveries of
        an already-seen id are judged once, at first arrival."""
        return self._read_or_empty(spark, "novel", _IDS_SCHEMA).select("doc_id")

    def seen_ids(self, spark: SparkSession) -> DataFrame:
        """Distinct document ids the index has registered (including
        shingle-less documents, which are registered for re-delivery
        filtering but generate no banded rows and so never pair)."""
        return self._read_or_empty(spark, "ids", _IDS_SCHEMA).select("doc_id")


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
    discipline turns into exactly-once index contents; keep the
    checkpoint and index directories together (the index refuses a
    checkpoint that restarted behind it).
    """
    return (
        stream_docs.writeStream.foreachBatch(index.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
