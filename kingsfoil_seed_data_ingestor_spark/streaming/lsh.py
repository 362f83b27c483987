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
  paths cannot drift), probes the index for collisions, verifies
  candidates by exact Jaccard over hashed shingle sets, and appends its
  rows to the index — O(batch) new signature work per batch, never
  O(corpus) recomputation.

Store layout — a two-level LSM over parquet (round 10, VERDICT r9 #3;
pre-r10 the probe full-scanned one flat unpartitioned dir per table, so
per-batch I/O on the two probed tables was O(batches × corpus)):

* **L0**: per-batch writes land under ``batch_id=N`` subdirectories
  with overwrite, so ``foreachBatch``'s at-least-once redelivery is
  idempotent — a replayed batch rewrites byte-identical rows instead of
  double-appending. A ``_progress.json`` high-water mark refuses batch
  ids BELOW the highest processed, and a batch id EQUAL to the highest
  must fingerprint-match the recorded delivery (count + xor of id
  hashes) — together they kill the failure mode of a stream restarted
  against a fresh checkpoint (batch ids restart at 0) silently
  overwriting historical batches of a store that outlived its
  checkpoint, including the first-batch case where the fresh
  checkpoint's batch 0 collides with the stored highest 0.
* **Size-tiered compacted runs** (round 11, VERDICT r10 #2; round 10's
  single-run fold rewrote the ENTIRE corpus every ``compact_every``
  batches — O(corpus/compact_every) amortized write amplification per
  batch, growing without bound): every ``compact_every`` batches (and
  on demand via ``compact()``), the checkpoint-committed L0 batches
  (ids < highest — the highest itself may still be replayed) fold into
  ONE NEW small run; then runs of similar size merge size-tiered
  (``tier_fanout`` runs in the same log_fanout(rows) tier collapse
  into one). Per-fold I/O is O(new batches + merged-tier size), each
  row is rewritten at most log_fanout(batches/compact_every) times
  over the index's life, and the committed run count stays
  O(fanout · log(corpus)) — bounding probe fan-out. Every run holds
  the three probed tables re-clustered for pruning: ``banded``
  hive-partitioned by ``pb = pmod(bucket, chunks)`` and sorted by
  ``bucket`` within files; ``posts`` partitioned by ``pd = pmod(
  xxhash64(doc_id), chunks)`` and sorted by ``doc_id``; ``ids``
  compacted to a handful of files with ``batch_id`` kept as a data
  column (it is the arrival key). The run SET is committed by an
  atomic ``_compacted.json`` marker (os.replace) naming the run dirs
  and the ``upto`` batch; readers filter L0 to ``batch_id > upto`` so
  a crash that leaves stragglers cannot double-count. Superseded runs
  and folded L0 dirs are NOT deleted at the flip: ``vacuum`` removes
  them only after ``retain_grace_s`` (a lazy DataFrame handed out by
  ``near_dup_pairs``/``seen_ids`` before a fold references the old
  files and may execute after it — the same tombstone-grace discipline
  as ``VersionStore.vacuum``). Per-batch write amplification is
  measured to ``_write_log.jsonl`` (bytes + banded rows per batch for
  L0, fold, and tier merges) and gated bounded by
  ``test_streaming_lsh_write_amplification_bounded``.
* **Probe pruning**: a probe reads ``runs ∪ L0(batch_id > upto)``.
  Each run is filtered by the batch's chunk-value set —
  ``pmod(bucket, chunks)`` values for the banded probe, candidate
  ``pmod(xxhash64(doc_id), chunks)`` values for the posting fetch —
  each collected to the driver as at most ``chunks`` longs (bounded by
  the fixed chunk grid, never by batch or corpus size), giving static
  hive-partition pruning that parquet honors file-by-file. The L0 side
  is at most ``compact_every`` batch dirs. Files touched per probe is
  therefore O(chunks · runs + compact_every × files_per_batch) with
  runs ≤ O(fanout · log batches) — near-flat in the number of batches
  indexed (gated by ``test_streaming_lsh_probe_files_flat``), where
  the pre-r10 layout touched every file ever written. Bytes under the
  touched files still grow with the corpus (they hold it).
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
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
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
#: the three tables a probe reads — the ones compaction re-clusters
_PROBED = ("banded", "posts", "ids")
_EMPTY_DDL = {
    "banded": "doc_id long, band int, bucket int, batch_id long",
    "posts": "doc_id long, sh long, batch_id long",
    "ids": "doc_id long, batch_id long",
}
_TABLE_COLS = {
    "banded": ["doc_id", "band", "bucket", "batch_id"],
    "posts": ["doc_id", "sh", "batch_id"],
    "ids": ["doc_id", "batch_id"],
}


class StreamingLSHIndex:
    """Disk-backed incremental LSH index; one instance per stream.

    ``process_batch(df, batch_id)`` is the ``foreachBatch`` hook;
    ``near_dup_pairs(spark)`` reads the verified pairs accumulated so
    far; ``novel_ids(spark)`` the arrival-order keeper set;
    ``seen_ids(spark)`` the registered document ids; ``compact(spark)``
    folds committed L0 batches into the pruning-friendly run (also
    fires automatically every ``compact_every`` batches).

    Banding/verification parameters — and ``chunks``, because the
    compacted runs' partition values are only comparable to probe
    filters computed with the same modulus — must stay fixed for the
    life of an index; they are pinned to ``_params.json`` on first use
    and validated on every subsequent construction over the same
    directory. ``compact_every``, ``tier_fanout``, and
    ``retain_grace_s`` are operational knobs (cadence/GC only, never
    correctness) and may vary between sessions.

    Single-writer contract: ``process_batch``/``compact``/``vacuum``
    assume one writer (the streaming query's foreachBatch). Readers are
    safe concurrently — a fold never changes what committed readers
    see, and superseded files outlive the flip by ``retain_grace_s``
    so a lazy DataFrame built before a fold still executes (consume
    reader results within that window, or raise it).
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
        chunks: int = 16,
        compact_every: int = 8,
        tier_fanout: int = 4,
        retain_grace_s: float = 300.0,
    ) -> None:
        if bands * rows_per_band > num_hashes:
            raise ValueError(
                f"bands*rows_per_band = {bands * rows_per_band} exceeds "
                f"num_hashes = {num_hashes}"
            )
        if chunks < 1:
            raise ValueError(f"chunks must be >= 1, got {chunks}")
        if tier_fanout < 2:
            raise ValueError(f"tier_fanout must be >= 2, got {tier_fanout}")
        self.store_dir = store_dir
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = rows_per_band
        self.n = n
        self.id_col = id_col
        self.text_col = text_col
        self.chunks = chunks
        self.compact_every = compact_every
        self.tier_fanout = tier_fanout
        self.retain_grace_s = retain_grace_s
        self._check_params()

    # ------------------------------------------------------------------
    def _params(self) -> dict:
        return {
            "threshold": self.threshold,
            "num_hashes": self.num_hashes,
            "bands": self.bands,
            "rows_per_band": self.rows_per_band,
            "n": self.n,
            "chunks": self.chunks,
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

    def _progress(self) -> dict | None:
        try:
            with open(self._progress_path()) as fh:
                doc = json.load(fh)
            int(doc["highest_batch_id"])
            return doc
        except (OSError, ValueError, KeyError, TypeError):
            return None

    def _highest_batch(self) -> int | None:
        doc = self._progress()
        return int(doc["highest_batch_id"]) if doc else None

    def _record_batch(self, batch_id: int, fingerprint: list[int]) -> None:
        tmp = self._progress_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "highest_batch_id": int(batch_id),
                    "fingerprint": fingerprint,
                },
                fh,
            )
        os.replace(tmp, self._progress_path())

    def _sub(self, table: str) -> str:
        return os.path.join(self.store_dir, table)

    # ---------------- compaction marker ----------------
    def _marker_path(self) -> str:
        return os.path.join(self.store_dir, "_compacted.json")

    def _compaction(self) -> dict | None:
        """``{"upto": int, "runs": [{"name": str, "rows": int}, ...]}``
        of the committed run set, if any. The pre-r11 single-run form
        (``{"upto", "run"}``) is normalized on read so an index folded
        under the old layout keeps reading."""
        try:
            with open(self._marker_path()) as fh:
                doc = json.load(fh)
        except (OSError, ValueError):
            return None
        if not isinstance(doc.get("upto"), int):
            return None
        if isinstance(doc.get("run"), str):  # pre-r11 single-run marker
            return {"upto": doc["upto"], "runs": [{"name": doc["run"], "rows": 0}]}
        runs = doc.get("runs")
        if isinstance(runs, list) and all(
            isinstance(r, dict) and isinstance(r.get("name"), str) for r in runs
        ):
            return {"upto": doc["upto"], "runs": runs}
        return None

    def _run_dir(self, run: str) -> str:
        return os.path.join(self.store_dir, "runs", run)

    # ---------------- write-amplification log ----------------
    def _write_log_path(self) -> str:
        return os.path.join(self.store_dir, "_write_log.jsonl")

    def _log_write(self, entry: dict) -> None:
        with open(self._write_log_path(), "a") as fh:
            fh.write(json.dumps(entry) + "\n")

    def write_log(self) -> list[dict]:
        """Per-batch write accounting (bytes + banded rows for L0, fold,
        and tier-merge writes) — the write-amplification witness the
        tiered design is gated on."""
        try:
            with open(self._write_log_path()) as fh:
                return [json.loads(line) for line in fh if line.strip()]
        except OSError:
            return []

    @staticmethod
    def _dir_bytes(*paths: str) -> int:
        total = 0
        for path in paths:
            for root, _dirs, files in os.walk(path):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
        return total

    # ---------------- readers ----------------
    def _read_or_empty(
        self, spark: SparkSession, table: str, schema: T.StructType
    ) -> DataFrame:
        """Read an OUTPUT table (pairs/novel — per-batch dirs, never
        compacted), or an empty frame with the right schema when the
        stream has processed zero batches — callers like ``bench.py``
        drain the query unconditionally and an empty source directory
        must mean 'no pairs yet', not a crash."""
        path = self._sub(table)
        if not os.path.isdir(path):
            return spark.createDataFrame([], schema)
        return spark.read.parquet(path)

    def _read_indexed(
        self,
        spark: SparkSession,
        table: str,
        chunk_col: str | None = None,
        chunk_values: list[int] | None = None,
    ) -> DataFrame:
        """Compaction-aware read of a probed table: committed run
        (optionally pruned to ``chunk_values`` of its hive partition
        column ``chunk_col`` — static partition pruning, the scan lists
        only those directories) UNION the L0 batch dirs newer than the
        run. L0 stragglers a crashed cleanup left behind are excluded
        by the explicit ``batch_id > upto`` filter, so correctness
        never depends on deletion having finished."""
        cols = _TABLE_COLS[table]
        parts = []
        comp = self._compaction()
        upto = comp["upto"] if comp else -1
        if comp:
            for r in comp["runs"]:
                run = self._read_run_table(spark, r["name"], table)
                if chunk_col is not None and chunk_values is not None:
                    run = run.filter(F.col(chunk_col).isin(chunk_values))
                parts.append(run.select(*cols))
        l0_part = self._read_l0_range(spark, table, upto, None)
        if l0_part is not None:
            parts.append(l0_part.select(*cols))
        if not parts:
            return spark.createDataFrame([], _EMPTY_DDL[table])
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ------------------------------------------------------------------
    def _write_run(
        self, spark: SparkSession, dfs: "dict[str, DataFrame]"
    ) -> "tuple[str, int, int]":
        """Materialize one re-clustered run from per-table frames;
        returns ``(name, banded_rows, bytes_written)``. The run is
        INVISIBLE until a marker names it — a crash here leaves only
        garbage for ``vacuum``."""
        from pyspark.sql import Observation

        run = f"run-{uuid.uuid4().hex[:12]}"
        run_dir = self._run_dir(run)
        n_files = max(1, self.chunks)
        obs = Observation()
        for table in _PROBED:
            df = dfs[table]
            dest = os.path.join(run_dir, table)
            if table == "banded":
                (
                    df.observe(obs, F.count(F.lit(1)).alias("rows"))
                    .withColumn("pb", F.pmod(F.col("bucket"), F.lit(self.chunks)))
                    .repartition(n_files, F.col("pb"))
                    .sortWithinPartitions("bucket")
                    .write.partitionBy("pb")
                    .parquet(dest)
                )
            elif table == "posts":
                (
                    df.withColumn(
                        "pd",
                        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(self.chunks)),
                    )
                    .repartition(n_files, F.col("pd"))
                    .sortWithinPartitions("doc_id")
                    .write.partitionBy("pd")
                    .parquet(dest)
                )
            else:  # ids — narrow; batch_id stays a data column (arrival key)
                df.coalesce(1).write.parquet(dest)
        return run, int(obs.get["rows"]), self._dir_bytes(run_dir)

    def _read_run_table(
        self, spark: SparkSession, run_name: str, table: str
    ) -> DataFrame:
        """Read one table of one committed run with an EXPLICIT schema:
        a fold of an all-shingle-less batch legitimately writes a run
        table with zero data files, and schema inference would throw
        where an empty frame is the correct answer (the empty-partition
        guard ``operators/versioning.py`` also needed). Hive partition
        columns (pb/pd) are discovered and appended as usual."""
        return spark.read.schema(_EMPTY_DDL[table]).parquet(
            os.path.join(self._run_dir(run_name), table)
        )

    def _read_l0_range(
        self, spark: SparkSession, table: str, lo: int, hi: "int | None"
    ) -> "DataFrame | None":
        """Raw L0 rows with ``lo < batch_id (<= hi)``, reading ONLY the
        matching ``batch_id=N`` directories (enumerated driver-side
        with one scandir). Handing Spark the whole L0 root and
        filtering would make every probe's file LISTING grow with the
        grace-retained folded dirs — measured as a 2.3× per-batch wall
        creep over 24 batches the moment vacuum stopped deleting at
        the marker flip. ``basePath`` keeps ``batch_id`` as a derived
        partition column; the explicit schema keeps an all-shingle-less
        (zero-data-file) batch dir readable. Returns None when no
        directory qualifies (callers treat it as an absent branch)."""
        path = self._sub(table)
        if not os.path.isdir(path):
            return None
        dirs = []
        for e in os.scandir(path):
            if not e.name.startswith("batch_id="):
                continue
            b = int(e.name.split("=")[1])
            if b > lo and (hi is None or b <= hi):
                dirs.append(e.path)
        if not dirs:
            return None
        return (
            spark.read.option("basePath", path)
            .schema(_EMPTY_DDL[table])
            .parquet(*sorted(dirs))
            .select(*_TABLE_COLS[table])
        )

    @staticmethod
    def _tier(rows: int) -> int:
        """Size tier = floor(log₄(rows)) (clamped): runs merge only
        within a tier, so one fold never rewrites a run ≫ its inputs."""
        t = 0
        r = max(int(rows), 1)
        while r >= 4:
            r //= 4
            t += 1
        return t

    def compact(self, spark: SparkSession) -> bool:
        """Size-tiered fold (VERDICT r10 #2). Two phases:

        1. **Fold**: all checkpoint-committed L0 batches newer than the
           marker (``upto < batch_id < highest``; the highest may still
           be replayed by foreachBatch and must stay an overwritable L0
           dir) become ONE new run — I/O = O(new batches).
        2. **Tier merge**: while any size tier (log₄ of banded rows)
           holds ≥ ``tier_fanout`` runs, those runs merge into one —
           I/O = O(merged-tier size); each row is rewritten at most
           O(log_fanout(batches)) times over the index's life, vs the
           pre-r11 fold-everything's O(batches/compact_every) rewrites.

        The new run SET flips atomically via the marker; superseded
        runs and folded L0 dirs are left for ``vacuum`` (grace-aged, so
        pre-fold lazy readers still execute). Crash-safe at every
        point: an unmarked run is invisible garbage, a marked run set
        with straggler L0 dirs double-counts nothing (readers filter
        ``batch_id > upto``). Returns True if a new marker was
        committed; write accounting lands in ``_write_log.jsonl``."""
        highest = self._highest_batch()
        if highest is None:
            return False
        new_upto = highest - 1
        prev = self._compaction()
        prev_upto = prev["upto"] if prev else -1
        if new_upto < 0 or prev_upto >= new_upto:
            return False

        # phase 1 — fold the new L0 range into one run
        fold_dfs = {}
        for t in _PROBED:
            df = self._read_l0_range(spark, t, prev_upto, new_upto)
            fold_dfs[t] = (
                df if df is not None else spark.createDataFrame([], _EMPTY_DDL[t])
            )
        name, rows, fold_bytes = self._write_run(spark, fold_dfs)
        runs = ([dict(r) for r in prev["runs"]] if prev else []) + [
            {"name": name, "rows": rows}
        ]

        # phase 2 — size-tiered merges until no tier is overfull
        merge_bytes = 0
        merge_rows = 0
        while True:
            tiers: dict[int, list[dict]] = {}
            for r in runs:
                tiers.setdefault(self._tier(r.get("rows", 0)), []).append(r)
            overfull = [
                members
                for members in tiers.values()
                if len(members) >= self.tier_fanout
            ]
            if not overfull:
                break
            members = overfull[0]
            merged_dfs = {}
            for table in _PROBED:
                parts = [
                    self._read_run_table(spark, m["name"], table).select(
                        *_TABLE_COLS[table]
                    )
                    for m in members
                ]
                df = parts[0]
                for p in parts[1:]:
                    df = df.unionByName(p)
                merged_dfs[table] = df
            mname, mrows, mbytes = self._write_run(spark, merged_dfs)
            merge_bytes += mbytes
            merge_rows += mrows
            gone = {m["name"] for m in members}
            runs = [r for r in runs if r["name"] not in gone] + [
                {"name": mname, "rows": mrows}
            ]

        tmp = self._marker_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"upto": new_upto, "runs": runs}, fh)
        os.replace(tmp, self._marker_path())

        self._log_write(
            {
                "event": "compact",
                "upto": new_upto,
                "fold_rows": rows,
                "fold_bytes": fold_bytes,
                "merge_rows": merge_rows,
                "merge_bytes": merge_bytes,
                "n_runs": len(runs),
            }
        )
        # grace-aged cleanup — failures leave stragglers, never wrong reads
        self.vacuum()
        return True

    def vacuum(self, grace_s: float | None = None) -> int:
        """Delete superseded storage older than ``grace_s`` (default
        ``retain_grace_s``): folded L0 batch dirs (``batch_id ≤ upto``
        — readers already exclude them by filter) and run dirs the
        marker no longer names (superseded by a tier merge, or orphaned
        by a crash mid-fold). The grace window exists for lazily-built
        reader DataFrames that captured the old file set before a fold
        (ADVICE r10: the versioning layer solved exactly this with
        tombstones + grace vacuum — same discipline here). Returns the
        number of directories removed."""
        import time

        grace = self.retain_grace_s if grace_s is None else grace_s
        now = time.time()
        comp = self._compaction()
        upto = comp["upto"] if comp else -1
        live = {r["name"] for r in comp["runs"]} if comp else set()
        removed = 0

        def expired(path: str) -> bool:
            try:
                return now - os.path.getmtime(path) >= grace
            except OSError:
                return False

        for table in _PROBED:
            l0 = self._sub(table)
            if not os.path.isdir(l0):
                continue
            for e in os.scandir(l0):
                if (
                    e.name.startswith("batch_id=")
                    and int(e.name.split("=")[1]) <= upto
                    and expired(e.path)
                ):
                    shutil.rmtree(e.path, ignore_errors=True)
                    removed += 1
        runs_root = os.path.join(self.store_dir, "runs")
        if os.path.isdir(runs_root):
            for e in os.scandir(runs_root):
                if e.name not in live and expired(e.path):
                    shutil.rmtree(e.path, ignore_errors=True)
                    removed += 1
        return removed

    # ------------------------------------------------------------------
    def process_batch(self, batch_docs: DataFrame, batch_id: int) -> None:
        """Index + probe one micro-batch (the ``foreachBatch`` hook).

        Work per batch: re-delivery filter against the arrival
        registry, one shingle pass over the unseen documents, the
        min-hash lane aggregate, a chunk-pruned banded probe join, an
        exact-Jaccard verification of the candidates over chunk-pruned
        postings, five ``batch_id``-scoped overwrites, one progress
        commit, and (every ``compact_every`` batches) a compaction.
        """
        spark = batch_docs.sparkSession
        self._pin_params()
        # within-batch id dedup (ADVICE r10): a doc_id duplicated INSIDE
        # one micro-batch must be indexed — and later retained — exactly
        # once, or the corpus holds duplicate rows for one id. The
        # keeper is chosen deterministically (min (xxhash64(text), text)
        # per id) so a foreachBatch replay rewrites byte-identical rows.
        # Computed as an argmin AGGREGATE (optimization round 11), not a
        # ranking window: the struct minimum is the same keeper the
        # window's orderBy picks — ties on (hash, text) carry equal text
        # — but partial map-side aggregation shuffles one candidate per
        # id per map task instead of sorting every raw row (guide §2.3;
        # ``stream_lsh_corpus`` keeps its window form because it must
        # keep the id's FULL row, not just the (doc_id, text) the index
        # stores).
        docs = (
            batch_docs.select(
                F.col(self.id_col).cast("long").alias("doc_id"),
                F.col(self.text_col).alias("text"),
            )
            .groupBy("doc_id")
            .agg(
                F.min(
                    F.struct(F.xxhash64("text").alias("h"), F.col("text"))
                ).alias("_w")
            )
            .select("doc_id", F.col("_w.text").alias("text"))
        )

        progress = self._progress()
        highest = (
            int(progress["highest_batch_id"]) if progress else None
        )
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
        # arrival registry: EVERY id of the batch (even shingle-less
        # docs), used for (a) dropping at-least-once re-deliveries of
        # already-seen ids — re-indexing an id would re-emit its pairs
        # under a second batch — and (b) O(1)-width arrival keys for
        # the novelty verdict. Reads exclude the current batch id so a
        # replay of THIS batch does not filter itself out.
        ids_prev = self._read_indexed(spark, "ids").filter(
            F.col("batch_id") < F.lit(batch_id)
        )
        docs_new = docs.join(
            ids_prev.select("doc_id"), "doc_id", "left_anti"
        ).persist()
        # ids are unique within the batch after the dedup window above
        new_ids = docs_new.select("doc_id")

        # batch fingerprint — count + xor of xxhash64(doc_id, text) over
        # the batch's NEW rows: deterministic under a genuine
        # foreachBatch replay (same delivery, same registry state), so
        # it matches; a fresh checkpoint restarting at an id the store
        # already processed (batch_id == highest, the high-water guard
        # can't see it) must be refused BEFORE any write touches
        # history (round-10 review fix). The CONTENT term (ADVICE r10)
        # closes the same-ids-different-text hole: a fresh checkpoint
        # whose batch 0 carries the stored ids with different documents
        # now fingerprints differently too. The rare replay path pays
        # one explicit agg job; the common batch_id > highest path
        # records its fingerprint for free via an Observation on the
        # registry write below.
        fp_exprs = (
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(doc_id, text))"), F.lit(0)).alias(
                "x"
            ),
        )
        fingerprint: "list[int] | None" = None
        if highest is not None and batch_id == highest:
            fp_row = docs_new.agg(*fp_exprs).first()
            fingerprint = [int(fp_row["n"]), int(fp_row["x"])]
            stored = progress.get("fingerprint")
            if stored is not None and stored != fingerprint:
                raise ValueError(
                    f"index at {self.store_dir} already processed batch "
                    f"{batch_id} with different documents (fingerprint "
                    f"{stored} != {fingerprint}): a fresh checkpoint "
                    "restarted at the stored high-water mark. Overwriting "
                    "would corrupt history — keep the checkpoint and "
                    "index directories together, or start a fresh index."
                )

        from concurrent.futures import ThreadPoolExecutor

        from pyspark.sql import Observation

        posts_new = shingle_hash_table(
            docs_new, self.n, distinct=False
        ).persist()
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
        # the same subdirectory with identical rows. The three index
        # writes are INDEPENDENT sinks over the persisted batch frames,
        # so they run CONCURRENTLY from a driver thread pool
        # (optimization round 12, guide §2.6 "overlap independent
        # jobs"): a warm micro-batch's wall is almost pure per-sink job
        # floor, and overlapping collapses three floors into one.
        # Concurrent first-actions racing to fill the docs_new /
        # posts_new / banded_new caches are safe AND compute-once:
        # Spark's BlockManager takes a per-partition loading lock, so
        # one thread computes a block and the others read it. Crash
        # semantics are unchanged — a batch with SOME sinks written was
        # already possible sequentially; the replay overwrites every
        # sink before progress is recorded.
        obs = Observation()
        obs_banded = Observation()

        def _w_ids() -> None:
            docs_new.observe(obs, *fp_exprs).select("doc_id").write.mode(
                "overwrite"
            ).parquet(os.path.join(self._sub("ids"), f"batch_id={batch_id}"))

        def _w_banded() -> None:
            banded_new.observe(
                obs_banded, F.count(F.lit(1)).alias("rows")
            ).write.mode("overwrite").parquet(
                os.path.join(self._sub("banded"), f"batch_id={batch_id}")
            )

        def _w_posts() -> None:
            posts_new.select("doc_id", "sh").write.mode("overwrite").parquet(
                os.path.join(self._sub("posts"), f"batch_id={batch_id}")
            )

        with ThreadPoolExecutor(max_workers=3) as pool:
            for fut in [pool.submit(w) for w in (_w_ids, _w_banded, _w_posts)]:
                fut.result()
        if fingerprint is None:
            fingerprint = [int(obs.get["n"]), int(obs.get["x"])]

        # probe: every candidate pair has ≥1 endpoint in THIS batch, so
        # a pair is emitted exactly once — by the batch that completes
        # it. New-new pairs surface twice (once per endpoint's probe
        # row) before the distinct; old-old pairs cannot surface. The
        # compacted side of the index is pruned to the batch's bucket
        # chunks: at most ``chunks`` longs collected, never O(batch) —
        # and the collect job is skipped entirely while no compacted
        # run exists (the filter would have nothing to prune).
        has_run = self._compaction() is not None
        pbs = [
            r[0]
            for r in banded_new.select(
                F.pmod(F.col("bucket"), F.lit(self.chunks)).alias("pb")
            )
            .distinct()
            .collect()
        ] if has_run else None
        banded_all = self._read_indexed(
            spark, "banded", chunk_col="pb", chunk_values=pbs
        )
        cands = (
            banded_new.alias("nw")
            .join(banded_all.alias("al"), ["band", "bucket"])
            .filter(F.col("nw.doc_id") != F.col("al.doc_id"))
            .select(
                F.least(F.col("nw.doc_id"), F.col("al.doc_id")).alias("i"),
                F.greatest(F.col("nw.doc_id"), F.col("al.doc_id")).alias("j"),
            )
            .distinct()
        )

        # verification fetches shingle sets for candidate docs only:
        # the compacted postings are pruned to the candidates' doc-hash
        # chunks (≤ ``chunks`` longs collected) and semi-joined down to
        # the exact candidate ids; CPU is O(candidates), I/O the pruned
        # chunk files + the ≤ compact_every L0 batch dirs
        cand_docs = (
            cands.select(F.col("i").alias("doc_id"))
            .union(cands.select(F.col("j").alias("doc_id")))
            .distinct()
            .persist()
        )
        pds = [
            r[0]
            for r in cand_docs.select(
                F.pmod(F.xxhash64(F.col("doc_id")), F.lit(self.chunks)).alias(
                    "pd"
                )
            )
            .distinct()
            .collect()
        ] if has_run else None
        posts_all = self._read_indexed(
            spark, "posts", chunk_col="pd", chunk_values=pds
        )
        sets = (
            posts_all.join(F.broadcast(cand_docs), "doc_id", "left_semi")
            .groupBy("doc_id")
            .agg(F.collect_set("sh").alias("shset"))
        )
        verified = verify_candidates_from_sets(sets, cands, self.threshold).persist()

        # novelty verdict for THIS batch (the ingestion filter): a new
        # document is a near-DUPLICATE iff it verified-pairs with any
        # document whose arrival key (batch_id, doc_id) is smaller —
        # the near-dup extension of first_seen_filter's keeper rule.
        # Chains stay greedy-by-arrival on purpose: C pairing only with
        # the duplicate B is still a duplicate (B is indexed either
        # way), exactly as a batch greedy-by-arrival pass decides.
        # Decided from NEW-MEMBERSHIP alone (optimization round 11):
        # every pair this batch emits has ≥1 endpoint among this batch's
        # new ids (the probe property — ``banded_new`` joins the index),
        # and re-delivery filtering makes ids unique across batches, so
        # per pair (i < j):
        #   both endpoints new → same arrival batch, j (larger id) is
        #   the pair's duplicate; exactly one endpoint new → the old
        #   one arrived in an earlier batch, so the NEW one is the
        #   duplicate. Two broadcast flag joins of the in-hand batch id
        #   set replace the previous arrival-key formulation (an ids-
        #   registry view + a 5-stage shuffle join per batch — the most
        #   expensive phase of a warm micro-batch, for a verdict that
        #   never needed the registry at all).
        flag_i = F.broadcast(
            new_ids.select(F.col("doc_id").alias("i"), F.lit(True).alias("_in"))
        )
        flag_j = F.broadcast(
            new_ids.select(F.col("doc_id").alias("j"), F.lit(True).alias("_jn"))
        )
        dup_ids = (
            verified.join(flag_i, "i", "left")
            .join(flag_j, "j", "left")
            .select(
                F.when(
                    F.coalesce(F.col("_in"), F.lit(False))
                    & F.coalesce(F.col("_jn"), F.lit(False)),
                    F.col("j"),
                )
                .when(F.coalesce(F.col("_in"), F.lit(False)), F.col("i"))
                .otherwise(F.col("j"))
                .alias("doc_id")
            )
            .distinct()
        )
        novel = new_ids.join(dup_ids, "doc_id", "left_anti")

        # pairs + novel are the batch's last two independent sinks —
        # overlapped like the phase-A trio (both read the persisted
        # ``verified``; the block-loading lock fills it exactly once)
        def _w_pairs() -> None:
            verified.write.mode("overwrite").parquet(
                os.path.join(self._sub("pairs"), f"batch_id={batch_id}")
            )

        def _w_novel() -> None:
            novel.write.mode("overwrite").parquet(
                os.path.join(self._sub("novel"), f"batch_id={batch_id}")
            )

        with ThreadPoolExecutor(max_workers=2) as pool:
            for fut in [pool.submit(w) for w in (_w_pairs, _w_novel)]:
                fut.result()
        verified.unpersist()
        cand_docs.unpersist()
        posts_new.unpersist()
        banded_new.unpersist()
        docs_new.unpersist()
        # write accounting: this batch's L0 footprint, for the
        # write-amplification witness (compact() logs its own entry)
        self._log_write(
            {
                "event": "batch",
                "batch_id": int(batch_id),
                "banded_rows": int(obs_banded.get["rows"]),
                "l0_bytes": self._dir_bytes(
                    *[
                        os.path.join(self._sub(t), f"batch_id={batch_id}")
                        for t in ("ids", "banded", "posts", "pairs", "novel")
                    ]
                ),
            }
        )
        self._record_batch(batch_id, fingerprint)

        comp = self._compaction()
        upto = comp["upto"] if comp else -1
        if self.compact_every and batch_id - upto > self.compact_every:
            self.compact(spark)

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
        return self._read_indexed(spark, "ids").select("doc_id")

    # ------------------------------------------------------------------
    def probe_files_touched(self, spark: SparkSession, probe_docs: DataFrame) -> int:
        """Outside-view layout witness (same measurement idea as
        ``operators/layout.files_touched``): the number of distinct
        parquet data files the banded-probe scan for ``probe_docs``
        would draw rows from, under the committed layout. Used by the
        probe-cost gate to prove a batch no longer touches the whole
        index as batches accumulate."""
        docs = probe_docs.select(
            F.col(self.id_col).cast("long").alias("doc_id"),
            F.col(self.text_col).alias("text"),
        )
        posts = shingle_hash_table(docs, self.n, distinct=False)
        sigs = minhash_lanes_from_hashed_posts(posts, self.num_hashes)
        banded = (
            sigs.select(
                "doc_id",
                F.expr(lsh_band_expr(self.bands, self.rows_per_band)).alias("bk"),
            )
            .select("doc_id", "bk.band", "bk.bucket")
        )
        pbs = [
            r[0]
            for r in banded.select(
                F.pmod(F.col("bucket"), F.lit(self.chunks)).alias("pb")
            )
            .distinct()
            .collect()
        ]
        scan = self._read_indexed(spark, "banded", chunk_col="pb", chunk_values=pbs)
        return (
            scan.select(F.input_file_name().alias("f")).distinct().count()
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
    discipline turns into exactly-once index contents; keep the
    checkpoint and index directories together (the index refuses a
    checkpoint that restarted behind it, or one that restarted at the
    stored high-water mark with different documents).
    """
    return (
        stream_docs.writeStream.foreachBatch(index.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_lsh_corpus(
    stream_docs: DataFrame,
    index: StreamingLSHIndex,
    checkpoint_dir: str,
    corpus_dir: str,
    query_name: str = "lsh_corpus",
):
    """Novelty-filtered streaming ingestion (VERDICT r9 #4): index each
    micro-batch, then retain in ``corpus_dir`` ONLY the documents the
    index judged novel at arrival — the end-to-end wiring of
    ``novel_ids`` as an ingestion filter. The retained corpus carries
    exactly one representative per near-dup chain, chosen greedily by
    arrival order (smallest (batch_id, doc_id) key), matching what a
    batch greedy-by-arrival pass over ``minhash_near_dups`` of the
    full feed would keep.

    Corpus writes follow the index's own exactly-once discipline:
    each batch's keepers land under ``batch_id=N`` with overwrite, so a
    foreachBatch replay rewrites identical rows; re-deliveries of an
    already-seen id were judged at first arrival and are never
    re-retained. Restarting the stream on the same checkpoint resumes
    batch ids where they stopped, so a drained-then-extended feed
    (Trigger.AvailableNow per run) builds one continuous corpus.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        index.process_batch(batch_df, batch_id)
        spark = batch_df.sparkSession
        novel_b = spark.read.parquet(
            os.path.join(index._sub("novel"), f"batch_id={batch_id}")
        ).select(F.col("doc_id").alias("__novel_id"))
        # a doc_id duplicated WITHIN the micro-batch must yield ONE
        # corpus row (ADVICE r10) — and the SAME row the index chose to
        # represent the id (min (xxhash64(text), text)), so corpus text
        # always equals indexed text
        w_dedup = Window.partitionBy(index.id_col).orderBy(
            F.xxhash64(index.text_col), index.text_col
        )
        kept = (
            batch_df.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .join(
                F.broadcast(novel_b),
                F.col(index.id_col).cast("long") == F.col("__novel_id"),
                "left_semi",
            )
        )
        kept.write.mode("overwrite").parquet(
            os.path.join(corpus_dir, f"batch_id={batch_id}")
        )

    return (
        stream_docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
