"""Structured-Streaming ingest of a drop directory (SURVEY §2.11's
extension of the batch path; the reference's closest analogue is the
multi-part incremental append, ``app/services/ingestor.py:130-195``).

Files land in a watched directory; each newly observed file runs
through the SAME deterministic batch pipeline (gates → parse → header
detection → validation → versioned write) as ``operators.pipeline.
ingest_file``. The streaming layer adds only *file discovery and
delivery semantics*:

* the ``binaryFile`` source tracks which files have been seen in the
  checkpoint — a restarted stream resumes where it left off, and
  ``Trigger.AvailableNow`` gives drain-then-stop batch refreshes on a
  schedule (the reference's quarterly cadence);
* only file *paths* flow through ``foreachBatch`` (content is read by
  the ingest pipeline itself, not shipped through the stream — the
  ``content`` column is dropped before it is ever materialized);
* exactly-once at the file level is layered: the checkpoint dedups
  within the stream's lifetime, and the whole-file SHA-256 gate (V6)
  rejects re-delivered bytes across checkpoints/streams, so a crashed
  and restarted ingest never double-loads a version;
* per-file failures are isolated: one bad file logs its error dict and
  the batch continues — the versioned-warehouse state machine already
  models per-file failure (status ``failed``), so the stream never
  dies on a malformed upload.

At scale, file listing is the only driver-side cost (same as any Spark
file-source stream); the per-file ingest plans execute distributed
exactly as in batch.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from kingsfoil_seed_data_ingestor_spark.operators.pipeline import ingest_file
from kingsfoil_seed_data_ingestor_spark.operators.versioning import VersionStore


def default_label_fn(path: str) -> tuple[str, str | None]:
    """Derive (version_label, variant) from a dropped file's name.

    Convention: ``<source>__<label>[__<variant>].<ext>`` — e.g.
    ``pfs_rvu__2024-Q1.csv`` or ``ncci_ptp__2024-Q1__practitioner.txt``.
    Falls back to the bare stem as the label.
    """
    parts = Path(path).stem.split("__")
    if len(parts) >= 3:
        return parts[1], parts[2]
    if len(parts) == 2:
        return parts[1], None
    return parts[0], None


def watch_drop_directory(
    spark: SparkSession,
    drop_dir: str,
    glob: str = "*.{csv,txt,xlsx,xls}",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-discovery stream over a drop directory: one row per newly
    arrived file, carrying path + modification time (never content)."""
    reader = (
        spark.readStream.format("binaryFile")
        # fixed source schema (streaming sources can't infer); the
        # projection below prunes `content` so file bytes never flow
        # through the stream
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(drop_dir).select("path", "modificationTime")


def stream_ingest_directory(
    spark: SparkSession,
    store: VersionStore,
    source_code: str,
    drop_dir: str,
    checkpoint_dir: str,
    label_fn: Callable[[str], tuple[str, str | None]] = default_label_fn,
    available_now: bool = True,
    on_result: Callable[[str, dict], None] | None = None,
):
    """Run the versioned ingest pipeline over every file that lands in
    ``drop_dir``. Returns the started ``StreamingQuery`` (with
    ``available_now`` it drains the backlog and stops — call
    ``awaitTermination()``).

    Each file is ingested independently and in modification-time order
    within a batch; failures are reported through ``on_result`` (or the
    ingestion log) without killing the stream.
    """
    files = watch_drop_directory(spark, drop_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.select("path", "modificationTime").collect()
        for row in sorted(rows, key=lambda r: (r.modificationTime, r.path)):
            local = row.path.removeprefix("file:")
            label, variant = label_fn(local)
            try:
                result = ingest_file(
                    spark, store, source_code, local, label, variant=variant
                )
            except Exception as exc:  # per-file isolation
                result = {"success": False, "errors": [str(exc)]}
            if on_result is not None:
                on_result(local, result)

    writer = (
        files.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
