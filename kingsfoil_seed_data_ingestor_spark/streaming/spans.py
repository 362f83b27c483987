"""Streaming sub-document span dedup: the ``dedup_spans`` semantics as
a custom stateful stream.

Documents stream in (crawl drops, upload feeds); the span-level
boilerplate registry must stay current without rescanning history.
State is keyed by the md5 span fingerprint (the SAME key
``plans/corpus.dedup_spans`` groups on), and each micro-batch folds
into a per-span ``(keeper_doc, keeper_idx, n_seen)`` triple via
``applyInPandasWithState``.

Unlike the time-windowed funnel semantics (which re-anchor when earlier
events arrive late and therefore need watermark finalization), the
span-dedup fold is COMMUTATIVE and ASSOCIATIVE: the keeper is the
lexicographic min over (doc_id, idx) and n_seen is a sum, so any
arrival order and any batch boundaries converge to the batch answer —
the parity test pins that against ``dedup_spans``'s ranked-window
formulation.

Scale posture mirrors ``streaming/dedup.py``: state is three longs +
a 32-char key per DISTINCT span, sharded by the state-store shuffle;
at billions of spans use the RocksDB provider. NoTimeout on purpose —
boilerplate from a year ago is still boilerplate.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kingsfoil_seed_data_ingestor_spark.operators.text_dedup import SPAN, span_table

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

SPAN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("keeper_doc", T.LongType()),
        T.StructField("keeper_idx", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)
SPAN_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("h", T.StringType()),
        T.StructField("keeper_doc", T.LongType()),
        T.StructField("keeper_idx", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _fold_spans(
    key: tuple[Any, ...],
    batches: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    """Fold a micro-batch's span occurrences into the running
    (min (doc_id, idx), total occurrences) state."""
    import pandas as pd

    kd, ki, n = state.get if state.exists else (None, None, 0)
    for batch in batches:
        if not len(batch):
            continue
        best = min(zip(batch["doc_id"], batch["idx"]))
        if kd is None or (int(best[0]), int(best[1])) < (kd, ki):
            kd, ki = int(best[0]), int(best[1])
        n += len(batch)
    state.update((kd, ki, n))
    yield pd.DataFrame(
        {"h": [key[0]], "keeper_doc": [kd], "keeper_idx": [ki], "n_seen": [n]}
    )


def streaming_span_dedup(
    docs: DataFrame, span: int = SPAN, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Running ``(h, keeper_doc, keeper_idx, n_seen)`` over a document
    stream — update-mode output; the latest row per span fingerprint is
    the current first-occurrence registry (what a span-scrubbing writer
    joins against to drop duplicated spans from newly arrived docs).

    On a batch frame the identical contract evaluates as a plain
    aggregate — the oracle-comparable twin of ``dedup_spans``'s
    per-occurrence ranking.
    """
    spans = span_table(docs, span, id_col, text_col)
    if not docs.isStreaming:
        return spans.groupBy("h").agg(
            F.min(F.struct("doc_id", "idx")).alias("_f"),
            F.count(F.lit(1)).alias("n_seen"),
        ).select(
            "h",
            F.col("_f.doc_id").cast("long").alias("keeper_doc"),
            F.col("_f.idx").cast("long").alias("keeper_idx"),
            "n_seen",
        )
    return spans.groupBy("h").applyInPandasWithState(
        _fold_spans,
        outputStructType=SPAN_OUTPUT_SCHEMA,
        stateStructType=SPAN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
