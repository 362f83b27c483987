"""Streaming corpus dedup: the LLM-pipeline exact-dedup operator as a
custom stateful stream.

Documents arrive continuously (crawl drops, upload feeds); the corpus
must stay deduplicated without re-scanning history per batch. The
operator keys state by content fingerprint (`functions.text.
content_fingerprint`, the same key `operators/text_dedup.exact_dedup`
and the `dedup_incremental` plan use) and folds each micro-batch into a
per-fingerprint ``(keeper_id, n_copies)`` pair via
``applyInPandasWithState`` — Arrow-batched per-key state, the Spark
shape for any custom accumulating operator.

The fold is commutative and associative (min over ids, sum of counts),
so after ALL batches are processed the state equals the batch
`exact_dedup` over the union of the batches, regardless of arrival
order or batch boundaries — the parity test pins exactly that.

Scale posture (100 TB corpus, unbounded stream):

* state lives in the state store keyed by fingerprint, partitioned
  across executors by the groupBy shuffle — no driver involvement and
  no per-batch rescan of history;
* per-key state is two longs; total state is O(distinct contents). At
  billions of keys configure the RocksDB state store provider
  (``spark.sql.streaming.stateStore.providerClass``) so state spills
  to local disk with changelog checkpointing;
* corpus dedup deliberately uses ``GroupStateTimeout.NoTimeout``: a
  duplicate of a year-old document is still a duplicate, so state must
  not expire. If the retention contract is bounded (e.g. dedup within
  30 days), switch to ``EventTimeTimeout`` + watermark and let the
  store GC expired fingerprints — same operator body.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kingsfoil_seed_data_ingestor_spark.functions import text as TX

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

DEDUP_STATE_SCHEMA = T.StructType(
    [T.StructField("keeper", T.LongType()), T.StructField("n", T.LongType())]
)
DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("fingerprint", T.StringType()),
        T.StructField("keeper_id", T.LongType()),
        T.StructField("n_copies", T.LongType()),
    ]
)


def _fold_dedup(
    key: tuple[Any, ...],
    batches: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    """Fold a micro-batch's doc ids into (min keeper id, total copies)."""
    import pandas as pd

    keeper, n = state.get if state.exists else (None, 0)
    for batch in batches:
        if len(batch):
            low = int(batch["doc_id"].min())
            keeper = low if keeper is None else min(keeper, low)
            n += len(batch)
    state.update((keeper, n))
    yield pd.DataFrame(
        {"fingerprint": [key[0]], "keeper_id": [keeper], "n_copies": [n]}
    )


def streaming_corpus_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Running ``(fingerprint, keeper_id, n_copies)`` over a document
    stream — update-mode output: each micro-batch re-emits the rows for
    fingerprints it touched, so a downstream sink always has the
    current keeper mapping (what ``dedup_apply`` joins against).

    On a batch frame the identical contract evaluates as a plain
    aggregate (the oracle-comparable twin — same columns as
    ``operators/text_dedup.exact_dedup``).
    """
    keyed = docs.select(
        TX.content_fingerprint(F.col(text_col)).alias("fingerprint"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    if not docs.isStreaming:
        return keyed.groupBy("fingerprint").agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _fold_dedup,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def first_seen_filter(dedup_updates: DataFrame, docs: DataFrame) -> DataFrame:
    """Apply the running keeper mapping to a (batch) document set: keep
    only rows whose id IS the keeper — the streaming analogue of the
    batch ``dedup_apply`` plan. ``dedup_updates`` is the latest row per
    fingerprint from :func:`streaming_corpus_dedup`'s sink."""
    keepers = dedup_updates.select(F.col("keeper_id").alias("_keep"))
    return docs.join(
        F.broadcast(keepers), docs["doc_id"] == F.col("_keep"), "left_semi"
    )
