"""Event-stream operators: windowed aggregation, sessions, dedup, state.

Every transform here takes a DataFrame and returns a DataFrame without
caring whether the input is a batch table or a ``readStream`` source —
the same logical plan runs both ways (the batch twins are registered as
oracle-checked queries in ``plans/events.py``; the streaming tests
execute the identical transforms through a file source + memory sink
with ``Trigger.AvailableNow``).

Scale/streaming design notes:

* watermarks bound state: every grouped-aggregation stream declares how
  late events may arrive; state for closed windows is dropped;
* the shuffle key is always (window/session, group) — state lives
  partitioned by key on the executors, no driver involvement;
* the custom stateful operator (``user_running_totals``) uses
  ``applyInPandasWithState`` — Arrow-batched per-key state, the Spark
  equivalent of the reference's "running totals" bookkeeping
  (``ingestor.py:178-195``) generalized to event time.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: events schema when ``ts`` is a native parquet timestamp (µs precision)
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
#: events schema when ``ts`` is ns-precision parquet — surfaces as
#: epoch-nano BIGINT under ``nanosAsLong`` (see session.py)
EVENTS_NANOS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)
#: money-style exact aggregation (events.value carries 2 decimals)
DEC = "decimal(18,4)"


def read_event_stream(
    spark: SparkSession,
    source_dir: str,
    glob: str | None = None,
    max_files_per_trigger: int | None = None,
    recursive: bool = False,
) -> DataFrame:
    """File-source stream over events parquet.

    A file-source stream needs a declared schema, but the testdata's
    ``ts`` physical type has varied across generations (ns-precision
    BIGINT vs native µs timestamp). Probe the parquet footer with one
    driver-side batch read — the same branch the batch loader takes
    (``plans/tables.py``) — so stream and batch always agree on event
    time bit-for-bit.
    """
    probe = spark.read
    if glob:
        probe = probe.option("pathGlobFilter", glob)
    if recursive:
        probe = probe.option("recursiveFileLookup", "true")
    try:
        ts_is_nanos = dict(probe.parquet(source_dir).dtypes).get("ts") == "bigint"
    except Exception:
        # no matching files yet — the canonical start-stream-before-data
        # deployment. Assume the current µs layout; a ns-layout feed
        # appearing later would need the stream restarted, which is the
        # price of any schema change on a file-source stream.
        ts_is_nanos = False

    schema = EVENTS_NANOS_SCHEMA if ts_is_nanos else EVENTS_SCHEMA
    reader = spark.readStream.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.parquet(source_dir)
    if ts_is_nanos:
        # integer `div`, NOT `/` — double division loses precision at
        # epoch-nanos magnitude (~1.7e18 exceeds double's 53-bit mantissa)
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df


# ----------------------------------------------------------------------
# windowed aggregations (stream ≡ batch)
# ----------------------------------------------------------------------


def tumbling_window_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "15 minutes"
) -> DataFrame:
    """Per (tumbling window × event_type): count, exact value total,
    distinct users. Watermark bounds aggregation state in stream mode."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "approx_users",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "15 minutes",
) -> DataFrame:
    """Overlapping windows: each event lands in window/slide buckets."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def session_window_stats(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-user session windows (dynamic length, closed after ``gap`` of
    inactivity): span, event count, exact value total."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "15 minutes") -> DataFrame:
    """In-stream exact dedup on event_id; the watermark bounds how long
    an id is remembered (state GC) — at-least-once sources become
    effectively-once within the lateness horizon.

    Streaming uses ``dropDuplicatesWithinWatermark``: plain
    ``dropDuplicates(["event_id"])`` keys state by event_id alone, so
    the watermark never evicts anything and state grows without bound
    in a long-running stream. The WithinWatermark variant expires each
    id once it falls behind the event-time watermark — bounded state,
    same effectively-once result within the lateness horizon. Batch
    twin keeps plain dropDuplicates (no state to bound)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def enrich_events(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to
    each event. Works identically on a batch frame (same plan both
    ways, like every transform here).

    Streaming semantics: the static side is re-planned per micro-batch
    (a dimension update between batches is picked up without restarting
    the stream), the join is stateless (no watermark needed — only
    stream-stream joins buffer state), and Catalyst broadcasts the
    dimension exactly as in batch. The 100 TB/s posture: dimension
    tables stay broadcast-sized or become stream-stream joins with
    watermarks — this operator is the first, cheap rung.
    """
    return events.join(F.broadcast(dim), on, how)


def correlate_events(
    events: DataFrame,
    first_type: str = "click",
    then_type: str = "purchase",
    within: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: for each ``then_type`` event, the
    ``first_type`` events by the same user in the preceding ``within``
    interval (attribution / funnel correlation).

    In streaming both sides carry watermarks and the join condition
    bounds event-time distance, so Spark can size the join state and
    drop rows older than ``watermark + within`` — without the interval
    bound a stream-stream join would buffer forever. Batch execution of
    the same plan is the oracle-comparable twin.
    """
    a = events.filter(F.col("event_type") == first_type).select(
        F.col("user_id").alias("a_user"),
        F.col("event_id").alias("first_id"),
        F.col("ts").alias("first_ts"),
    )
    b = events.filter(F.col("event_type") == then_type).select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("then_id"),
        F.col("ts").alias("then_ts"),
        F.col("value").alias("then_value"),
    )
    if events.isStreaming:
        a = a.withWatermark("first_ts", watermark)
        b = b.withWatermark("then_ts", watermark)
    joined = a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("first_ts") <= F.col("then_ts"))
        & (F.col("then_ts") <= F.col("first_ts") + F.expr(f"INTERVAL {within}")),
    )
    return joined.select(
        F.col("a_user").alias("user_id"),
        "first_id",
        "then_id",
        "first_ts",
        "then_ts",
        "then_value",
    )


# ----------------------------------------------------------------------
# custom stateful operator
# ----------------------------------------------------------------------

_RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)


def _update_running_totals(
    key: tuple[Any, ...],
    batches: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    """Fold each micro-batch into (count, total) per user."""
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for batch in batches:
        n += len(batch)
        total += float(batch["value"].sum())
    state.update((n, round(total, 4)))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Arbitrary stateful processing: running per-user totals across
    micro-batches via ``applyInPandasWithState`` (update-mode output).

    State is a (count, total) pair per user key, Arrow-transferred;
    this is the template any custom accumulating operator (feature
    counters, rate limiters, CDC folds) plugs into.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_running_totals,
            outputStructType=_RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ----------------------------------------------------------------------
# test/run harness
# ----------------------------------------------------------------------


def run_to_memory(
    stream: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming plan to completion with AvailableNow into an
    in-memory table; returns the result as a batch DataFrame."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream.sparkSession.table(name)


# ----------------------------------------------------------------------
# round 7: gap-based sessionization as a custom stateful operator
# ----------------------------------------------------------------------
# The stateful twin of plans/corpus.events_sessionize_gap: per-user
# open-session state folded across micro-batches; a session CLOSES
# (one output row, identical columns to the batch query) when the next
# event arrives more than SESSION_GAP_US after the last one. The open
# session stays in state — production would add a processing-time
# timeout to flush idle users; the parity test accounts for it by
# comparing closed sessions against the batch result minus each
# user's chronologically-last session. Assumes per-user event-time
# order across batches (a watermarked sort upstream provides it in
# production; the parity test feeds time-split files).

_SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("duration_us", T.LongType()),
    ]
)
_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _fold_sessions(
    key: tuple,
    batches: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    from kingsfoil_seed_data_ingestor_spark.plans.corpus import SESSION_GAP_US

    user_id = key[0]
    if state.exists:
        start_us, last_us, n_events = state.get
    else:
        start_us = None
        last_us = n_events = 0
    closed: list[tuple[int, int, int, int]] = []
    rows: list[tuple[int, int]] = []
    for batch in batches:
        rows.extend(
            zip(
                (int(v) for v in batch["us"]),
                (int(v) for v in batch["event_id"]),
            )
        )
    for us, _eid in sorted(rows):
        if start_us is None:
            start_us, last_us, n_events = us, us, 1
        elif us - last_us > SESSION_GAP_US:
            closed.append((user_id, start_us, n_events, last_us - start_us))
            start_us, last_us, n_events = us, us, 1
        else:
            last_us = us
            n_events += 1
    if start_us is not None:
        state.update((start_us, last_us, n_events))
    yield pd.DataFrame(
        closed,
        columns=["user_id", "session_start_us", "n_events", "duration_us"],
    )


def sessionize_gap(events: DataFrame) -> DataFrame:
    """Gap-based sessionization over a stream (update mode: one row per
    CLOSED session), or the identical computation on a batch frame
    (every session closes at end-of-input, so the batch branch equals
    the registered ``events_sessionize_gap`` query exactly). State per
    user is one open (start, last, count) triple — O(users), not
    O(events)."""
    keyed = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.col("event_id").cast("long").alias("event_id"),
    )
    if not events.isStreaming:
        from kingsfoil_seed_data_ingestor_spark.plans.corpus import SESSION_GAP_US
        from pyspark.sql import Window as W

        w = W.partitionBy("user_id").orderBy("us", "event_id")
        m = keyed.withColumn(
            "new_s",
            F.when(
                F.lag("us").over(w).isNull()
                | ((F.col("us") - F.lag("us").over(w)) > SESSION_GAP_US),
                1,
            ).otherwise(0),
        )
        s = m.select(
            "user_id",
            "us",
            F.sum("new_s")
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("sid"),
        )
        return (
            s.groupBy("user_id", "sid")
            .agg(
                F.min("us").cast("long").alias("session_start_us"),
                F.count(F.lit(1)).alias("n_events"),
                (F.max("us") - F.min("us")).cast("long").alias("duration_us"),
            )
            .drop("sid")
        )
    return (
        keyed.groupBy("user_id")
        .applyInPandasWithState(
            _fold_sessions,
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
