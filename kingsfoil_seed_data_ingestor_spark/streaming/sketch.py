"""Streaming sketch maintenance: the deterministic HLL of
``plans/events.events_distinct_users_hll`` as a custom stateful
streaming operator.

Distinct-count dashboards over an event stream cannot re-scan history
per micro-batch; HLL registers are the canonical fix because they
merge by ELEMENT-WISE MAX — commutative, associative, idempotent — so
folding batches into per-key register state via
``applyInPandasWithState`` yields, after any batch arrival order or
boundary placement, EXACTLY the registers (and therefore exactly the
estimate) of the batch query over the union of the batches. The parity
test pins that equality against ``events_distinct_users_hll``.

Scale posture: state is one 1024-byte-scale register array per
event_type key, partitioned by the groupBy shuffle; per-batch work is
one Arrow-batched md5/rank fold. Registers never need expiry for an
all-time count; a windowed distinct count would key state by
(event_type, window) and let the watermark GC closed windows.
"""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal
from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kingsfoil_seed_data_ingestor_spark.plans.events import (
    HLL_ALPHA,
    HLL_M,
    HLL_RANK_MAX,
    HLL_SCALE,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

HLL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("est_users", T.DoubleType()),
        T.StructField("m_used", T.LongType()),
        T.StructField("n_batches", T.LongType()),
    ]
)
HLL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("registers", T.ArrayType(T.IntegerType())),
        T.StructField("n_batches", T.LongType()),
    ]
)


def _rank_bucket(user_id: int) -> tuple[int, int]:
    """(bucket, rank) from the SAME 60-bit md5 construction the batch
    query and its DuckDB oracle use — md5 of the decimal string, first
    15 hex digits."""
    hv = int(hashlib.md5(str(user_id).encode()).hexdigest()[:15], 16)
    bucket = hv % HLL_M
    w = hv // HLL_M
    rank = HLL_RANK_MAX if w == 0 else HLL_RANK_MAX - w.bit_length()
    return bucket, rank


def hll_estimate(registers: "list[int]") -> tuple[float, int]:
    """(estimate, m_used) with the exact arithmetic of the batch query:
    integer register sum, one int→double conversion, harmonic estimate,
    linear-counting small-range correction, round to 6."""
    m_used = sum(1 for r in registers if r > 0)
    zeros = HLL_M - m_used
    int_sum = sum((1 << (HLL_RANK_MAX - r)) for r in registers if r > 0)
    raw = HLL_ALPHA * HLL_M * HLL_M / (int_sum / HLL_SCALE + zeros * 1.0)
    if raw < 2.5 * HLL_M and zeros > 0:
        raw = HLL_M * math.log(HLL_M / zeros)
    # HALF_UP on the shortest decimal repr — the exact semantics of
    # Spark's F.round on a double (BigDecimal.valueOf + HALF_UP), NOT
    # Python round()'s banker's rounding, so a decimal-tie estimate
    # cannot break the streaming-equals-batch exact-equality contract
    est = float(
        Decimal(repr(raw)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )
    return est, m_used


def _fold_hll(
    key: tuple[Any, ...],
    batches: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    if state.exists:
        registers, n_batches = state.get
        registers = list(registers)
    else:
        registers, n_batches = [0] * HLL_M, 0
    for batch in batches:
        n_batches += 1
        for uid in batch["user_id"]:
            bucket, rank = _rank_bucket(int(uid))
            if rank > registers[bucket]:
                registers[bucket] = rank
    state.update((registers, n_batches))
    est, m_used = hll_estimate(registers)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "est_users": [est],
            "m_used": [m_used],
            "n_batches": [n_batches],
        }
    )


def streaming_distinct_users_hll(events: DataFrame) -> DataFrame:
    """Running per-event-type distinct-user HLL over a stream —
    update-mode output re-emits each touched key's current estimate
    every micro-batch. On a batch frame the same contract evaluates
    via one pass (n_batches = 1), giving the oracle-comparable twin
    shape for tests."""
    keyed = events.select("event_type", F.col("user_id").cast("long").alias("user_id"))
    if not events.isStreaming:
        # batch twin: single-fold through the same kernel semantics
        def one_fold(pdf_iter):
            import pandas as pd

            acc: dict = {}
            for pdf in pdf_iter:
                for et, uid in zip(pdf["event_type"], pdf["user_id"]):
                    regs = acc.setdefault(et, [0] * HLL_M)
                    bucket, rank = _rank_bucket(int(uid))
                    if rank > regs[bucket]:
                        regs[bucket] = rank
            rows = []
            for et, regs in acc.items():
                rows.append((et, regs))
            yield pd.DataFrame(
                {"event_type": [r[0] for r in rows], "registers": [r[1] for r in rows]}
            )

        partial = keyed.repartition("event_type").mapInPandas(
            one_fold, schema="event_type string, registers array<int>"
        )
        # merge partials by element-wise max, then estimate
        merged = (
            partial.select(
                "event_type", F.posexplode("registers").alias("bucket", "rank")
            )
            .groupBy("event_type", "bucket")
            .agg(F.max("rank").alias("rank"))
            .groupBy("event_type")
            .agg(F.collect_list(F.struct("bucket", "rank")).alias("br"))
        )

        def finish(pdf_iter):
            import pandas as pd

            for pdf in pdf_iter:
                ests, ms = [], []
                for br in pdf["br"]:
                    regs = [0] * HLL_M
                    for r in br:
                        regs[r["bucket"]] = max(regs[r["bucket"]], r["rank"])
                    e, m = hll_estimate(regs)
                    ests.append(e)
                    ms.append(m)
                yield pd.DataFrame(
                    {
                        "event_type": pdf["event_type"],
                        "est_users": ests,
                        "m_used": ms,
                        "n_batches": [1] * len(pdf),
                    }
                )

        return merged.mapInPandas(finish, schema=HLL_OUTPUT_SCHEMA)
    return keyed.groupBy("event_type").applyInPandasWithState(
        _fold_hll,
        outputStructType=HLL_OUTPUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ----------------------------------------------------------------------
# KMV (k-minimum-values) streaming twin — round 7 (VERDICT r6 #7)
# ----------------------------------------------------------------------
#
# The second sketch surface gets the same streaming treatment as the
# HLL above: per-event-type distinct-user KMV state. A KMV sketch is
# the k smallest distinct hash values seen — merging two sketches is
# "union then re-take the k smallest", which is commutative,
# associative and idempotent, so the stateful fold over ANY micro-batch
# split equals the batch computation over the union EXACTLY (hash
# construction, integer kth-minimum, and the two final double ops all
# replicated bit-for-bit).

#: sketch size — same k as the batch audience-overlap query
KMV_SK_K = 256
#: hash-domain normalizer: hashes are 60-bit, so hv / 2^60 ∈ [0, 1)
KMV_SK_NORM = float(1 << 60)

KMV_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("est_users", T.DoubleType()),
        T.StructField("k_used", T.LongType()),
        T.StructField("kth_hash", T.LongType()),
        T.StructField("n_batches", T.LongType()),
    ]
)
KMV_STATE_SCHEMA = T.StructType(
    [
        T.StructField("hashes", T.ArrayType(T.LongType())),
        T.StructField("n_batches", T.LongType()),
    ]
)


def _kmv_hash(user_id: int) -> int:
    """The 60-bit md5 hash shared with the batch queries and oracles."""
    return int(hashlib.md5(str(user_id).encode()).hexdigest()[:15], 16)


def kmv_estimate(hashes: "list[int]") -> tuple[float, int, int]:
    """(estimate, k_used, kth_hash) with the batch query's exact
    arithmetic: an unsaturated sketch holds every distinct hash, so the
    count is exact; a saturated one uses (k-1)/(kth/2^60) (Beyer et
    al., SIGMOD'07), rounded HALF_UP like Spark's F.round."""
    k_used = len(hashes)
    if k_used == 0:
        return 0.0, 0, 0
    kth = hashes[-1]
    if k_used < KMV_SK_K:
        return float(k_used), k_used, kth
    raw = (k_used - 1) / (kth / KMV_SK_NORM)
    est = float(
        Decimal(repr(raw)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )
    return est, k_used, kth


def _fold_kmv(
    key: tuple[Any, ...],
    batches: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    if state.exists:
        hashes, n_batches = state.get
        held = set(hashes)
    else:
        held, n_batches = set(), 0
    for batch in batches:
        n_batches += 1
        for uid in batch["user_id"]:
            held.add(_kmv_hash(int(uid)))
    merged = sorted(held)[:KMV_SK_K]
    state.update((merged, n_batches))
    est, k_used, kth = kmv_estimate(merged)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "est_users": [est],
            "k_used": [k_used],
            "kth_hash": [kth],
            "n_batches": [n_batches],
        }
    )


def streaming_distinct_users_kmv(events: DataFrame) -> DataFrame:
    """Running per-event-type distinct-user KMV over a stream (update
    mode), or the identical computation on a batch frame (n_batches=1)
    — the twin the parity test compares against. Batch shape: one
    distinct + per-key window head of k rows; no data beyond
    (event_type, k hashes) ever leaves the aggregation."""
    keyed = events.select("event_type", F.col("user_id").cast("long").alias("user_id"))
    if not events.isStreaming:
        from pyspark.sql import Window as W

        h = keyed.select(
            "event_type",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
            )
            .cast("long")
            .alias("hv"),
        ).distinct()
        uk = h.withColumn(
            "rn", F.row_number().over(W.partitionBy("event_type").orderBy("hv"))
        ).filter(F.col("rn") <= KMV_SK_K)
        agg = uk.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("k_used"), F.max("hv").alias("kth_hash")
        )
        est = F.when(
            F.col("k_used") < KMV_SK_K, F.col("k_used").cast("double")
        ).otherwise(
            F.round(
                (F.col("k_used") - 1) / (F.col("kth_hash") / F.lit(KMV_SK_NORM)), 6
            )
        )
        return agg.select(
            "event_type",
            est.alias("est_users"),
            "k_used",
            "kth_hash",
            F.lit(1).cast("long").alias("n_batches"),
        )
    return keyed.groupBy("event_type").applyInPandasWithState(
        _fold_kmv,
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ----------------------------------------------------------------------
# round 7: bottom-k quantile sketch twin (plans/llm.text_length_quantile_sketch)
# ----------------------------------------------------------------------
# The batch quantile sketch is a bottom-k coordinated sample: keep the
# QSK_K documents with the smallest 60-bit md5(doc_id) hashes and read
# quantile p as the sample's nearest-rank value. The sample merges by
# union-then-retake-k — the SAME merge law as KMV (commutative,
# associative, idempotent) — so per-batch folding reproduces the batch
# sample EXACTLY regardless of micro-batch boundaries, and the
# estimates (integer nearest-rank values of a deterministic sample)
# are bit-equal to the oracle-hash-checked batch query.

from kingsfoil_seed_data_ingestor_spark.plans.llm import QSK_K, QSK_PROBS

QSK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("p", T.DoubleType()),
        T.StructField("est_len", T.LongType()),
        T.StructField("k_sample", T.LongType()),
        T.StructField("n_batches", T.LongType()),
    ]
)
QSK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("hs", T.ArrayType(T.LongType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("lens", T.ArrayType(T.LongType())),
        T.StructField("n_batches", T.LongType()),
    ]
)


def _qsk_hash(doc_id: int) -> int:
    """The 60-bit md5 hash shared with the batch query and its oracle."""
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)


def quantile_estimates(sample_lens: "list[int]") -> "list[tuple[float, int, int]]":
    """(p, est_len, k_sample) rows with the batch query's exact
    nearest-rank arithmetic: est at rank ceil(p·k) of the sample sorted
    by length. The value at a rank of a sorted multiset is
    deterministic even under length ties."""
    ordered = sorted(sample_lens)
    k = len(ordered)
    out = []
    for p in QSK_PROBS:
        r = math.ceil(p * k)
        out.append((float(p), int(ordered[max(r, 1) - 1]), k))
    return out


def _fold_qsk(
    key: tuple[Any, ...],
    batches: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    if state.exists:
        hs, ids, lens, n_batches = state.get
        held = {int(i): (int(h), int(ln)) for h, i, ln in zip(hs, ids, lens)}
    else:
        held, n_batches = {}, 0
    for batch in batches:
        n_batches += 1
        for did, ln in zip(batch["doc_id"], batch["n_chars"]):
            held[int(did)] = (_qsk_hash(int(did)), int(ln))
    # retake the k smallest by (hash, doc_id) — the batch sample's order
    merged = sorted(held.items(), key=lambda kv: (kv[1][0], kv[0]))[:QSK_K]
    state.update(
        (
            [h for _, (h, _) in merged],
            [i for i, _ in merged],
            [ln for _, (_, ln) in merged],
            n_batches,
        )
    )
    rows = quantile_estimates([ln for _, (_, ln) in merged])
    yield pd.DataFrame(
        {
            "p": [p for p, _, _ in rows],
            "est_len": [e for _, e, _ in rows],
            "k_sample": [k for _, _, k in rows],
            "n_batches": [n_batches] * len(rows),
        }
    )


def streaming_length_quantiles(docs: DataFrame) -> DataFrame:
    """Running corpus length-quantile sketch over a document stream
    (update mode), or the identical computation on a batch frame
    (n_batches=1). State is ONE bottom-k sample (k=128 triples) — the
    single-group key is deliberate: the sketch is a global summary, and
    its state is O(k), not O(rows); a per-source variant would key the
    groupBy by source and hold one sample each."""
    keyed = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    if not docs.isStreaming:
        from pyspark.sql import Window as W

        hv = keyed.select(
            "n_chars",
            "doc_id",
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
            )
            .cast("long")
            .alias("h"),
        )
        samp = hv.orderBy("h", "doc_id").limit(QSK_K).select("n_chars")
        sr = samp.select(
            "n_chars", F.row_number().over(W.orderBy("n_chars")).alias("r")
        )
        ks = sr.agg(F.max("r").cast("long").alias("k_sample"))
        probs = keyed.sparkSession.createDataFrame(
            [(float(p),) for p in QSK_PROBS], "p double"
        )
        return (
            probs.crossJoin(F.broadcast(ks))
            .join(sr, F.col("r") == F.ceil(F.col("p") * F.col("k_sample")))
            .select(
                "p",
                F.col("n_chars").cast("long").alias("est_len"),
                "k_sample",
                F.lit(1).cast("long").alias("n_batches"),
            )
        )
    return (
        keyed.withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandasWithState(
            _fold_qsk,
            outputStructType=QSK_OUTPUT_SCHEMA,
            stateStructType=QSK_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ----------------------------------------------------------------------
# round 7: Count-Min counter maintenance (plans/events.events_heavy_hitters_cms)
# ----------------------------------------------------------------------
# CMS counters are SUMS, so per-batch folding (add each event's D
# bucket increments into held counters) is the sketch's own merge law:
# state after any micro-batch split equals the batch build over the
# union exactly. The twin emits the SPARSE counter table (d, bucket,
# cnt) — the same rows the batch query's groupBy produces and the
# oracle hash-checks — so the parity test is set equality, no
# estimator arithmetic involved.

from kingsfoil_seed_data_ingestor_spark.plans.events import CMS_D, CMS_W

CMS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("d", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("n_batches", T.LongType()),
    ]
)
CMS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("counters", T.ArrayType(T.LongType())),
        T.StructField("n_batches", T.LongType()),
    ]
)


def _cms_pos(d: int, user_id: int) -> int:
    """Bucket for hash row d — the 60-bit md5('d:key') idiom shared
    with the batch query and its oracle."""
    return int(hashlib.md5(f"{d}:{user_id}".encode()).hexdigest()[:15], 16) % CMS_W


def _fold_cms(
    key: tuple[Any, ...],
    batches: Iterator["pd.DataFrame"],
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    if state.exists:
        counters, n_batches = state.get
        counters = list(counters)
    else:
        counters, n_batches = [0] * (CMS_D * CMS_W), 0
    for batch in batches:
        n_batches += 1
        for uid in batch["user_id"]:
            for d in range(CMS_D):
                counters[d * CMS_W + _cms_pos(d, int(uid))] += 1
    state.update((counters, n_batches))
    rows = [
        (d, b, counters[d * CMS_W + b], n_batches)
        for d in range(CMS_D)
        for b in range(CMS_W)
        if counters[d * CMS_W + b]
    ]
    yield pd.DataFrame(rows, columns=["d", "bucket", "cnt", "n_batches"])


def streaming_user_freq_cms(events: DataFrame) -> DataFrame:
    """Running Count-Min counter table over an event stream (update
    mode), or the identical batch build (n_batches=1). State is ONE
    D×W counter array (8 192 longs) — constant regardless of stream
    volume; output is the sparse nonzero counter table, the exact rows
    the batch query's map-side-combinable groupBy produces."""
    keyed = events.select(F.col("user_id").cast("long").alias("user_id"))
    if not events.isStreaming:
        h = keyed.select(
            "user_id",
            F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("d"),
        ).select(
            F.col("d").cast("int").alias("d"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.col("d").cast("string"),
                                F.col("user_id").cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % CMS_W
            ).alias("bucket"),
        )
        return h.groupBy("d", "bucket").agg(
            F.count(F.lit(1)).alias("cnt"),
        ).select(
            "d", "bucket", "cnt", F.lit(1).cast("long").alias("n_batches")
        )
    return (
        keyed.withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandasWithState(
            _fold_cms,
            outputStructType=CMS_OUTPUT_SCHEMA,
            stateStructType=CMS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
