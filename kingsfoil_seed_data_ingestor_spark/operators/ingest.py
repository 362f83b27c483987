"""The typed ingest pipeline as one declarative Spark plan.

The reference processes uploads row-at-a-time in Python
(``app/services/ingestor.py:504-648``: per-row ``transform_record`` +
try/except + dict accumulation). Here the same semantics compile into a
single columnar plan that Catalyst whole-stage-codegens:

    raw grid (row_idx) → slice rows after header → drop ≥80 %-empty rows
    → one SELECT of typed column expressions → validity split
    (quarantine) → keep-first dedup → stats aggregates

Every transform expression is total (unparsable → NULL, never throws),
so the reference's per-row try/except has nothing left to catch — the
row-level error channel is the quarantine split (SURVEY.md §7.4 risk 1).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from operator import and_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kingsfoil_seed_data_ingestor_spark.functions import transforms as X
from kingsfoil_seed_data_ingestor_spark.operators.dedup import keep_first
from kingsfoil_seed_data_ingestor_spark.registry import Source
from kingsfoil_seed_data_ingestor_spark.sources.headers import HeaderDetection

#: share of empty-ish cells at which a row is metadata/blank
#: (reference ``ingestor.py:291-303``)
EMPTY_ROW_THRESHOLD = 0.8
#: cell values that count as empty-ish in the raw grid (the reference
#: str()s pandas cells, so NaN/None render as "nan"/"None")
EMPTYISH = ("", "nan", "NaN", "None")

ROW_NUMBER = "row_number"  # 1-indexed original file position


def empty_row_predicate(raw_cols: list[str], threshold: float = EMPTY_ROW_THRESHOLD) -> Column:
    """TRUE when ≥ ``threshold`` of the row's cells are empty-ish.

    Columnar restatement of reference ``is_empty_row`` — a sum of
    boolean flags over the positional columns, no Python per row.
    """
    flags = [
        F.when(F.trim(F.col(c)).isin(*EMPTYISH) | F.col(c).isNull(), 1).otherwise(0)
        for c in raw_cols
    ]
    empty_count = reduce(lambda a, b: a + b, flags)
    return empty_count >= F.lit(threshold) * F.lit(len(raw_cols))


def _column_expr(source: Source, internal_name: str, raw: Column) -> Column:
    """Typed expression for one canonical column — the dispatch mirror
    of reference ``transform_record`` (``ingestor.py:306-355``)."""
    if source.source_code.startswith("NCCI_MUE") and internal_name == "mue_value":
        return X.parse_mue_value(raw)
    if source.source_code == "NCCI_PTP":
        if internal_name == "deletion_date":
            return X.parse_deletion_date(raw)
        if internal_name == "modifier_indicator":
            return X.parse_modifier_indicator(raw)
        if internal_name == "prior_1996_flag":
            return X.parse_prior_1996_flag(raw)
    if internal_name.endswith("_code"):
        return X.clean_code(raw)
    return X.transform_value(raw, source.column(internal_name).data_type)


def typed_projection(source: Source, column_index: dict[str, int]) -> list[Column]:
    """The SELECT list: one typed, aliased expression per canonical column.

    Derived columns handled the way the reference does cross-column
    derivation (``ingestor.py:326-333``) plus the documented
    ``mac_locality`` rule (reference ``SCHEMA.md:95``):

    * NCCI_MUE ``mai_id`` ⇐ leading digits of the mapped
      ``mai_description`` cell;
    * PFS_LOCALITY ``mac_locality`` ⇐ ``carrier_number‖locality_code``
      when the file didn't carry it directly.

    Unmapped optional columns materialize as typed NULLs so every
    ingest of a source lands the full target schema.
    """
    exprs: list[Column] = []
    for c in source.columns:
        name = c.internal_name
        if source.source_code.startswith("NCCI_MUE") and name == "mai_id":
            desc_idx = column_index.get("mai_description")
            expr = (
                X.parse_mai_id(F.col(f"_c{desc_idx}"))
                if desc_idx is not None
                else F.lit(None).cast("int")
            )
        elif (
            source.source_code == "PFS_LOCALITY"
            and name == "mac_locality"
            and name not in column_index
            and {"carrier_number", "locality_code"} <= set(column_index)
        ):
            expr = X.mac_locality(
                X.clean_code(F.col(f"_c{column_index['carrier_number']}")),
                X.clean_code(F.col(f"_c{column_index['locality_code']}")),
            )
        elif name in column_index:
            expr = _column_expr(source, name, F.col(f"_c{column_index[name]}"))
        else:
            expr = F.lit(None).cast(c.spark_type)
        exprs.append(expr.alias(name))
    return exprs


@dataclass
class IngestPlan:
    """The split outputs of one ingest, all lazy DataFrames."""

    #: valid, deduplicated, typed records (what gets written)
    records: DataFrame
    #: rows failing key validation, with row_number + error message
    quarantine: DataFrame
    #: duplicate rows dropped by keep-first dedup
    duplicates: DataFrame
    #: counts + per-column null stats, computed on demand
    _source: Source = field(repr=False, default=None)
    #: every data-region row tagged with its disposition
    #: (empty | quarantined | first | dup) — the single-pass stats input
    _annotated: DataFrame = field(repr=False, default=None)

    def stats(self, sample_rows: int = 100) -> dict:
        """Materialize the reference's result dict
        (``ingestor.py:617-648``): counts, null stats, samples.

        ONE aggregation job over the disposition-tagged region computes
        every counter and per-column null stat (previously 5 separate
        actions); the bounded head collect for sample values — a UI
        nicety in the reference, first 3 values per column — is the
        only second action.
        """
        cols = [c.internal_name for c in self._source.columns]
        is_valid = F.col("__status").isin("first", "dup")

        def n(status: str) -> Column:
            return F.coalesce(
                F.sum(F.when(F.col("__status") == status, 1)), F.lit(0)
            )

        agg = self._annotated.agg(
            F.coalesce(F.sum(F.when(is_valid, 1)), F.lit(0)).alias("__processed"),
            n("first").alias("__inserted"),
            n("dup").alias("__dups"),
            n("quarantined").alias("__quar"),
            n("empty").alias("__skipped"),
            *[
                F.count(F.when(is_valid & F.col(c).isNull(), 1)).alias(c)
                for c in cols
            ],
        ).first()
        records_processed = int(agg["__processed"])
        inserted = int(agg["__inserted"])

        head = (
            self._annotated.filter(is_valid)
            .orderBy(ROW_NUMBER)
            .limit(sample_rows)
            .collect()
        )
        column_stats = {}
        for c in cols:
            samples = [str(r[c])[:50] for r in head if r[c] is not None][:3]
            nulls = agg[c]
            column_stats[c] = {
                "null_count": nulls,
                "sample_values": samples,
                "null_percentage": (
                    round(100 * nulls / records_processed, 2) if records_processed else 0.0
                ),
            }
        return {
            "success": inserted > 0,
            "records_processed": records_processed,
            "records_inserted": inserted,
            "duplicates_skipped": int(agg["__dups"]),
            "records_quarantined": int(agg["__quar"]),
            "rows_skipped": int(agg["__skipped"]),
            "column_stats": column_stats,
        }


def build_ingest_plan(
    raw: DataFrame, source: Source, detection: HeaderDetection
) -> IngestPlan:
    """Compile the full ingest into lazy DataFrames.

    ``raw`` is the all-string grid with ``row_idx`` (sources layer);
    ``detection`` the resolved header. Mirrors the driver flow of
    reference ``ingest_data`` (``ingestor.py:504-615``) as one plan.
    """
    raw_cols = [c for c in raw.columns if c.startswith("_c")]
    region = raw.filter(F.col("row_idx") > detection.header_row_index)
    data = region.filter(~empty_row_predicate(raw_cols))

    typed = data.select(
        (F.col("row_idx") + 1).alias(ROW_NUMBER),  # 1-indexed file position
        *typed_projection(source, detection.column_index),
    )

    keys = list(source.unique_keys)
    key_ok = reduce(and_, [F.col(k).isNotNull() for k in keys])
    valid = typed.filter(key_ok)
    quarantine = typed.filter(~key_ok).withColumn(
        "error",
        F.concat(
            F.lit("Row "),
            F.col(ROW_NUMBER).cast("string"),
            F.lit(": Missing required key column"),
        ),
    )

    kept, dups = keep_first(valid, keys, order_col=ROW_NUMBER)

    # ------- disposition-tagged region for single-pass stats -------
    # Every region row lands in exactly one bucket; one aggregate over
    # the union yields all counters + null stats. The dedup-rank window
    # runs over valid rows only (all keys non-null there — the null-key
    # hot-partition hazard keep_first guards against cannot arise).
    typed_region = region.select(
        (F.col("row_idx") + 1).alias(ROW_NUMBER),
        empty_row_predicate(raw_cols).alias("__empty"),
        *typed_projection(source, detection.column_index),
    )
    data_t = typed_region.filter(~F.col("__empty")).drop("__empty")
    empty_t = (
        typed_region.filter(F.col("__empty"))
        .drop("__empty")
        .withColumn("__status", F.lit("empty"))
    )
    quar_t = data_t.filter(~key_ok).withColumn("__status", F.lit("quarantined"))
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(ROW_NUMBER))
    valid_t = (
        data_t.filter(key_ok)
        .withColumn("__rank", F.row_number().over(w))
        .withColumn(
            "__status", F.when(F.col("__rank") == 1, "first").otherwise("dup")
        )
        .drop("__rank")
    )
    annotated = empty_t.unionByName(quar_t).unionByName(valid_t)

    return IngestPlan(
        records=kept,
        quarantine=quarantine,
        duplicates=dups,
        _source=source,
        _annotated=annotated,
    )
