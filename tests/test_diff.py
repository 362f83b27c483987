"""Unit + property tests for the snapshot diff / changelog replay
operators (``operators/diff.py``). The registered queries
(``snapshot_diff_cdc``, ``snapshot_merge_apply``) pin the same
operators against DuckDB oracles at every SF; these tests pin the
operator-level contract on hand-built edge cases the derived snapshots
can't reach (null keys in payloads, null↔value flips, schema
mismatch, empty diff, multi-column keys)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kingsfoil_seed_data_ingestor_spark.operators.diff import (
    apply_changes,
    snapshot_diff,
)


def _snap(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, name string, score double"
    )


def test_identical_snapshots_diff_empty(spark):
    a = _snap(spark, [(1, "a", 1.0), (2, "b", None)])
    assert snapshot_diff(a, a, ["k"]).count() == 0


def test_classifies_added_removed_changed(spark):
    old = _snap(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])
    new = _snap(spark, [(2, "b", 2.0), (3, "c", 9.0), (4, "d", 4.0)])
    got = {
        r["k"]: (r["change_type"], r["changed_cols"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        1: ("removed", ""),
        3: ("changed", "score"),
        4: ("added", ""),
    }


def test_null_to_value_and_value_to_null_are_changes(spark):
    old = _snap(spark, [(1, None, 1.0), (2, "b", None)])
    new = _snap(spark, [(1, "x", 1.0), (2, "b", 5.0)])
    got = {
        r["k"]: (
            r["changed_cols"],
            r["old_name"],
            r["new_name"],
            r["old_score"],
            r["new_score"],
        )
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        1: ("name", None, "x", 1.0, 1.0),
        2: ("score", "b", "b", None, 5.0),
    }


def test_multi_column_change_lists_schema_order(spark):
    old = _snap(spark, [(1, "a", 1.0)])
    new = _snap(spark, [(1, "z", 9.0)])
    [row] = snapshot_diff(old, new, ["k"]).collect()
    assert row["changed_cols"] == "name,score"


def test_multi_column_key(spark):
    schema = "k1 bigint, k2 string, v double"
    old = spark.createDataFrame([(1, "x", 1.0), (1, "y", 2.0)], schema)
    new = spark.createDataFrame([(1, "x", 7.0), (2, "x", 1.0)], schema)
    got = {
        (r["k1"], r["k2"]): r["change_type"]
        for r in snapshot_diff(old, new, ["k1", "k2"]).collect()
    }
    assert got == {
        (1, "x"): "changed",
        (1, "y"): "removed",
        (2, "x"): "added",
    }


def test_schema_mismatch_rejected(spark):
    old = _snap(spark, [(1, "a", 1.0)])
    new = old.withColumnRenamed("score", "points")
    with pytest.raises(ValueError, match="schemas differ"):
        snapshot_diff(old, new, ["k"])


def test_roundtrip_reconstructs_new_exactly(spark):
    """apply_changes(old, snapshot_diff(old, new)) == new — the CDC
    law, on a case with every change class plus unchanged rows."""
    old = _snap(
        spark,
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
    )
    new = _snap(
        spark,
        [(1, "a", 1.0), (2, "B", 2.5), (4, None, 4.0), (5, "e", 5.0)],
    )
    changes = snapshot_diff(old, new, ["k"])
    rebuilt = apply_changes(old, changes, ["k"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_empty_changelog_apply_is_identity(spark):
    old = _snap(spark, [(1, "a", 1.0), (2, "b", 2.0)])
    changes = snapshot_diff(old, old, ["k"])
    rebuilt = apply_changes(old, changes, ["k"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, old.collect())
    )


def test_diff_output_emits_only_churn(spark):
    """The changelog row count equals the true churn — unchanged rows
    never leave the join (the 0.1 %-churn-on-100 TB contract)."""
    n = 500
    base = spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("score"),
    )
    new = base.filter(F.col("k") % 100 != 7).withColumn(
        "score",
        F.when(F.col("k") % 100 == 3, F.col("score") + 1).otherwise(
            F.col("score")
        ),
    )
    d = snapshot_diff(base, new, ["k"])
    by_type = {
        r["change_type"]: r["n"]
        for r in d.groupBy("change_type").agg(F.count("*").alias("n")).collect()
    }
    assert by_type == {"removed": 5, "changed": 5}


def test_bucketed_snapshots_diff_without_shuffle(spark, tmp_path):
    """The 100 TB path: when both snapshots are bucketed on the key,
    the diff's full-outer join plans ZERO exchanges — repeated diffs
    against a slowly-changing base pay scan cost only (the module-doc
    claim, proven on the executed plan)."""
    import re

    from kingsfoil_seed_data_ingestor_spark.operators.bucketed import (
        write_bucketed,
    )

    base = spark.range(200).select(
        F.col("id").alias("k"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
        (F.col("id") * 2.0).alias("score"),
    )
    new = base.filter(F.col("k") % 50 != 3).withColumn(
        "score",
        F.when(F.col("k") % 40 == 1, F.col("score") + 1).otherwise(
            F.col("score")
        ),
    )
    write_bucketed(base, "snap_old_bkt", "k", buckets=4, path=str(tmp_path / "o"))
    write_bucketed(new, "snap_new_bkt", "k", buckets=4, path=str(tmp_path / "n"))
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        d = snapshot_diff(
            spark.table("snap_old_bkt"), spark.table("snap_new_bkt"), ["k"]
        )
        got = {
            r["k"]: r["change_type"] for r in d.collect()
        }
        plan = d._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS snap_old_bkt")
        spark.sql("DROP TABLE IF EXISTS snap_new_bkt")
    assert sum(v == "removed" for v in got.values()) == 4
    assert sum(v == "changed" for v in got.values()) == 5
    assert "SortMergeJoin" in plan and not re.findall(r"Exchange", plan)
