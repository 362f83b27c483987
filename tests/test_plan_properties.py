"""Plan-regression gates: the physical-plan properties PLANS.md
documents must hold in CI, not just in the last manual audit.

Each test compiles a registered query at sf0.001 and asserts the
scale-critical facts of its plan — a lost pushdown, a dimension join
degrading to sort-merge, or a map-only operator growing a shuffle is a
FAILURE here long before it's a bench regression at sf0.1 (or a
cluster incident at 100 TB).
"""

from __future__ import annotations

import pytest

from kingsfoil_seed_data_ingestor_spark import plans  # noqa: F401
from kingsfoil_seed_data_ingestor_spark.plans.audit import explain_str, plan_facts
from kingsfoil_seed_data_ingestor_spark.plans.core import QUERIES
from kingsfoil_seed_data_ingestor_spark.session import pin_comparable_conf

from tests.conftest import SF_DIR


def facts(spark, name):
    pin_comparable_conf(spark)
    return plan_facts(QUERIES[name].spark(spark, SF_DIR))


def test_quantize_is_map_only(spark):
    f = facts(spark, "embed_quantize_int8")
    assert f["exchanges"] == 0, "int8 quantization must never shuffle"
    assert f["python"] == 0
    assert f["scans"] == 1 and f["cols_read"] == [2]


def test_q1_scan_prunes_and_pushes(spark):
    f = facts(spark, "q1_pricing_summary")
    assert f["scans"] == 1
    assert f["cols_read"] == [7], "Q1 reads exactly its 7 columns"
    assert f["pushed_filters"] == 1, "shipdate filter must reach parquet"
    assert f["exchanges"] == 1, "one shuffle on the grouping key"


def test_q3_dimension_joins_broadcast(spark):
    f = facts(spark, "q3_shipping_priority")
    assert f["smj"] == 0, "fact ⋈ filtered-dim must broadcast, not sort-merge"
    assert f["pushed_filters"] == 3, "both date filters + segment pushed"


def test_q5_six_way_join_all_broadcast(spark):
    f = facts(spark, "q5_local_supplier_volume")
    assert f["smj"] == 0, "every dimension join must broadcast at test scale"
    assert f["bhj"] == 5, "six tables join through five broadcast joins"
    assert f["pushed_filters"] == 6, "region/date filters reach every scan"
    assert f["exchanges"] <= 2, "one aggregate shuffle (+ presentation sort)"


def test_q18_agg_before_join(spark):
    f = facts(spark, "q18_large_orders")
    assert f["smj"] == 0
    assert f["exchanges"] == 1, "only the orderkey aggregation shuffles"


def test_rolling_hash_no_shuffle(spark):
    f = facts(spark, "text_rolling_hash")
    assert f["exchanges"] == 0, "per-row fingerprinting must not shuffle"
    assert f["python"] == 0


def test_current_view_pushes_and_broadcasts(spark):
    # (VersionStore's directory-level partition pruning is pinned by
    # test_ingest.py on the real partitioned layout; the registry twin
    # runs on flat testdata, where the gates are pushdown + join choice)
    f = facts(spark, "current_view")
    assert f["pushed_filters"] >= 1, "dim filter must reach the parquet reader"
    assert f["smj"] == 0


def test_no_row_at_a_time_python_anywhere(spark):
    """Python stages are allowed ONLY as Arrow kernels in the documented
    multimodal/GEMM operators — never BatchEvalPython (row-at-a-time)."""
    pin_comparable_conf(spark)
    for name, q in QUERIES.items():
        plan = explain_str(q.spark(spark, SF_DIR), "formatted")
        assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time UDF"


def test_user_gaps_single_shuffle(spark):
    f = facts(spark, "events_user_gaps")
    assert f["exchanges"] == 1, "window + aggregate share the user_id exchange"


def test_simhash_band_join_shape(spark):
    f = facts(spark, "dedup_simhash64")
    assert f["smj"] == 0, "band self-join must stay hash/broadcast at this scale"
    assert f["python"] == 0
