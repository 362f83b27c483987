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
from pyspark.sql import functions as F

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


# ----------------------------------------------------------------------
# skew proof under data (round 6): a synthesized hot key — one user
# holding ~20-50% of all rows — not just design notes
# ----------------------------------------------------------------------


def _hot_key_events(spark, n, hot_every=5, hot_user=7, n_users=50_000):
    """Synthetic events where every `hot_every`-th row belongs to one
    user: hot_every=5 makes user 7 ~20% of the corpus."""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.pmod(F.col("id"), F.lit(hot_every)) == 0, F.lit(hot_user))
        .otherwise(F.pmod(F.col("id"), F.lit(n_users)))
        .alias("user_id"),
        (F.col("id") % 997).cast("double").alias("value"),
    )


def test_salted_top_k_exact_and_parallel_under_hot_key(spark):
    """salted_top_k under a 20% hot key: (a) bit-identical to the naive
    single-window top-k, and (b) the salt really splits the hot key —
    its largest (key, salt) group is ~hot/n_salts, i.e. the stage's
    max single-task partition shrinks n_salts-fold. Wall-clock is NOT
    asserted: on local[32] a few-million-row single-task in-memory sort
    costs well under a second, so the win only shows at cluster data
    sizes (cold measurements in PLANS.md's skew section)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kingsfoil_seed_data_ingestor_spark.operators import skew as SK

    df = _hot_key_events(spark, 300_000).cache()
    try:
        order = [F.desc("value"), F.asc("event_id")]
        naive_w = Window.partitionBy("user_id").orderBy(*order)
        naive = (
            df.withColumn("rank", F.row_number().over(naive_w))
            .filter(F.col("rank") <= 5)
        )
        salted = SK.salted_top_k(
            df, ["user_id"], order, 5, salt_from=["event_id"], n_salts=32
        )
        assert sorted(map(tuple, naive.collect())) == sorted(
            map(tuple, salted.collect())
        )

        hot_rows = df.filter(F.col("user_id") == 7).count()
        assert hot_rows >= 0.19 * 300_000  # the fixture really is skewed
        groups = (
            SK.with_salt(df.filter(F.col("user_id") == 7), ["event_id"], 32)
            .groupBy("_salt")
            .count()
            .collect()
        )
        assert len(groups) == 32  # every salt lane populated
        assert max(r["count"] for r in groups) <= 2 * hot_rows / 32
    finally:
        df.unpersist()


def test_aqe_splits_skewed_join(spark):
    """AQE's runtime skew-join split fires on the hot-key join: the
    executed adaptive plan carries SortMergeJoin(skew=true). Thresholds
    are lowered to make 400k local rows look like a skewed cluster
    partition; production defaults (256 MB) scale the same mechanism."""
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        ev = _hot_key_events(spark, 400_000, hot_every=2)
        users = spark.range(50_000).select(
            F.col("id").alias("user_id"), (F.col("id") % 17).alias("segment")
        )
        j = ev.join(users, "user_id").select("event_id", "segment")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert plan.count("skew=true") >= 1, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q19_disjunction_derives_per_table_pushdown(spark):
    """Catalyst can't split the cross-table OR, but constraint
    derivation must push the per-table implications (brand/size to
    part, the quantity range union to lineitem) into BOTH scans."""
    f = facts(spark, "q19_disjunctive_revenue")
    assert f["pushed_filters"] == 2, "both sides of the disjunction pruned"
    assert f["smj"] == 0 and f["bhj"] == 1, "part broadcasts"


def test_cms_probe_join_broadcasts(spark):
    """The Count-Min counter table is ≤ D·W rows — probing it must be
    a broadcast join, never a shuffle of the probe side."""
    f = facts(spark, "events_heavy_hitters_cms")
    assert f["smj"] == 0
    assert f["bhj"] >= 1, "counter table must broadcast into the probe"


def test_bloom_word_join_broadcasts(spark):
    """The Bloom word table is ≤ 64 rows — the probe join must
    broadcast it; a sort-merge here would shuffle every probe key."""
    f = facts(spark, "events_bloom_prefilter")
    assert f["smj"] == 0
    assert f["bhj"] >= 1


# ----------------------------------------------------------------------
# data layout (round 7): partition pruning + range clustering
# ----------------------------------------------------------------------


def test_partitioned_write_prunes_directories(spark, tmp_path):
    """A filter on a hive-partition column must resolve at the FILE
    INDEX (PartitionFilters in the scan, pruned dirs never listed) —
    the filtered read touches only the matching directory's files."""
    from kingsfoil_seed_data_ingestor_spark.operators.layout import (
        files_touched,
        write_partitioned,
    )
    from kingsfoil_seed_data_ingestor_spark.plans.tables import load

    out = str(tmp_path / "events_by_type")
    ev = load(spark, SF_DIR, "events")
    n_types = ev.select("event_type").distinct().count()
    write_partitioned(ev, out, ["event_type"], sort_cols=["ts"])

    plan = explain_str(
        spark.read.parquet(out).filter(F.col("event_type") == "purchase"),
        "formatted",
    )
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "partition filter must reach the file index"

    touched, total = files_touched(
        spark, out, F.col("event_type") == "purchase"
    )
    assert total >= n_types, (touched, total)
    assert touched <= total // n_types + 1, (
        "pruned scan must touch only the purchase directory",
        touched,
        total,
    )


def test_range_clustered_write_skips_files(spark, tmp_path):
    """A narrow range predicate over a range-clustered table draws
    rows from ~1 of N files; the same predicate over a round-robin
    layout draws from every file — the measured difference IS the
    layout's value."""
    from kingsfoil_seed_data_ingestor_spark.operators.layout import (
        files_touched,
        write_range_clustered,
    )
    from kingsfoil_seed_data_ingestor_spark.plans.tables import load

    docs = load(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    lo, hi = 100, 199  # 100 of the 500 sf0.001 doc ids
    pred = F.col("doc_id").between(lo, hi)

    clustered = str(tmp_path / "docs_clustered")
    write_range_clustered(docs, clustered, "doc_id", n_files=8)
    c_touched, c_total = files_touched(spark, clustered, pred)

    scattered = str(tmp_path / "docs_scattered")
    docs.repartition(8).write.parquet(scattered)
    s_touched, s_total = files_touched(spark, scattered, pred)

    assert c_total == 8 and s_total == 8, (c_total, s_total)
    assert c_touched <= 3, ("range layout must localize the range", c_touched)
    assert s_touched >= 6, ("round-robin control should scatter", s_touched)


def test_zorder_clustered_write_skips_files_on_both_dims(spark, tmp_path):
    """Z-order vs single-column clustering on a 1000×1000 grid: a
    filter on the NON-clustered dimension touches ~every file of the
    single-column layout (its files each span all of y) but only a
    fraction of the Z-ordered one (its files cover rectangles, so y
    min/max stats prune) — while the Z layout stays competitive on
    the clustered dimension too. The measured file counts ARE the
    operator's value; assertions leave slack for boundary files."""
    from kingsfoil_seed_data_ingestor_spark.operators.layout import (
        files_touched,
        write_range_clustered,
        write_zorder_clustered,
    )

    grid = spark.range(20_000).select(
        (F.col("id") % 1000).alias("x"),
        ((F.col("id") * 7919) % 1000).alias("y"),
    )
    y_pred = F.col("y").between(100, 149)  # 5% of y-space, any x
    box_pred = F.col("x").between(100, 149) & F.col("y").between(100, 149)

    zpath = str(tmp_path / "grid_zorder")
    write_zorder_clustered(grid, zpath, "x", "y", n_files=16)
    xpath = str(tmp_path / "grid_xrange")
    write_range_clustered(grid, xpath, "x", n_files=16)

    zy, zt = files_touched(spark, zpath, y_pred)
    xy, xt = files_touched(spark, xpath, y_pred)
    assert zt == 16 and xt == 16, (zt, xt)
    # x-clustered layout: every x-slice file contains the y-band
    assert xy >= 14, ("x-clustered control should touch ~all files", xy)
    # z-ordered: the y-band pins interleaved prefix bits -> ~1/4 of files
    assert zy <= 8, ("z-order must localize the non-primary dimension", zy)

    zb, _ = files_touched(spark, zpath, box_pred)
    xb, _ = files_touched(spark, xpath, box_pred)
    assert zb <= 4, ("z-order should localize a 2D box tightly", zb)
    assert zb <= xb + 1, ("z should not lose to x-clustering on a box", zb, xb)
