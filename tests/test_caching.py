"""Persist-lifetime discipline: no operator may leave pinned storage
behind once its result has been drained and released — a long-lived
session (the 100 TB posture) must not accumulate cached intermediates."""

from __future__ import annotations

import gc

import pytest
from pyspark.sql import functions as F

from kingsfoil_seed_data_ingestor_spark.operators.caching import CacheScope
from kingsfoil_seed_data_ingestor_spark.plans.core import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def n_pinned(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


#: every registered query whose operator persists intermediates
CACHING_QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_components",
    "dedup_minhash_lsh",
    "dedup_embed_cosine",
    "dedup_embed_cosine_tiled",
    "dedup_embed_cosine_rhp",
    "embed_ann_recall_frozen",
]


@pytest.mark.parametrize("name", CACHING_QUERIES)
def test_no_pinned_rdds_after_query(spark, name):
    spark.catalog.clearCache()
    gc.collect()
    assert n_pinned(spark) == 0, "dirty baseline"
    df = QUERIES[name].spark(spark, SF_DIR)
    df.count()  # drain while the result (and its caches) are alive
    del df
    gc.collect()  # finalizer fires -> scopes release
    assert n_pinned(spark) == 0, f"{name} left pinned RDDs after release"


def test_cache_scope_explicit_release(spark):
    spark.catalog.clearCache()
    scope = CacheScope()
    df = scope.persist(spark.range(100).withColumn("x", F.col("id") * 2))
    df.count()
    assert df.is_cached and n_pinned(spark) >= 1
    scope.release()
    assert n_pinned(spark) == 0
    scope.release()  # idempotent
    assert df.count() == 100  # recompute from lineage still works


def test_cache_scope_context_manager(spark):
    spark.catalog.clearCache()
    with CacheScope() as scope:
        df = scope.persist(spark.range(50))
        df.count()
        assert n_pinned(spark) >= 1
    assert n_pinned(spark) == 0


def test_cache_scope_respects_outer_ownership(spark):
    spark.catalog.clearCache()
    outer = CacheScope()
    df = outer.persist(spark.range(10))
    df.count()
    inner = CacheScope()
    same = inner.persist(df)  # already cached -> not re-registered
    assert same is df
    inner.release()
    assert n_pinned(spark) >= 1, "inner release must not steal outer's cache"
    outer.release()
    assert n_pinned(spark) == 0


def test_cache_scope_detects_equivalent_plan_cached_elsewhere(spark):
    # the already-cached check must be a CacheManager lookup by PLAN,
    # not a Python object attribute: a fresh DataFrame object over a
    # cached plan must not be re-registered (its release would drop the
    # owner's cache)
    spark.catalog.clearCache()
    owner = spark.range(77).selectExpr("id", "id * 3 AS y")
    owner.persist()
    owner.count()
    equivalent = spark.range(77).selectExpr("id", "id * 3 AS y")  # new object
    scope = CacheScope()
    out = scope.persist(equivalent)
    assert out is equivalent
    scope.release()
    assert n_pinned(spark) >= 1, "scope release must not drop the owner's cache"
    owner.unpersist()
    assert n_pinned(spark) == 0
