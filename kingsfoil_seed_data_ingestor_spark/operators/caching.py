"""Deterministic lifetime management for persisted intermediates.

Several operators persist mid-pipeline tables that feed multiple plan
branches (posting lists, LSH band tables, GEMM tiles, the vector table
under an iterative quantizer). ``DataFrame.persist`` registers the plan
in Spark's CacheManager, which holds it until an explicit ``unpersist``
— so a long-lived session that runs these operators repeatedly
accumulates pinned storage even after the results are consumed.

``CacheScope`` makes the lifetime explicit:

* operators route every internal ``persist`` through a scope;
* a caller that passes its own scope owns release (``scope.release()``
  after draining the result — or use the scope as a context manager);
* when no scope is passed, the operator attaches its private scope to
  the returned DataFrame with a ``weakref.finalize``: the intermediates
  unpersist automatically when the result object is garbage-collected.
  Correctness never depends on the cache — if a caller re-executes a
  plan after release, Spark recomputes from lineage.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


class CacheScope:
    """Owns a set of persisted DataFrames and releases them together."""

    def __init__(self) -> None:
        self._dfs: list[DataFrame] = []

    def persist(self, df: DataFrame) -> DataFrame:
        """Persist ``df`` (default spillable MEMORY_AND_DISK level) and
        track it for release. A DataFrame whose PLAN is already cached
        — the caller persisted it (or an equivalent plan) under an
        outer scope — is returned untouched so ownership stays with
        that outer scope. The check must be ``storageLevel`` (a live
        CacheManager lookup by plan), NOT ``is_cached`` (a Python
        object attribute set only by persist() on that instance): two
        DataFrame objects over the same source would otherwise
        double-register, and this scope's release would drop the
        caller's cache out from under it."""
        lvl = df.storageLevel
        if lvl.useMemory or lvl.useDisk or lvl.useOffHeap:
            return df
        df = df.persist()
        self._dfs.append(df)
        return df

    def release(self) -> None:
        """Unpersist everything this scope owns (idempotent; safe after
        session shutdown)."""
        dfs, self._dfs = self._dfs, []
        for df in dfs:
            try:
                df.unpersist()
            except Exception:  # session already stopped — nothing pinned
                pass

    def attach(self, result: DataFrame) -> DataFrame:
        """Tie this scope's lifetime to ``result``: release fires when
        the result DataFrame is garbage-collected. Used by operators
        whose caller did not pass a scope, so the public API cannot
        leak pinned storage. Note a plan *derived* from ``result`` does
        not keep it alive — callers composing further should pass their
        own scope instead."""
        weakref.finalize(result, self.release)
        return result

    def __enter__(self) -> "CacheScope":
        return self

    def __exit__(self, *exc: object) -> None:
        self.release()


def scope_or_own(scope: CacheScope | None) -> tuple[CacheScope, bool]:
    """Return (scope, owns): ``owns`` is True when the operator created
    the scope itself and must attach it to its result."""
    return (scope, False) if scope is not None else (CacheScope(), True)
