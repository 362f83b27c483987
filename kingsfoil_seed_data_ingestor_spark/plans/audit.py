"""Physical-plan fact extraction — shared by the PLANS.md audit tool
and the plan-regression tests.

``plan_facts(df)`` compiles a DataFrame and returns the scale-relevant
facts of its physical plan: scans + columns read (pruning), pushed
filters, exchange count, broadcast vs sort-merge joins, whole-stage
codegen spans, Python (Arrow) stages. The audit tool renders these for
every registered query; ``tests/test_plan_properties.py`` pins the
properties that must never regress (a dimension join degrading to SMJ,
a pushdown lost, a map-only operator growing a shuffle).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def count_nodes(plan: str, op_pattern: str) -> int:
    """Count operator nodes via their detail headers ``(<id>) <Op>`` —
    formatted explain prints every node twice (tree + details), so a
    bare substring count double-counts."""
    return len(set(re.findall(rf"^\((\d+)\) (?:{op_pattern})\s*$", plan, re.M)))


def plan_facts(df: DataFrame) -> dict:
    """Facts from a DataFrame's compiled (pre-execution) plan."""
    return facts_from_plans(
        explain_str(df, "formatted"), explain_str(df, "simple")
    )


def facts_from_plans(plan: str, simple: str) -> dict:
    """Facts from already-captured explain strings — ``simple`` may be
    the AQE-finalized executed plan (codegen spans only exist there)."""
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    n_cols = [len([c for c in s.split(",") if ":" in c]) for s in read_schemas]
    return {
        "scans": len(read_schemas),
        "cols_read": n_cols,
        "pushed_filters": sum(1 for p in pushed if p.strip()),
        "exchanges": count_nodes(plan, "Exchange"),
        "bhj": count_nodes(plan, r"BroadcastHashJoin\b.*"),
        "smj": count_nodes(plan, r"SortMergeJoin\b.*"),
        "codegen": len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", simple))
            | set(re.findall(r"\*\((\d+)\)", simple))
        ),
        "python": count_nodes(
            plan,
            r"ArrowEvalPython.*|MapInPandas.*|FlatMapGroupsInPandas.*|BatchEvalPython.*",
        ),
        "partition_filters": len(
            re.findall(r"PartitionFilters: \[([^\]]+)\]", plan)
        ),
    }
