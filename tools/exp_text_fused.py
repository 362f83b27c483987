"""Experiment: where does the tokenization-CPU text family spend time,
and does a fused single-pass extraction beat the per-signal HOF lanes?
(VERDICT r11 #7.)

Phases (each drained via noop, best-of-reps, GC-fenced):
  tokens      — split only
  quality     — quality_score lane (tokens + en-hits filter + 2 regex)
  ratios      — the 4 per-language stopword-hit filter lanes
  ratios_fused— ONE transform(lower) + ONE aggregate carrying 4 counters
  punct_re    — punct/digit via length-of-regexp_replace (current)
  punct_cnt   — punct/digit via regexp_count (single pass, no alloc)
  langid      — registered text_langid plan
  funnel      — registered text_quality_funnel plan

Usage: python tools/exp_text_fused.py [--sf DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kingsfoil_seed_data_ingestor_spark.functions import text as TX  # noqa: E402
from kingsfoil_seed_data_ingestor_spark.plans.core import QUERIES  # noqa: E402
from kingsfoil_seed_data_ingestor_spark.plans.tables import load  # noqa: E402
from kingsfoil_seed_data_ingestor_spark.session import (  # noqa: E402
    get_spark,
    pin_comparable_conf,
)


def fused_hit_counts(toks):
    """All 4 languages' stopword hit counts in ONE aggregate pass over
    a once-lowered token array — candidate replacement for 4 separate
    ``filter`` traversals each re-lowering every token."""
    langs = sorted(TX.STOPWORDS)
    lowered = F.transform(toks, lambda t: F.lower(t))
    wordlists = {
        lg: F.array(*[F.lit(w) for w in TX.STOPWORDS[lg]]) for lg in langs
    }
    init = F.struct(
        *[F.lit(0).cast("int").alias(f"h_{lg}") for lg in langs]
    )
    return F.aggregate(
        lowered,
        init,
        lambda acc, t: F.struct(
            *[
                (
                    acc[f"h_{lg}"]
                    + F.array_contains(wordlists[lg], t).cast("int")
                ).alias(f"h_{lg}")
                for lg in langs
            ]
        ),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".scaling/bench_sf1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="exp-text-fused")
    pin_comparable_conf(spark)
    docs = load(spark, args.sf, "documents")
    toks = TX.tokens(F.col("text"))
    langs = sorted(TX.STOPWORDS)
    ratio_cols = TX.lang_ratio_columns(F.col("text"))

    hits = fused_hit_counts(toks)
    n = F.size(toks)
    fused_ratios = [
        F.when(n > 0, hits[f"h_{lg}"] / n).otherwise(F.lit(0.0)).alias(f"r_{lg}")
        for lg in langs
    ]

    phases = {
        "tokens": lambda: docs.select(F.size(toks).alias("n")),
        "quality": lambda: docs.select(TX.quality_score(F.col("text")).alias("q")),
        "ratios": lambda: docs.select(
            *[expr.alias(f"r_{lg}") for lg, expr in ratio_cols.items()]
        ),
        "ratios_fused": lambda: docs.select(*fused_ratios),
        "punct_re": lambda: docs.select(
            (
                F.length("text")
                - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
            ).alias("p"),
            (
                F.length("text")
                - F.length(F.regexp_replace("text", r"[0-9]", ""))
            ).alias("d"),
        ),
        "punct_cnt": lambda: docs.select(
            F.regexp_count("text", F.lit(r"[^\w\s]")).alias("p"),
            F.regexp_count("text", F.lit(r"[0-9]")).alias("d"),
        ),
        "langid": lambda: QUERIES["text_langid"].spark(spark, args.sf),
        "funnel": lambda: QUERIES["text_quality_funnel"].spark(spark, args.sf),
    }

    # parity witnesses first (cheap, at the same SF): fused ratios and
    # regexp_count must be value-identical to the shipped lanes
    cur = docs.select(*[e.alias(f"r_{lg}") for lg, e in ratio_cols.items()])
    new = docs.select(*fused_ratios)
    assert cur.exceptAll(new).isEmpty() and new.exceptAll(cur).isEmpty(), (
        "fused ratios differ"
    )
    pr = phases["punct_re"]().exceptAll(phases["punct_cnt"]()).isEmpty()
    assert pr, "regexp_count differs from length-of-replace"
    print("parity OK: ratios_fused == ratios, punct_cnt == punct_re")

    def drain(df):
        df.write.format("noop").mode("overwrite").save()

    for name, build in phases.items():
        drain(build())  # warm
        best = float("inf")
        for _ in range(args.reps):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            drain(build())
            best = min(best, time.perf_counter() - t0)
        print(f"{name:14s} {best:8.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
