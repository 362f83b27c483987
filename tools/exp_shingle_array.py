"""Experiment (optimization r11, session 3): window vs array shingle build.

Times, at a given SF dir, three shapes with the noop sink (guide §1.4):

  A. posting build, window path   (current shingle_hash_table, distinct=True)
  B. posting build, array path    (tokens → xxhash64 per token inside
                                   transform → sliding xxhash64(h0,h1,h2)
                                   → array_distinct → explode; same hash
                                   formula, so identical posting rows)
  C. full dedup_ngram_jaccard both ways (posting build feeds the
                                   self-join via the registered operator
                                   vs a local clone using the array build)

Usage: python tools/exp_shingle_array.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from kingsfoil_seed_data_ingestor_spark import plans  # noqa: F401
from kingsfoil_seed_data_ingestor_spark.functions import text as TX
from kingsfoil_seed_data_ingestor_spark.operators import text_dedup as DD
from kingsfoil_seed_data_ingestor_spark.operators.caching import CacheScope
from kingsfoil_seed_data_ingestor_spark.plans.tables import load
from kingsfoil_seed_data_ingestor_spark.session import get_spark, pin_comparable_conf


def drain(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def array_shingle_table(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sh) DISTINCT posting list, zero exchanges: token hash +
    sliding n-gram + per-doc set, all row-local. Same hash formula as
    shingle_hash_table, so posting rows are identical."""
    hs = F.transform(TX.tokens(F.col("text")), lambda t: F.xxhash64(t))
    k = F.size(F.col("_hs")) - (n - 1)
    grams = F.when(
        k > 0,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.xxhash64(
                    *[F.element_at(F.col("_hs"), i + off) for off in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        docs.select(F.col("doc_id"), hs.alias("_hs"))
        .select("doc_id", F.explode(grams).alias("shingle"))
    )


def jaccard_pairs_array(
    docs: DataFrame, n: int = 3, threshold: float = 0.5, part_key: str | None = "shingle"
) -> DataFrame:
    scope = CacheScope()
    posts = array_shingle_table(docs, n)
    if part_key:
        posts = posts.repartition(F.col(part_key))
    posts = scope.persist(posts)
    out = (
        DD._pairs_with_jaccard(posts)
        .filter(F.col("jaccard") >= threshold)
        .select("i", "j", F.round("jaccard", 6).alias("jaccard"))
    )
    return scope.attach(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="exp-shingle-array")
    pin_comparable_conf(spark)
    docs = load(spark, sf_dir, "documents")

    cases = {
        "posts_window": lambda: DD.shingle_hash_table(docs, 3).withColumnRenamed(
            "sh", "shingle"
        ),
        "posts_array": lambda: array_shingle_table(docs, 3),
        "jaccard_window": lambda: DD.jaccard_pairs(docs, n=3, threshold=0.5),
        "jaccard_array": lambda: jaccard_pairs_array(docs, 3, 0.5, part_key=None),
        "jaccard_arr_sh": lambda: jaccard_pairs_array(docs, 3, 0.5, part_key="shingle"),
        "jaccard_arr_id": lambda: jaccard_pairs_array(docs, 3, 0.5, part_key="doc_id"),
    }
    # parity check first (cheap at any sf: counts + checksum)
    pw = cases["posts_window"]().select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash("doc_id", "shingle").cast("long")).alias("s"),
    ).first()
    pa = cases["posts_array"]().select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash("doc_id", "shingle").cast("long")).alias("s"),
    ).first()
    print(f"parity posts: window n={pw['n']} s={pw['s']}  array n={pa['n']} s={pa['s']}"
          f"  -> {'MATCH' if tuple(pw) == tuple(pa) else 'MISMATCH'}")

    for name, fn in cases.items():
        drain(fn())  # warm
        spark.catalog.clearCache()
    for _ in range(reps):
        for name, fn in cases.items():
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            drain(fn())
            print(f"{name:16s} {time.perf_counter() - t0:8.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
