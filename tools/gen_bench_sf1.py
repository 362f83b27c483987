"""Generate the sf1 bench dataset (VERDICT r9 #6): the full 123-query
surface is driver-benched only at sf0.1, and the scaling corpus covers
nine families — a whole-suite sf1 sweep needs sf1 versions of EVERY
table. Construction:

* TPC-H-ish tables (region/nation/customer/supplier/part/orders/
  lineitem): 10× key-shifted replication of the driver's sf0.1 data.
  Each replica r offsets every key column by ``r * stride(key)`` with
  per-key strides chosen above the real max, so referential joins stay
  exactly as selective as at sf0.1 (each replica is a disjoint
  sub-universe) while value columns keep the driver's marginals
  (dates, prices, flags — group-by cardinalities and filter
  selectivities are preserved). region/nation are dimensions shared by
  every replica and stay single-copy, like TPC-H itself (fixed 5/25
  rows at every SF).
* documents/embeddings/events: ``tools/gen_scaling_data.generate``
  at sf=1 — the driver-marginal-matched generator the scaling curves
  already use (fresh texts/vectors with planted twin rates, NOT
  replicas: replicating these 10× would plant every document in a
  10-clone group and quadratically distort the near-dup families'
  work, which is exactly what the bench must not do).

Output dir: ``.scaling/bench_sf1`` (~1.1 GB). Usage:

    python tools/gen_bench_sf1.py
    SPARK_GRAFT_SF_DIR=.scaling/bench_sf1 python bench.py | tee /tmp/b.json
    # → BENCH_SF1.json (top-level artifact, PERF_NOTES §r10 table)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, ".scaling", "bench_sf1")
REPLICAS = 10

#: key columns to shift per table; stride = 10^ceil(log10(max_key+1))
#: per key FAMILY so a replica's keys can never collide with another's
KEY_FAMILIES = {
    "custkey": ["customer.c_custkey", "orders.o_custkey"],
    "suppkey": ["supplier.s_suppkey", "lineitem.l_suppkey"],
    "partkey": ["part.p_partkey", "lineitem.l_partkey"],
    "orderkey": ["orders.o_orderkey", "lineitem.l_orderkey"],
}
REPLICATED = ["customer", "supplier", "part", "orders", "lineitem"]
SHARED_DIMS = ["region", "nation"]


def generate(spark=None) -> str:
    own_session = spark is None
    if spark is None:
        from kingsfoil_seed_data_ingestor_spark.session import get_spark

        spark = get_spark(app_name="gen-bench-sf1")
    os.makedirs(OUT, exist_ok=True)
    marker = os.path.join(OUT, "GENERATED.json")
    spec = {"replicas": REPLICAS, "src": SRC, "version": 1}
    if os.path.exists(marker):
        with open(marker) as fh:
            if json.load(fh) == spec:
                print(f"[gen_bench_sf1] {OUT}: up to date", file=sys.stderr)
                if own_session:
                    spark.stop()
                return OUT

    # per-family strides from the real key maxima
    strides: dict[str, int] = {}
    for fam, cols in KEY_FAMILIES.items():
        mx = 0
        for ref in cols:
            table, col = ref.split(".")
            mx = max(
                mx,
                spark.read.parquet(f"{SRC}/{table}.parquet")
                .agg(F.max(col))
                .first()[0],
            )
        stride = 10 ** len(str(int(mx)))
        strides[fam] = stride
    col_stride = {
        col.split(".")[1]: strides[fam]
        for fam, cols in KEY_FAMILIES.items()
        for col in cols
    }

    for table in SHARED_DIMS:
        spark.read.parquet(f"{SRC}/{table}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{OUT}/{table}.parquet")

    for table in REPLICATED:
        base = spark.read.parquet(f"{SRC}/{table}.parquet")
        shift_cols = [c for c in base.columns if c in col_stride]
        # one replica per value of a generated replica index — a single
        # distributed job per table, no driver-side unions of 10 plans
        rep = base.crossJoin(
            spark.range(REPLICAS).select(F.col("id").alias("__r"))
        )
        for c in shift_cols:
            rep = rep.withColumn(
                c, (F.col(c) + F.col("__r") * F.lit(col_stride[c])).cast("long")
            )
        rep.drop("__r").write.mode("overwrite").parquet(
            f"{OUT}/{table}.parquet"
        )
        print(f"[gen_bench_sf1] {table}: replicated ×{REPLICAS}", file=sys.stderr)

    # fresh (not replicated) docs/vectors/events at sf1
    from tools.gen_scaling_data import generate as gen_scaling

    sf1_src = os.path.join(REPO, ".scaling", "sf1")
    gen_scaling(sf1_src, 1.0)
    for table in ("documents", "embeddings", "events"):
        src = os.path.join(sf1_src, f"{table}.parquet")
        dst = os.path.join(OUT, f"{table}.parquet")
        spark.read.parquet(src).write.mode("overwrite").parquet(dst)
        print(f"[gen_bench_sf1] {table}: from scaling sf1", file=sys.stderr)

    with open(marker, "w") as fh:
        json.dump(spec, fh)
    if own_session:
        spark.stop()
    return OUT


if __name__ == "__main__":
    generate()
    print(OUT)
