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

Output dir: ``.scaling/bench_sf1`` (~1.1 GB). Since r11 the same
construction generalizes to any integer multiple of sf0.1 — replica
sub-universes stay disjoint for ANY replica count because each key
family's stride exceeds its real maximum — so ``scale=3.0`` builds
``.scaling/bench_sf3`` (30 replicas + fresh sf3 docs/vectors/events)
for the sf3 full-suite sweep the capped referees made runnable
(PERF_NOTES §r11). Usage:

    python tools/gen_bench_sf1.py [scale]
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


def _out_dir(scale: float) -> str:
    label = int(scale) if float(scale).is_integer() else scale
    return os.path.join(REPO, ".scaling", f"bench_sf{label}")


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


def generate(spark=None, scale: float = 1.0) -> str:
    """Build the full-suite bench dataset at ``scale``×sf1 (10·scale
    replicas of the sf0.1 relational tables + fresh scaling-generator
    docs/vectors/events at sf=scale). ``scale`` must make the replica
    count integral."""
    replicas = int(round(REPLICAS * scale))
    if abs(replicas - REPLICAS * scale) > 1e-9 or replicas < 1:
        raise ValueError(f"scale {scale} needs an integral replica count")
    out = _out_dir(scale)
    own_session = spark is None
    if spark is None:
        from kingsfoil_seed_data_ingestor_spark.session import get_spark

        spark = get_spark(app_name="gen-bench-sf1")
    os.makedirs(out, exist_ok=True)
    marker = os.path.join(out, "GENERATED.json")
    spec = {"replicas": replicas, "src": SRC, "version": 1}
    if os.path.exists(marker):
        with open(marker) as fh:
            if json.load(fh) == spec:
                print(f"[gen_bench_sf1] {out}: up to date", file=sys.stderr)
                if own_session:
                    spark.stop()
                return out

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
        ).parquet(f"{out}/{table}.parquet")

    for table in REPLICATED:
        base = spark.read.parquet(f"{SRC}/{table}.parquet")
        shift_cols = [c for c in base.columns if c in col_stride]
        # one replica per value of a generated replica index — a single
        # distributed job per table, no driver-side unions of N plans
        rep = base.crossJoin(
            spark.range(replicas).select(F.col("id").alias("__r"))
        )
        for c in shift_cols:
            rep = rep.withColumn(
                c, (F.col(c) + F.col("__r") * F.lit(col_stride[c])).cast("long")
            )
        rep.drop("__r").write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )
        print(f"[gen_bench_sf1] {table}: replicated ×{replicas}", file=sys.stderr)

    # fresh (not replicated) docs/vectors/events at sf=scale
    from tools.gen_scaling_data import generate as gen_scaling

    scaling_label = int(scale) if float(scale).is_integer() else scale
    scaling_src = os.path.join(REPO, ".scaling", f"sf{scaling_label}")
    gen_scaling(scaling_src, float(scale))
    for table in ("documents", "embeddings", "events"):
        src = os.path.join(scaling_src, f"{table}.parquet")
        dst = os.path.join(out, f"{table}.parquet")
        spark.read.parquet(src).write.mode("overwrite").parquet(dst)
        print(
            f"[gen_bench_sf1] {table}: from scaling sf{scaling_label}",
            file=sys.stderr,
        )

    with open(marker, "w") as fh:
        json.dump(spec, fh)
    if own_session:
        spark.stop()
    return out


if __name__ == "__main__":
    _scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    print(generate(scale=_scale))
