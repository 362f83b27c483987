"""Dev scratch: stage-by-stage wall time of the minhash_near_dups
pipeline at sf0.1 — identifies which phase owns the bench cost."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kingsfoil_seed_data_ingestor_spark.operators import text_dedup as DD
from kingsfoil_seed_data_ingestor_spark.plans.tables import load
from kingsfoil_seed_data_ingestor_spark.session import get_spark, pin_comparable_conf


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:32s} {time.perf_counter() - t0:8.3f}s")
    return out


def drain(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="dissect-minhash")
    pin_comparable_conf(spark)
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    docs = load(spark, sf, "documents")
    # warm the scan
    drain(docs)

    posts = DD.shingle_hash_table(docs, 3, distinct=False)
    t("shingle_hash_table (no distinct)", lambda: drain(posts))

    posts = posts.persist()
    t("posts persist+count", lambda: posts.count())

    profiles = DD.split_profiles_from_hashed_posts(posts, 96)
    t("profiles (split lanes + shset aggs)", lambda: drain(profiles))
    profiles = profiles.persist()
    t("profiles persist+count", lambda: profiles.count())

    fused = DD.minhash_profiles(docs, 96, 3)
    t("profiles FUSED (ObjectHashAgg path)", lambda: drain(fused))

    cands = DD.lsh_candidate_pairs(profiles.select("doc_id", "signature"), 32, 3)
    t("lsh_candidate_pairs", lambda: drain(cands))
    cands = cands.persist()
    t("cands persist+count", lambda: cands.count())

    full = DD.minhash_near_dups(docs, threshold=0.8)
    t("FULL minhash_near_dups (cold)", lambda: drain(full))
    profiles.unpersist()
    cands.unpersist()
    spark.catalog.clearCache()
    full = DD.minhash_near_dups(docs, threshold=0.8)
    t("FULL minhash_near_dups (cleared)", lambda: drain(full))


if __name__ == "__main__":
    main()
