"""Round-15 A/B: minhash_lsh_exact_pairs deriving signatures from the
cached verification shingle arrays vs re-running tokenize+shingle
(guide §1.2 — one evaluation of the expensive expression).

OLD arm inlined (the round-14 shape: minhash_signatures re-tokenizes);
NEW arm is the production operator. Rows pinned identical first, then
alternating min-of-N on the full dedup_minhash_lsh query shape.

    python tools/r15/ab_minhash_shared_shingles.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from quantum_rag_data_pipeline_spark.operators import dedup as dedup_ops  # noqa: E402
from quantum_rag_data_pipeline_spark.session import get_spark  # noqa: E402
from quantum_rag_data_pipeline_spark.sources.registry import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def exact_pairs_old(df: DataFrame, num_hashes=64, n=5, threshold=0.35,
                    text_col="text", id_col="doc_id") -> DataFrame:
    sig = dedup_ops.minhash_signatures(df, text_col, id_col, num_hashes, n) \
        .localCheckpoint(eager=False)
    buckets = sig.select(F.col(id_col), F.posexplode("sig").alias("band", "band_hash"))
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "band_hash"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b"))
        .distinct()
    )
    sets_ = dedup_ops.tokenized(df, text_col, id_col).select(
        F.col(id_col), dedup_ops.shingles_of_tokens(n).alias("sh")
    ).cache()
    return (
        cand.join(sets_.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sets_.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("jaccard",
                    F.col("inter") / (F.size("sh_a") + F.size("sh_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def build(spark, arm: str) -> DataFrame:
    d = load_table(spark, "documents", SF_DIR)
    if arm == "old":
        return exact_pairs_old(d)
    return dedup_ops.minhash_lsh_exact_pairs(d, num_hashes=64, n=5, threshold=0.35)


def main() -> int:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab-mh-shingles")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).write.mode("overwrite").format("noop").save()

    spark.catalog.clearCache()
    a = {tuple(r) for r in build(spark, "old").collect()}
    spark.catalog.clearCache()
    b = {tuple(r) for r in build(spark, "new").collect()}
    assert a == b and len(b) > 0, f"{len(a)} old vs {len(b)} new"
    print(f"equality pinned: {len(b)} rows identical")

    times: dict[str, list[float]] = {"old": [], "new": []}
    for i in range(n_reps):
        for arm in ("old", "new"):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            build(spark, arm).write.mode("overwrite").format("noop").save()
            times[arm].append(time.perf_counter() - t0)
            print(f"rep {i} {arm}: {times[arm][-1]:.3f} s", flush=True)
    for arm in ("old", "new"):
        ts = sorted(times[arm])
        print(f"{arm}: min {ts[0]:.3f} med {ts[len(ts)//2]:.3f} all "
              f"{[round(t,3) for t in times[arm]]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
