"""Round-15 A/B: functional_dependency_profile aggregated per table on
NATIVE key types vs the round-14 string-cast union (guide §2.3).

    python tools/r15/ab_fdp_native.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from quantum_rag_data_pipeline_spark.queries import QUERIES  # noqa: E402
from quantum_rag_data_pipeline_spark.session import get_spark  # noqa: E402
from quantum_rag_data_pipeline_spark.sources.registry import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = {
    "nation": ("n_nationkey", "n_regionkey"),
    "customer": ("c_nationkey", "c_mktsegment"),
    "orders": ("o_custkey", "o_orderpriority"),
    "lineitem": ("l_orderkey", "l_returnflag"),
    "events": ("user_id", "event_type"),
}


def fdp_old(spark):
    parts = []
    for tbl, (lhs, rhs) in TABLES.items():
        t = load_table(spark, tbl, SF_DIR)
        parts.append(
            t.select(
                F.lit(tbl).alias("tbl"), F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.col(lhs).cast("string").alias("l"),
                F.col(rhs).cast("string").alias("r"),
            )
        )
    cands = parts[0]
    for p in parts[1:]:
        cands = cands.unionByName(p)
    pair_counts = cands.groupBy("tbl", "lhs", "rhs", "l", "r").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"))
    per_lhs = pair_counts.groupBy("tbl", "lhs", "rhs", "l").agg(
        F.sum("c").cast("bigint").alias("n_l"),
        F.max("c").cast("bigint").alias("max_r"))
    return per_lhs.groupBy("tbl", "lhs", "rhs").agg(
        F.sum("n_l").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_lhs_groups"),
        (F.sum("n_l") - F.sum("max_r")).cast("bigint").alias("n_violations"),
        F.round(F.sum("max_r").cast("double") / F.sum("n_l"), 6).alias("fd_strength"),
        (F.sum("n_l") == F.sum("max_r")).alias("holds_exactly"))


def build(spark, arm: str):
    if arm == "old":
        return fdp_old(spark)
    return QUERIES["functional_dependency_profile"](spark, SF_DIR)


def main() -> int:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab-fdp")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).write.mode("overwrite").format("noop").save()

    a = sorted(tuple(r) for r in build(spark, "old").collect())
    b = sorted(tuple(r) for r in build(spark, "new").collect())
    assert a == b and len(b) == 5, (a, b)
    print("equality pinned: 5 rows identical")

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
