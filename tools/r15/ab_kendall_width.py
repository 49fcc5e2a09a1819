"""Round-15 A/B: kendall_tau_blocked with an explicit (seg, mo)
repartition at the session shuffle width vs the round-14 shape whose
pair-explosion stage AQE coalesced to 3 tasks (guide §2.5 — the
quadratic stage is compute-bound, not bytes-bound).

    python tools/r15/ab_kendall_width.py [n_reps]
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


def kendall_old(spark):
    o = load_table(spark, "orders", SF_DIR)
    c = load_table(spark, "customer", SF_DIR)
    j = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("seg"),
        F.date_trunc("month", "o_orderdate").alias("mo"),
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("x"),
        F.col("c_acctbal").alias("y"),
    )
    b = j.select(
        F.col("seg").alias("seg2"), F.col("mo").alias("mo2"),
        F.col("k").alias("k2"), F.col("x").alias("x2"), F.col("y").alias("y2"),
    )
    pairs = j.join(
        b,
        (F.col("seg") == F.col("seg2"))
        & (F.col("mo") == F.col("mo2"))
        & (F.col("k") < F.col("k2")),
    ).select(
        "seg",
        F.when(((F.col("x") < F.col("x2")) & (F.col("y") < F.col("y2")))
               | ((F.col("x") > F.col("x2")) & (F.col("y") > F.col("y2"))), 1)
        .otherwise(0).alias("conc"),
        F.when(((F.col("x") < F.col("x2")) & (F.col("y") > F.col("y2")))
               | ((F.col("x") > F.col("x2")) & (F.col("y") < F.col("y2"))), 1)
        .otherwise(0).alias("disc"),
        F.when((F.col("x") == F.col("x2")) & (F.col("y") != F.col("y2")), 1)
        .otherwise(0).alias("tx"),
        F.when((F.col("y") == F.col("y2")) & (F.col("x") != F.col("x2")), 1)
        .otherwise(0).alias("ty"),
    )
    agg = pairs.groupBy("seg").agg(
        F.sum("conc").cast("bigint").alias("c"),
        F.sum("disc").cast("bigint").alias("d"),
        F.sum("tx").cast("bigint").alias("tx"),
        F.sum("ty").cast("bigint").alias("ty"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    tau = (F.col("c") - F.col("d")) / F.sqrt(
        (F.col("c") + F.col("d") + F.col("tx")).cast("double")
        * (F.col("c") + F.col("d") + F.col("ty")))
    return agg.select(
        "seg", F.col("c").alias("concordant"), F.col("d").alias("discordant"),
        "n_pairs", F.round(tau, 6).alias("kendall_tau_b"))


def build(spark, arm):
    if arm == "old":
        return kendall_old(spark)
    return QUERIES["kendall_tau_blocked"](spark, SF_DIR)


def main() -> int:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab-kendall")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).write.mode("overwrite").format("noop").save()

    a = sorted(tuple(r) for r in build(spark, "old").collect())
    b = sorted(tuple(r) for r in build(spark, "new").collect())
    assert a == b and len(b) > 0, (a, b)
    print(f"equality pinned: {len(b)} rows identical")

    times = {"old": [], "new": []}
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
