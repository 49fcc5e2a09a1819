"""Round-15 A/B: strict_funnel_bounded_gaps exact medians via the
two-level bucket rank (assign_global_ids over 1h/128 gap buckets) vs the
round-14 unpartitioned-window rank (Exchange SinglePartition over the
data-proportional gap frame). Rows pinned identical, alternating
min-of-N on the full query shape.

    python tools/r15/ab_funnel_median.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import Column, DataFrame, functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from quantum_rag_data_pipeline_spark.queries import QUERIES  # noqa: E402
from quantum_rag_data_pipeline_spark.session import get_spark  # noqa: E402
from quantum_rag_data_pipeline_spark.sources.registry import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def funnel_old(spark) -> DataFrame:
    """The round-14 shape, verbatim except the stage() median rank."""
    ev = load_table(spark, "events", SF_DIR)
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("v_ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"))
    c = (v.join(clicks, (F.col("cu") == F.col("user_id"))
                & (F.col("cts") > F.col("v_ts"))
                & (F.col("cts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")))
         .groupBy("user_id", "v_ts").agg(F.min("cts").alias("c_ts")).cache())
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"))
    p = (c.join(purch, (F.col("pu") == F.col("user_id"))
                & (F.col("pts") > F.col("c_ts"))
                & (F.col("pts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")))
         .groupBy("user_id", "v_ts", "c_ts").agg(F.min("pts").alias("p_ts")).cache())

    def stage(df: DataFrame, name: str, gap: Column | None) -> DataFrame:
        n = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        if gap is None:
            return n.select(F.lit(name).alias("stage"), "n_users",
                            F.lit(None).cast("double").alias("median_gap_seconds"))
        g = df.select(gap.alias("g"), "user_id")
        med = g.select(
            "g",
            F.row_number().over(Window.orderBy("g", "user_id")).alias("rk"),
            F.count(F.lit(1)).over(
                Window.rowsBetween(Window.unboundedPreceding,
                                   Window.unboundedFollowing)).alias("nn"),
        ).filter(F.col("rk") == F.floor((F.col("nn") + 1) / 2)).agg(
            (F.min("g").cast("double") / 1000000.0).alias("median_gap_seconds"))
        return n.crossJoin(F.broadcast(med)).select(
            F.lit(name).alias("stage"), "n_users", "median_gap_seconds")

    gap_vc = F.unix_micros("c_ts") - F.unix_micros("v_ts")
    gap_cp = F.unix_micros("p_ts") - F.unix_micros("c_ts")
    return (stage(v, "viewed", None)
            .unionByName(stage(c, "clicked_within_1h", gap_vc))
            .unionByName(stage(p, "purchased_within_1h_of_click", gap_cp)))


def build(spark, arm: str) -> DataFrame:
    if arm == "old":
        return funnel_old(spark)
    return QUERIES["strict_funnel_bounded_gaps"](spark, SF_DIR)


def main() -> int:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab-funnel-median")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).write.mode("overwrite").format("noop").save()

    spark.catalog.clearCache()
    a = sorted(tuple(r) for r in build(spark, "old").collect())
    spark.catalog.clearCache()
    b = sorted(tuple(r) for r in build(spark, "new").collect())
    assert a == b and len(b) == 3, (a, b)
    print(f"equality pinned: {b}")

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
