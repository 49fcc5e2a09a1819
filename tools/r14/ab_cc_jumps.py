"""Round-14 A/B: connected-components loop shape.

Variants over (jumps_per_round, rounds_per_count):
  (1,1) = current fused loop
  (1,2) = convergence count every 2nd round (half the jobs; with lazy
          checkpoints the uncounted round materializes in the NEXT
          round's count — 2 rounds per job)

All variants are exactness-preserving: min-label propagation with extra
jump compositions is monotone with the same unique fixpoint, and the
changed==0 check stays exact at any granularity.

REJECTED variants (2,1)/(2,2)/(3,2) — multiple pointer jumps per round:
each extra jump is another SELF-join of the round's frame, and catalyst's
size-only join stats MULTIPLY child sizes, so the checkpoint-carried
sizeInBytes digit count grows x4-x8 per round instead of x2; the first
run of this A/B ground for 19 minutes inside
BigInteger.multiplyToomCook3 under localCheckpoint's
rewriteStatsAndConstraints before it was killed (jstack: Thread-3
RUNNABLE in SizeInBytesOnlyStatsPlanVisitor.visitJoin). See
tools/r14/cc_stats_growth.py for the measured growth curve and the
scratch-parquet stats reset that bounds the single-jump loop.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from quantum_rag_data_pipeline_spark.session import get_spark  # noqa: E402
from quantum_rag_data_pipeline_spark.sources.registry import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cc_loop(edges, jumps: int, per_count: int, max_iter: int = 25):
    e = (
        edges.select(F.col("src").cast("long").alias("u"), F.col("dst").cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).localCheckpoint(
        eager=True
    )
    labels = (
        sym.select(F.col("u").alias("node")).distinct().withColumn("lbl", F.col("node"))
    ).localCheckpoint(eager=True)
    rounds = 0
    while rounds < max_iter:
        pending = None
        for _ in range(per_count):
            rounds += 1
            nbr_min = (
                sym.join(labels.select(F.col("node").alias("v"), "lbl"), "v")
                .groupBy("u")
                .agg(F.min("lbl").alias("nbr_lbl"))
                .select(F.col("u").alias("node"), "nbr_lbl")
            )
            cur = labels.join(nbr_min, "node", "left").select(
                "node",
                F.col("lbl").alias("old_lbl"),
                F.least("lbl", F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
            )
            for _j in range(jumps):
                parent = cur.select(F.col("node").alias("p_node"), F.col("lbl").alias("p_lbl"))
                cur = cur.join(parent, cur["lbl"] == parent["p_node"], "left").select(
                    "node", "old_lbl", F.coalesce("p_lbl", "lbl").alias("lbl")
                )
            pending = cur.localCheckpoint(eager=False)
            labels = pending.select("node", "lbl")
        changed = pending.filter(F.col("lbl") != F.col("old_lbl")).count()
        if changed == 0:
            return labels.select("node", F.col("lbl").alias("cluster_id")), rounds
    raise RuntimeError("no converge")


def run_query(spark, jumps, per_count):
    t0 = time.perf_counter()
    li = load_table(spark, "lineitem", SF_DIR).filter(
        (F.col("l_quantity") >= 49.5) & (F.col("l_discount") >= 0.09)
    )
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") + F.lit(100000000)).alias("dst"),
    )
    labels, rounds = cc_loop(edges, jumps, per_count)
    off = F.lit(100000000)
    out = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.when(F.col("node") < off, 1).otherwise(0)).alias("n_suppliers"),
        F.sum(F.when(F.col("node") >= off, 1).otherwise(0)).alias("n_parts"),
    )
    out.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return dt, rounds


def checksum(spark, jumps, per_count):
    li = load_table(spark, "lineitem", SF_DIR).filter(
        (F.col("l_quantity") >= 49.5) & (F.col("l_discount") >= 0.09)
    )
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") + F.lit(100000000)).alias("dst"),
    )
    labels, _ = cc_loop(edges, jumps, per_count)
    rows = sorted((r.node, r.cluster_id) for r in labels.collect())
    spark.catalog.clearCache()
    return hash(tuple(rows))


def main():
    spark = get_spark("ab-cc-jumps")
    spark.sparkContext.setLogLevel("ERROR")
    variants = [(1, 1), (1, 2)]
    # equality proof first
    sums = {v: checksum(spark, *v) for v in variants}
    base = sums[(1, 1)]
    for v, s in sums.items():
        assert s == base, f"variant {v} labels differ!"
    print("all variants produce identical labels")
    for v in variants:
        run_query(spark, *v)  # warm
    times = {v: [] for v in variants}
    rounds = {}
    for _ in range(4):
        for v in variants:
            dt, r = run_query(spark, *v)
            times[v].append(dt)
            rounds[v] = r
    for v in variants:
        t = times[v]
        print(f"jumps={v[0]} per_count={v[1]} rounds={rounds[v]:2d} "
              f"min {min(t):.3f} med {statistics.median(t):.3f} "
              f"{[round(x,3) for x in t]}")
    spark.stop()


if __name__ == "__main__":
    main()
