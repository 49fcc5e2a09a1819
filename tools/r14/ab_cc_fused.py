"""Round-14 A/B: connected-components loop — eager=True checkpoint +
separate count (2 jobs/round, the r13 shape) vs eager=False checkpoint
materialized BY the convergence count (1 job/round, the r14 candidate).

Runs the full graph_connected_components query shape (edges from
lineitem, loop, final groupBy agg to noop) with both loop variants in
ONE session, alternating A/B, and prints min/median per variant.
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


def cc_loop(edges, fused: bool, max_iter: int = 25):
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
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.select(F.col("node").alias("v"), "lbl"), "v")
            .groupBy("u")
            .agg(F.min("lbl").alias("nbr_lbl"))
            .select(F.col("u").alias("node"), "nbr_lbl")
        )
        cand = labels.join(nbr_min, "node", "left").select(
            "node",
            F.col("lbl").alias("old_lbl"),
            F.least("lbl", F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
        )
        parent = cand.select(F.col("node").alias("p_node"), F.col("lbl").alias("p_lbl"))
        jumped = (
            cand.join(parent, cand["lbl"] == parent["p_node"], "left")
            .select("node", "old_lbl", F.coalesce("p_lbl", "lbl").alias("lbl"))
            .localCheckpoint(eager=not fused)
        )
        changed = jumped.filter(F.col("lbl") != F.col("old_lbl")).count()
        labels = jumped.select("node", "lbl")
        if changed == 0:
            return labels.select("node", F.col("lbl").alias("cluster_id"))
    raise RuntimeError("no converge")


def run_query(spark, fused: bool) -> float:
    t0 = time.perf_counter()
    li = load_table(spark, "lineitem", SF_DIR).filter(
        (F.col("l_quantity") >= 49.5) & (F.col("l_discount") >= 0.09)
    )
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") + F.lit(100000000)).alias("dst"),
    )
    labels = cc_loop(edges, fused)
    off = F.lit(100000000)
    out = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.when(F.col("node") < off, 1).otherwise(0)).alias("n_suppliers"),
        F.sum(F.when(F.col("node") >= off, 1).otherwise(0)).alias("n_parts"),
    )
    out.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return dt


def main():
    spark = get_spark("ab-cc-fused")
    # warm-up both paths once (not timed)
    run_query(spark, False)
    run_query(spark, True)
    a, b = [], []
    for i in range(4):
        a.append(run_query(spark, False))
        b.append(run_query(spark, True))
    print("eager=True (2 jobs/round):", [round(x, 3) for x in a],
          "min", round(min(a), 3), "med", round(statistics.median(a), 3))
    print("fused eager=False (1 job/round):", [round(x, 3) for x in b],
          "min", round(min(b), 3), "med", round(statistics.median(b), 3))
    spark.stop()


if __name__ == "__main__":
    main()
