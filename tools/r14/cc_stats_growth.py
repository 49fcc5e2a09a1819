"""Round-14 probe: catalyst sizeInBytes blow-up in the CC loop.

The pointer-jump self-join SQUARES the logical plan's sizeInBytes every
round (SizeInBytesOnlyStatsPlanVisitor.visitJoin multiplies child
sizes), and Dataset.localCheckpoint's rewriteStatsAndConstraints
re-computes stats over that plan — so the driver multiplies BigIntegers
whose digit count DOUBLES per round. Invisible at sf0.1 (7 rounds);
fatal at jumps>=2 (digits x4-x8/round — the ab_cc_jumps A/B ground for
19 min inside BigInteger.multiplyToomCook3) and material at high round
counts (long-diameter graphs).

This probe runs the committed loop shape on a PATH graph of n nodes
(rounds ~ log2 n) and records, per round: wall seconds and the
checkpointed plan's stats bitLength. Optionally applies the candidate
guard — every K rounds spill labels to scratch parquet and re-read
(fresh file-size stats) — to show growth resets.

    python tools/r14/cc_stats_growth.py <n_nodes> [reset_every]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.set_int_max_str_digits(2_000_000_000)

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from quantum_rag_data_pipeline_spark.session import get_spark  # noqa: E402


def bitlen(df) -> int:
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    return int(stats.sizeInBytes()).bit_length()


def run(spark, n: int, reset_every: int | None) -> None:
    scratch = tempfile.mkdtemp(prefix="cc_stats_probe_")
    e = spark.range(n - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).localCheckpoint(
        eager=True
    )
    labels = (
        sym.select(F.col("u").alias("node")).distinct().withColumn("lbl", F.col("node"))
    ).localCheckpoint(eager=True)
    t_all = time.perf_counter()
    for rnd in range(1, 40):
        t0 = time.perf_counter()
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
            .localCheckpoint(eager=False)
        )
        changed = jumped.filter(F.col("lbl") != F.col("old_lbl")).count()
        labels = jumped.select("node", "lbl")
        if reset_every and rnd % reset_every == 0:
            p = os.path.join(scratch, f"r{rnd}")
            labels.write.mode("overwrite").parquet(p)
            labels = spark.read.parquet(p)
        dt = time.perf_counter() - t0
        print(f"round {rnd:2d}  wall {dt:7.3f}s  stats_bits {bitlen(labels):>12,}  "
              f"changed {changed}", flush=True)
        if changed == 0:
            break
    print(f"TOTAL {time.perf_counter() - t_all:.2f}s  n={n} reset_every={reset_every}")
    n_comp = labels.select("lbl").distinct().count()
    print(f"components: {n_comp} (expect 1)")
    shutil.rmtree(scratch, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
    reset = int(sys.argv[2]) if len(sys.argv) > 2 else None
    spark = get_spark("cc-stats-probe")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, n, reset or None)
    spark.stop()


if __name__ == "__main__":
    main()
