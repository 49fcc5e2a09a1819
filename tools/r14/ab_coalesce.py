"""Round-14 A/B: AQE partition coalescing tuned for size over parallelism
(guide §2.2 "fewer, larger reduce partitions" / §9 baseline advisory):

  off: session defaults (parallelismFirst=true, advisory 64m default)
  on:  spark.sql.adaptive.coalescePartitions.parallelismFirst=false
       + spark.sql.adaptive.advisoryPartitionSizeInBytes=64m

Both are runtime-settable SQL confs, toggled per run inside ONE session
(era noise cancels), min-of-N alternating over shuffle-heavy queries.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from quantum_rag_data_pipeline_spark.queries import QUERIES  # noqa: E402
from quantum_rag_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

NAMES = [
    "dedup_pipeline_canonical", "dedup_minhash_lsh",
    "dedup_shingle_containment", "knn_graph_incremental_parity",
    "association_rules_lift", "functional_dependency_profile",
    "order_totals_reconciliation", "skipgram_cooccurrence_pmi",
    "hits_hubs_authorities", "corr_matrix_lineitem",
    "higher_moments_skew_kurtosis", "graph_connected_components",
]

PF = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
ADV = "spark.sql.adaptive.advisoryPartitionSizeInBytes"


def run(spark, name: str, on: bool) -> float:
    spark.conf.set(PF, "false" if on else "true")
    spark.conf.set(ADV, "64m")
    t0 = time.perf_counter()
    df = QUERIES[name](spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return dt


def main() -> int:
    runs = int(os.environ.get("AB_RUNS", "3"))
    spark = get_spark("ab-coalesce")
    spark.sparkContext.setLogLevel("ERROR")
    tot_off = tot_on = 0.0
    print(f"{'query':34s} {'off_min':>8} {'on_min':>8} {'delta':>7}")
    for name in NAMES:
        run(spark, name, False)  # warm (artifacts/landings built once)
        off, on = [], []
        for _ in range(runs):
            off.append(run(spark, name, False))
            on.append(run(spark, name, True))
        mo, mn = min(off), min(on)
        tot_off += mo
        tot_on += mn
        print(f"{name:34s} {mo:8.3f} {mn:8.3f} {mn - mo:+7.3f}", flush=True)
    print(f"{'TOTAL':34s} {tot_off:8.3f} {tot_on:8.3f} {tot_on - tot_off:+7.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
