"""Round-14 A/B: AQE SortMergeJoin -> ShuffledHashJoin runtime rewrite
(spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold) over the 20
queries whose plans contain SMJ. Toggled per run inside ONE session so
era noise cancels; min-of-N per arm, alternating.
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
THRESH = os.environ.get("AB_SHJ_THRESHOLD", str(64 * 1024 * 1024))

NAMES = [
    "mrl_truncation_recall", "rocchio_relevance_feedback",
    "heaps_law_vocab_growth", "recsys_coverage_diversity",
    "item_debut_velocity", "semi_anti_join", "hybrid_rrf_fusion",
    "semdedup_prune", "snapshot_diff_cdc", "sq_int8_recall",
    "cross_source_contamination", "join_strategy_parity",
    "bfs_levels_copurchase", "curation_funnel_report",
    "incremental_agg_maintenance", "bucketed_join_no_shuffle",
    "kendall_tau_blocked", "modularity_by_brand",
    "burrows_delta_stylometry", "forecast_reconciliation",
]

KEY = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"


def run(spark, name: str, on: bool) -> float:
    spark.conf.set(KEY, THRESH if on else "0")
    t0 = time.perf_counter()
    df = QUERIES[name](spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return dt


def main() -> int:
    runs = int(os.environ.get("AB_RUNS", "3"))
    spark = get_spark("ab-shj")
    spark.sparkContext.setLogLevel("ERROR")
    tot_off = tot_on = 0.0
    print(f"{'query':34s} {'off_min':>8} {'on_min':>8} {'delta':>7}")
    for name in NAMES:
        run(spark, name, False)  # warm (builds landings/artifacts once)
        off, on = [], []
        for _ in range(runs):
            off.append(run(spark, name, False))
            on.append(run(spark, name, True))
        mo, mn = min(off), min(on)
        tot_off += mo
        tot_on += mn
        print(f"{name:34s} {mo:8.3f} {mn:8.3f} {mn-mo:+7.3f}")
    print(f"{'TOTAL':34s} {tot_off:8.3f} {tot_on:8.3f} {tot_on-tot_off:+7.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
