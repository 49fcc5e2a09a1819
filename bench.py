"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with the noop sink (full compute, no driver
collect), timed after a session warm-up so JVM startup isn't billed to
the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quantum_rag_data_pipeline_spark.queries import QUERIES
from quantum_rag_data_pipeline_spark.session import get_spark

HEADLINE = [
    "a1_metric_catalog",
    "p2_permissive_json_cast",
    "w1_sliding_window",
    "j2_join_agg",
    "star_join_revenue",
    "j1_pivot",
    "a3_pivot_rowmean",
    "a5_first_per_group",
    "topk_customers_by_revenue",
    "distinct_counts",
    "rollup_region_nation",
    "set_ops_custkeys",
    "f_date_functions",
    "u2_sentence_serialization",
    "text_stats_by_source",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_brute_force_topk",
    "ann_lsh_topk",
    "embedding_near_dup",
    "rank_lag_lead",
    "cube_flag_status",
    "semi_anti_join",
    "asof_click_attribution",
    "range_join_clicks_before_purchase",
    "sessionization",
    "text_lang_id_confusion",
    "text_quality_metrics",
    "bpe_token_budget",
    "percentiles_by_segment",
    "sql_grouping_sets",
    "multimodal_features",
    "streaming_sliding_window",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footer reads, not billed to any query
    QUERIES["j2_join_agg"](spark, sf_dir).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
