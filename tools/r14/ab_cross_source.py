"""Round-14 A/B: cross_source_contamination pair generation.

OLD: (source, shingle) distinct -> cache -> self-join on shingle ->
     filter a<b -> groupBy pair count          (4 shuffles + cache)
NEW: groupBy(shingle).agg(sort_array(collect_set(source))) -> explode
     ordered pairs (i<j within the sorted set) -> groupBy pair count
     (2 shuffles, no cache; collect_set subsumes the distinct; set size
     is bounded by max_df=64, so no skew risk)

Rows identical: one row per distinct (source, shingle) either way, pair
(a<b) counted once per shingle where both sources occur.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from quantum_rag_data_pipeline_spark.operators import dedup as dedup_ops  # noqa: E402
from quantum_rag_data_pipeline_spark.session import get_spark  # noqa: E402
from quantum_rag_data_pipeline_spark.sources.registry import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_shape(spark):
    d = load_table(spark, "documents", SF_DIR)
    idx = dedup_ops.shingle_index(d, n=5, max_df=64)
    sfp = (
        idx.join(d.select("doc_id", "source"), "doc_id")
        .select("source", "shingle")
        .distinct()
        .cache()
    )
    a = sfp.select(F.col("source").alias("src_a"), "shingle")
    b = sfp.select(F.col("source").alias("src_b"), "shingle")
    return (
        a.join(b, "shingle")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_shingles"))
    )


def new_shape(spark):
    d = load_table(spark, "documents", SF_DIR)
    idx = dedup_ops.shingle_index(d, n=5, max_df=64)
    srcs = (
        idx.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
    )
    pairs = srcs.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ss",
                    lambda a, i: F.transform(
                        F.slice(F.col("ss"), i + 2, F.size(F.col("ss"))),
                        lambda b: F.struct(a.alias("src_a"), b.alias("src_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.groupBy(
        F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("shared_shingles"))


def main() -> None:
    spark = get_spark("ab-cross-source")
    spark.sparkContext.setLogLevel("ERROR")
    spark.catalog.clearCache()
    a = sorted(map(tuple, old_shape(spark).collect()))
    spark.catalog.clearCache()
    b = sorted(map(tuple, new_shape(spark).collect()))
    assert a == b, f"shapes differ! old {a[:3]} new {b[:3]}"
    print(f"identical rows ({len(a)})")

    def run(fn):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run(old_shape); run(new_shape)
    to, tn = [], []
    for _ in range(4):
        to.append(run(old_shape))
        tn.append(run(new_shape))
    print(f"old: min {min(to):.3f} med {statistics.median(to):.3f} {[round(x,3) for x in to]}")
    print(f"new: min {min(tn):.3f} med {statistics.median(tn):.3f} {[round(x,3) for x in tn]}")
    spark.stop()


if __name__ == "__main__":
    main()
