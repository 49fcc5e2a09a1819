"""Round-14 A/B: knn_graph_incremental side-count fusion (2 jobs -> 1).

Times the full knn_graph_incremental_parity query shape (noop sink) and
reports Spark job count per execution plus wall stats. Run once at HEAD
(fused) and once with the similarity.py edit stashed (two .count()
jobs); job counts are deterministic, wall is min-of-N.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from quantum_rag_data_pipeline_spark.queries import QUERIES  # noqa: E402
from quantum_rag_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("ab-knn-counts")
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES["knn_graph_incremental_parity"]
    tracker = spark.sparkContext.statusTracker()

    def once() -> tuple[float, int]:
        spark.catalog.clearCache()
        j0 = len(tracker.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        j1 = len(tracker.getJobIdsForGroup(None))
        return dt, j1 - j0

    once()  # warm
    walls, jobs = [], None
    for _ in range(6):
        dt, nj = once()
        walls.append(dt)
        jobs = nj
    print(f"jobs/run {jobs}  min {min(walls):.3f}  med {statistics.median(walls):.3f}  "
          f"{[round(w, 3) for w in walls]}")
    spark.stop()


if __name__ == "__main__":
    main()
