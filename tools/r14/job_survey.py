"""Round-14 survey: Spark jobs + wall per query (noop sink, warm 2nd run).

A declarative single-action query should cost exactly 1 job (plus any
AQE re-optimization sub-jobs Spark counts). Queries with job counts far
above their plan's needs are paying driver-side actions (counts for
config, iterative rounds, artifact builds) — each worth an explicit
look. Job counts are deterministic under host throttling; wall is
min-of-2 and only indicative.

    python tools/r14/job_survey.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from quantum_rag_data_pipeline_spark.queries import QUERIES  # noqa: E402
from quantum_rag_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark(app_name="job-survey")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    res = {}
    for name, fn in QUERIES.items():
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"survey:{name}")
        try:
            walls = []
            jobs = None
            for _ in range(2):
                spark.catalog.clearCache()
                j0 = len(tracker.getJobIdsForGroup(None))
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                walls.append(time.perf_counter() - t0)
                jobs = len(tracker.getJobIdsForGroup(None)) - j0
            res[name] = {"jobs": jobs, "wall": round(min(walls), 3)}
        except Exception as exc:  # noqa: BLE001
            res[name] = {"error": str(exc)[:200]}
        finally:
            spark.sparkContext.setJobDescription(None)
    spark.stop()
    ranked = sorted(
        (v["jobs"], v["wall"], n) for n, v in res.items() if "jobs" in v
    )
    print("highest job counts:")
    for j, w, n in ranked[-25:][::-1]:
        print(f"  jobs {j:3d}  wall {w:7.3f}  {n}")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1, sort_keys=True)
        print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
