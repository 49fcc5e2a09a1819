"""Round-15 survey: find post-shuffle stages that AQE coalesced to a
handful of tasks while they carry real CPU (the kendall_tau_blocked
signature — bytes-based coalescing starving a compute-heavy stage,
guide §2.5).

Runs each named query twice (min-of-2 like the bench) with the UI on,
then flags stages with numTasks <= threshold, shuffleRead > 0 and
executorCpuTime per task >= 200 ms.

    python tools/r15/starve_survey.py query1 query2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from quantum_rag_data_pipeline_spark.queries import QUERIES  # noqa: E402
from quantum_rag_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    names = sys.argv[1:]
    spark = get_spark("starve-survey", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "8000",
    })
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    def _py_warm(it):
        import numpy  # noqa: F401
        for pdf in it:
            yield pdf

    spark.range(0, 32, 1, 32).mapInPandas(_py_warm, "id long") \
        .write.mode("overwrite").format("noop").save()

    def rest(path):
        url = f"http://localhost:4040/api/v1/applications/{app_id}/{path}"
        with urllib.request.urlopen(url, timeout=10) as r:
            return json.loads(r.read())

    for name in names:
        base = {s["stageId"] for s in rest("stages")}
        best = 1e9
        try:
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                QUERIES[name](spark, SF_DIR).write.mode("overwrite") \
                    .format("noop").save()
                best = min(best, time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {exc}")
            continue
        time.sleep(0.3)
        flagged = []
        for s in rest("stages"):
            if s["stageId"] in base or s.get("status") != "COMPLETE":
                continue
            tasks = s.get("numCompleteTasks", 0)
            cpu_ms = int(s.get("executorCpuTime", 0) / 1e6)
            if (0 < tasks <= 4 and s.get("shuffleReadBytes", 0) > 0
                    and cpu_ms / max(tasks, 1) >= 200):
                flagged.append((s["stageId"], tasks, cpu_ms,
                                s.get("shuffleReadBytes", 0) >> 10))
        tag = " ".join(f"[stage {i}: {t} tasks, {c}ms cpu, {k}K shR]"
                       for i, t, c, k in flagged) or "-"
        print(f"{name}: min {best:.2f} s  starved: {tag}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
