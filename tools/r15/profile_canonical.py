"""Round-15 item 1: profile dedup_pipeline_canonical INSIDE a bench-like
context (VERDICT r14: the query reads 2.4 s isolated but 6.5-7.2 s in
full benches and anti-scales 0.63 at 8-vs-32 cores; isolated triage
cannot see the mechanism).

Reproduces the bench harness shape — same session semantics, same
warm-ups, the SAME HEADLINE prefix (queries 0..N-1 in this round's
rotation order, single run each, every-8th-query GC hygiene) — then runs
dedup_pipeline_canonical exactly like bench (clearCache + min-of-2 noop)
with PHASE timing (query-fn construction incl. the CC count/collect vs
the noop write) and dumps the per-stage wall/task breakdown from the UI
REST API for the canonical runs.

    SPARK_GRAFT_CPUS=32 python tools/r15/profile_canonical.py [n_prefix]

n_prefix defaults to the query's full rotation prefix (everything before
it in HEADLINE order); pass 0 for an isolated control in the same tool.
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
TARGET = "dedup_pipeline_canonical"


def rest(app_id: str, path: str):
    url = f"http://localhost:4040/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    names = list(QUERIES)
    target_pos = names.index(TARGET)
    n_prefix = int(sys.argv[1]) if len(sys.argv) > 1 else target_pos
    prefix = names[:target_pos][-n_prefix:] if n_prefix else []

    spark = get_spark("profile-canonical", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "5000",
        "spark.ui.retainedJobs": "5000",
    })
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    # bench warm-ups (JVM + python workers + streaming engine)
    QUERIES["j2_join_agg"](spark, SF_DIR).write.mode("overwrite").format("noop").save()

    def _py_warm(it):
        import numpy  # noqa: F401
        for pdf in it:
            yield pdf

    spark.range(0, 32, 1, 32).mapInPandas(_py_warm, "id long") \
        .write.mode("overwrite").format("noop").save()
    import bench as bench_mod
    bench_mod.warm_streaming(spark)

    t_ctx = time.perf_counter()
    done = 0
    for name in prefix:
        spark.catalog.clearCache()
        try:
            QUERIES[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        except Exception as exc:  # noqa: BLE001
            print(f"prefix {name} failed: {exc}", file=sys.stderr)
        done += 1
        if done % 8 == 0:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(1.5)
    print(f"context: ran {done} prefix queries in "
          f"{time.perf_counter() - t_ctx:.1f} s")

    stages_before = {s["stageId"] for s in rest(app_id, "stages")}
    runs = []
    for i in range(2):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"canonical run {i}")
        t0 = time.perf_counter()
        df = QUERIES[TARGET](spark, SF_DIR)   # pairs lineage + CC count/collect
        t1 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        t2 = time.perf_counter()
        spark.sparkContext.setJobDescription(None)
        runs.append({"construct_s": round(t1 - t0, 3),
                     "write_s": round(t2 - t1, 3),
                     "total_s": round(t2 - t0, 3)})
        print(f"run {i}: construct {t1-t0:.3f} s  write {t2-t1:.3f} s  "
              f"total {t2-t0:.3f} s")

    time.sleep(1.0)
    new_stages = [s for s in rest(app_id, "stages")
                  if s["stageId"] not in stages_before]
    new_stages.sort(key=lambda s: s.get("executorRunTime", 0), reverse=True)
    print(f"\n{len(new_stages)} stages during the canonical runs "
          f"(sorted by executorRunTime):")
    tot_run = tot_wall = 0
    for s in new_stages:
        sub = s.get("submissionTime", "")
        first = s.get("firstTaskLaunchedTime", "")
        comp = s.get("completionTime", "")
        def ms(a, b):
            from datetime import datetime
            try:
                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                return (datetime.strptime(b.replace("GMT", ""), fmt.replace("%Z", ""))
                        - datetime.strptime(a.replace("GMT", ""), fmt.replace("%Z", ""))
                        ).total_seconds()
            except Exception:  # noqa: BLE001
                return -1
        wall = ms(sub, comp)
        tot_run += s.get("executorRunTime", 0)
        if wall > 0:
            tot_wall += wall
        print(f"  stage {s['stageId']:>5} tasks={s['numCompleteTasks']:>4} "
              f"runTime={s.get('executorRunTime',0):>7}ms "
              f"cpuTime={int(s.get('executorCpuTime',0)/1e6):>7}ms "
              f"wall={wall:7.3f}s gc={s.get('jvmGcTime',0):>5}ms "
              f"sched_delay~ {s.get('schedulerDelay','-')} "
              f"| {s.get('description') or s.get('name','')[:80]}")
    print(f"\nsum executorRunTime {tot_run/1000:.2f} s (across tasks), "
          f"sum stage wall {tot_wall:.2f} s")
    print(json.dumps({"runs": runs, "n_prefix": n_prefix,
                      "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*")}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
