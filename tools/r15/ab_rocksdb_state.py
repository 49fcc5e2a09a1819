"""Round-15 A/B (VERDICT item 4): RocksDB state-store provider (+
changelog checkpointing) vs the default HDFS-backed provider for the
stream-stream outer join drain (guide §5 — state-store-commit-bound per
the r12/13 profiles).

The provider is a per-query conf read at stream start, so arms toggle
``spark.sql.streaming.stateStore.providerClass`` around the full
streaming_outer_join_null_emission query shape (oracle-pinned rows
compared across arms first).

    python tools/r15/ab_rocksdb_state.py [n_reps] [query ...]
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
ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
HDFS = ("org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider")
PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
CHANGELOG_KEY = ("spark.sql.streaming.stateStore.rocksdb."
                 "changelogCheckpointing.enabled")


def set_arm(spark, arm: str) -> None:
    if arm == "rocks":
        spark.conf.set(PROVIDER_KEY, ROCKS)
        spark.conf.set(CHANGELOG_KEY, "true")
    else:
        spark.conf.set(PROVIDER_KEY, HDFS)
        spark.conf.set(CHANGELOG_KEY, "false")


def main() -> int:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    targets = sys.argv[2:] or ["streaming_outer_join_null_emission"]
    spark = get_spark("ab-rocksdb")
    spark.sparkContext.setLogLevel("ERROR")
    import bench as bench_mod
    bench_mod.warm_streaming(spark)

    for q in targets:
        set_arm(spark, "hdfs")
        a = sorted(tuple(r) for r in QUERIES[q](spark, SF_DIR).collect())
        set_arm(spark, "rocks")
        b = sorted(tuple(r) for r in QUERIES[q](spark, SF_DIR).collect())
        assert a == b and len(b) > 0, f"{q}: rows differ across providers"
        print(f"{q}: equality pinned ({len(b)} rows)")

    times: dict[str, list[float]] = {"hdfs": [], "rocks": []}
    for i in range(n_reps):
        for arm in ("hdfs", "rocks"):
            set_arm(spark, arm)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            for q in targets:
                QUERIES[q](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            times[arm].append(time.perf_counter() - t0)
            print(f"rep {i} {arm}: {times[arm][-1]:.3f} s", flush=True)
    set_arm(spark, "hdfs")
    for arm in ("hdfs", "rocks"):
        ts = sorted(times[arm])
        print(f"{arm}: min {ts[0]:.3f} med {ts[len(ts)//2]:.3f} all "
              f"{[round(t,3) for t in times[arm]]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
