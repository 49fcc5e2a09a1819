"""Round-14 A/B: connected_components' sym-edge checkpoint eager vs lazy
(the size-gate count materializes the blocks either way — eager pays one
extra job submission per invocation). Alternating min-of-N in one
session; arms toggled by monkeypatching the eager flag back in.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from quantum_rag_data_pipeline_spark.queries import QUERIES  # noqa: E402
from quantum_rag_data_pipeline_spark.session import get_spark  # noqa: E402
from quantum_rag_data_pipeline_spark.operators import graph as graph_ops  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = ["graph_connected_components", "dedup_pipeline_canonical"]

_orig_ckpt = DataFrame.localCheckpoint
_FORCE_EAGER = False


def _patched(self, eager=True):
    return _orig_ckpt(self, eager=True if _FORCE_EAGER else eager)


def run(spark, name: str, eager: bool) -> tuple[float, int]:
    global _FORCE_EAGER
    _FORCE_EAGER = eager
    st = spark.sparkContext.statusTracker()
    j0 = len(st.getJobIdsForGroup() or [])
    t0 = time.perf_counter()
    df = QUERIES[name](spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    j1 = len(st.getJobIdsForGroup() or [])
    spark.catalog.clearCache()
    return dt, j1 - j0


def main() -> int:
    runs = int(os.environ.get("AB_RUNS", "4"))
    DataFrame.localCheckpoint = _patched
    spark = get_spark("ab-cc-sym-lazy")
    spark.sparkContext.setLogLevel("ERROR")
    for name in NAMES:
        run(spark, name, True)  # warm
        eager, lazy, je, jl = [], [], set(), set()
        for _ in range(runs):
            d, j = run(spark, name, True)
            eager.append(d); je.add(j)
            d, j = run(spark, name, False)
            lazy.append(d); jl.add(j)
        print(f"{name}: eager min {min(eager):.3f} med {sorted(eager)[len(eager)//2]:.3f} jobs {sorted(je)}"
              f" | lazy min {min(lazy):.3f} med {sorted(lazy)[len(lazy)//2]:.3f} jobs {sorted(jl)}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
