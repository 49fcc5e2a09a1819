"""Round-15 A/B: block-pair grids as JVM range plans vs pickled python
local relations (guide §4).

Arms toggle by monkeypatching similarity._block_grid: the OLD arm
rebuilds the grid with createDataFrame(list_of_tuples) (a pickled python
RDD whose broadcast build spawns python workers each execution), the NEW
arm is the committed spark.range projection. Rows pinned identical
first; then alternating min-of-N over the three block-BLAS query shapes.

    python tools/r15/ab_jvm_grid.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from quantum_rag_data_pipeline_spark.operators import similarity as sim  # noqa: E402
from quantum_rag_data_pipeline_spark.queries import QUERIES  # noqa: E402
from quantum_rag_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGETS = ["knn_graph_incremental_parity", "embedding_near_dup", "knn_graph_mutual"]

_new_grid = sim._block_grid


def _old_grid(spark, B: int, full: bool = False):
    if full:
        rows = [(x * B + y, x, y) for x in range(B) for y in range(B)]
    else:
        rows = [(x * B + y, x, y) for x in range(B) for y in range(x, B)]
    return spark.createDataFrame(rows, "pid int, bx int, by int")


def main() -> int:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab-jvm-grid")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).write.mode("overwrite").format("noop").save()

    # grid-rows parity for a few B values, both shapes
    for B in (1, 2, 5, 8):
        for full in (False, True):
            a = {tuple(r) for r in _old_grid(spark, B, full).collect()}
            b = {tuple(r) for r in _new_grid(spark, B, full).collect()}
            assert a == b, (B, full, a ^ b)
    print("grid parity pinned for B in {1,2,5,8}, both shapes")

    # result parity on the heaviest consumer
    sim._block_grid = _old_grid
    old_rows = {tuple(r) for r in QUERIES["knn_graph_incremental_parity"](spark, SF_DIR).collect()}
    spark.catalog.clearCache()
    sim._block_grid = _new_grid
    new_rows = {tuple(r) for r in QUERIES["knn_graph_incremental_parity"](spark, SF_DIR).collect()}
    spark.catalog.clearCache()
    assert old_rows == new_rows and len(new_rows) > 0
    print(f"query parity pinned: {len(new_rows)} rows identical")

    times: dict[str, list[float]] = {"old": [], "new": []}
    for i in range(n_reps):
        for arm in ("old", "new"):
            sim._block_grid = _old_grid if arm == "old" else _new_grid
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            for q in TARGETS:
                QUERIES[q](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            times[arm].append(time.perf_counter() - t0)
            print(f"rep {i} {arm}: {times[arm][-1]:.3f} s", flush=True)
    sim._block_grid = _new_grid
    for arm in ("old", "new"):
        ts = sorted(times[arm])
        print(f"{arm}: min {ts[0]:.3f} med {ts[len(ts)//2]:.3f} all "
              f"{[round(t,3) for t in times[arm]]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
