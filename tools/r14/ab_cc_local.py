"""Round-14 A/B: size-gated driver union-find vs distributed CC loop.

Alternates SPARK_GRAFT_CC_LOCAL_MAX_EDGES between the default (200k —
local path at sf0.1) and 0 (force the distributed pointer-jump loop)
WITHIN one session, on the two CC-bound bench queries. Result equality
is pinned first (full collected rows compared).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from quantum_rag_data_pipeline_spark.queries import QUERIES  # noqa: E402
from quantum_rag_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = ["graph_connected_components", "dedup_pipeline_canonical"]


def main() -> None:
    spark = get_spark("ab-cc-local")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, local: bool) -> float:
        os.environ["SPARK_GRAFT_CC_LOCAL_MAX_EDGES"] = "200000" if local else "0"
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in NAMES:
        os.environ["SPARK_GRAFT_CC_LOCAL_MAX_EDGES"] = "200000"
        spark.catalog.clearCache()
        a = sorted(map(tuple, QUERIES[name](spark, SF_DIR).collect()))
        os.environ["SPARK_GRAFT_CC_LOCAL_MAX_EDGES"] = "0"
        spark.catalog.clearCache()
        b = sorted(map(tuple, QUERIES[name](spark, SF_DIR).collect()))
        assert a == b, f"{name}: local vs distributed rows differ!"
        print(f"{name}: identical rows ({len(a)})")

    for name in NAMES:
        run(name, True); run(name, False)  # warm both paths
        tl, td = [], []
        for _ in range(4):
            tl.append(run(name, True))
            td.append(run(name, False))
        print(f"{name}: local  min {min(tl):.3f} med {statistics.median(tl):.3f} {[round(x,3) for x in tl]}")
        print(f"{name}: dist   min {min(td):.3f} med {statistics.median(td):.3f} {[round(x,3) for x in td]}")
    spark.stop()


if __name__ == "__main__":
    main()
