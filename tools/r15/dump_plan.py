"""Dump .explain('formatted') for named queries to plans/r15/<name>_<tag>.txt.

    python tools/r15/dump_plan.py before name1 name2 ...
    python tools/r15/dump_plan.py after  name1 name2 ...

Uses the same session semantics as the bench. For queries whose builder
executes driver-side jobs (iterative loops), the dump also costs those
jobs — acceptable, this is a diagnostic tool.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from quantum_rag_data_pipeline_spark.queries import QUERIES  # noqa: E402
from quantum_rag_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plan")
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path, f"({len(plan)} bytes)")
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
