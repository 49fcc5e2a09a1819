"""Round-14 plan survey: per-query counts of join strategies, exchanges
and Python stages at the bench scale (sf0.1), dumped as JSON for
optimization targeting.

    python tools/r14/plan_survey.py [out.json] [--conf k=v ...]
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from quantum_rag_data_pipeline_spark.queries import QUERIES  # noqa: E402
from quantum_rag_data_pipeline_spark.session import get_spark  # noqa: E402

SKIP = {"streaming_sliding_window", "streaming_sessionization",
        "streaming_static_enrich", "streaming_dedup_exactly_once",
        "streaming_watermark_append_semantics", "streaming_stateful_key_counts"}

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PATTERNS = {
    "smj": r"SortMergeJoin",
    "shj": r"ShuffledHashJoin",
    "bhj": r"BroadcastHashJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
    "cartesian": r"CartesianProduct",
    "exchange": r"Exchange (hash|range|SinglePartition|rangepartitioning)",
    "rr_exchange": r"Exchange RoundRobinPartitioning",
    "sort": r"\bSort \[",
    "py": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|BatchEvalPython",
    "window": r"\bWindow\b",
    "wsc": r"WholeStageCodegen",
}


def main() -> int:
    out_path = None
    extra = {}
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--conf":
            k, v = args[i + 1].split("=", 1)
            extra[k] = v
            i += 2
        else:
            out_path = args[i]
            i += 1
    spark = get_spark(app_name="plan-survey", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    res = {}
    for name, fn in QUERIES.items():
        if name in SKIP:
            continue
        spark.catalog.clearCache()
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            res[name] = {"error": str(exc)[:200]}
            continue
        res[name] = {k: len(re.findall(p, plan)) for k, p in PATTERNS.items()}
    spark.stop()
    agg = {}
    for k in PATTERNS:
        agg[k] = sum(v.get(k, 0) for v in res.values())
    print(json.dumps(agg, indent=1))
    smj_queries = sorted((n for n, v in res.items() if v.get("smj")),
                         key=lambda n: -res[n]["smj"])
    print("queries with SMJ:", len(smj_queries))
    for n in smj_queries[:25]:
        print(f"  {res[n]['smj']:2d}  {n}")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1, sort_keys=True)
        print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
