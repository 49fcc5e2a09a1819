"""Prove the NON-broadcast rescore-join shape (round-11 judge item 2).

``adaptive_broadcast`` gates the rescore-join hint on the counted
vector rows (``sim_ops.BROADCAST_MAX_ROWS``, default 100k — the single
source of truth): under the gate the full vector
table is broadcast (correct at gate scales), above it the join falls
back to a co-partitioned shuffle join (the only shape that survives
100 TB — a broadcast vector table there is a hard executor OOM, not a
slow plan). The gate itself is unit-tested; this script proves the
FALLBACK SHAPE on real data: it runs each heavy consumer at the
sf10fresh control (200k vectors) twice in one session — hint allowed
vs hint forced off via SPARK_GRAFT_BCAST_MAX_ROWS=0 (read per call) —
and requires the collected outputs to be IDENTICAL row-for-row (the
hint may only change the physical join strategy, never a value),
recording both wall times.

Usage: python tools/bcast_shape_check.py [sf_dir] [query ...]
Defaults: .scaledata/sf10fresh, dbscan_core_border_noise semdedup_prune.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quantum_rag_data_pipeline_spark.queries import QUERIES
from quantum_rag_data_pipeline_spark.session import get_spark

DEFAULT_QUERIES = ["dbscan_core_border_noise", "semdedup_prune"]


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaledata", "sf10fresh")
    names = argv[1:] or DEFAULT_QUERIES
    spark = get_spark(app_name="bcast_shape_check")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    failed = False
    for name in names:
        fn = QUERIES[name]
        row = {}
        outs = {}
        # force the hint ON for the broadcast phase (after round 11 the
        # default gate is 100k rows, under the 200k control — unsetting
        # the env var would measure shuffle vs shuffle)
        for label, env in (("broadcast", str(1 << 40)), ("shuffle", "0")):
            os.environ["SPARK_GRAFT_BCAST_MAX_ROWS"] = env
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            row[label] = round(time.perf_counter() - t0, 2)
            outs[label] = sorted(tuple(r) for r in rows)
        os.environ.pop("SPARK_GRAFT_BCAST_MAX_ROWS", None)
        row["identical"] = outs["broadcast"] == outs["shuffle"]
        row["rows"] = len(outs["broadcast"])
        failed = failed or not row["identical"]
        results[name] = row
        print(f"{name}: broadcast={row['broadcast']}s "
              f"shuffle={row['shuffle']}s rows={row['rows']} "
              f"identical={row['identical']}", flush=True)
    print(json.dumps(results))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
