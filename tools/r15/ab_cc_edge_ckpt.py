"""Round-15 A/B: checkpoint the directed edge list BEFORE symmetrizing in
connected_components (guide §1.2 — don't execute the caller's edge
lineage twice).

OLD arm (inlined, the round-14 shape): sym = e.union(swap(e))
.localCheckpoint(eager=False); count; collect sym — the union's two
branches each contain the full caller lineage and 0 ReusedExchange fires,
so dedup_pipeline_canonical's candidate-join + exact-verify pipeline ran
TWICE inside the gate count.
NEW arm: the production operator (e checkpointed once, gate on n_e,
collect e only).

Equality is pinned first (label sets identical), then alternating
min-of-N on the full dedup_pipeline_canonical query shape (noop sink).

    python tools/r15/ab_cc_edge_ckpt.py [n_reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from quantum_rag_data_pipeline_spark.operators import dedup as dedup_ops  # noqa: E402
from quantum_rag_data_pipeline_spark.operators import graph as graph_ops  # noqa: E402
from quantum_rag_data_pipeline_spark.session import get_spark  # noqa: E402
from quantum_rag_data_pipeline_spark.sources.registry import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cc_old(edges: DataFrame, src="id_a", dst="id_b") -> DataFrame:
    """The round-14 connected_components small-graph path, verbatim shape:
    checkpoint AFTER the union, gate on n_sym, collect sym."""
    local_max_edges = int(os.environ.get("SPARK_GRAFT_CC_LOCAL_MAX_EDGES", "200000"))
    e = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=False)
    n_sym = sym.count()
    assert n_sym <= 2 * local_max_edges, "A/B expects the local path"
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for row in sym.collect():
        u, v = row[0], row[1]
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    rows = [(n, find(n)) for n in parent]
    return edges.sparkSession.createDataFrame(rows, "node long, cluster_id long")


def canonical(spark, arm: str) -> DataFrame:
    d = load_table(spark, "documents", SF_DIR)
    pairs = dedup_ops.ngram_jaccard_pairs(d, n=5, threshold=0.35, max_df=64)
    cc = cc_old(pairs) if arm == "old" else graph_ops.dedup_clusters(pairs)
    return cc.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id"), F.col("cluster_id").alias("canonical_id")
    )


def main() -> int:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab-cc-edge-ckpt")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up
    spark.range(10).write.mode("overwrite").format("noop").save()

    spark.catalog.clearCache()
    rows_old = {tuple(r) for r in canonical(spark, "old").collect()}
    spark.catalog.clearCache()
    rows_new = {tuple(r) for r in canonical(spark, "new").collect()}
    assert rows_old == rows_new, (
        f"label mismatch: {len(rows_old)} old vs {len(rows_new)} new")
    print(f"equality pinned: {len(rows_new)} rows identical")

    times: dict[str, list[float]] = {"old": [], "new": []}
    for i in range(n_reps):
        for arm in ("old", "new"):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            canonical(spark, arm).write.mode("overwrite").format("noop").save()
            times[arm].append(time.perf_counter() - t0)
            print(f"rep {i} {arm}: {times[arm][-1]:.3f} s", flush=True)
    for arm in ("old", "new"):
        ts = sorted(times[arm])
        print(f"{arm}: min {ts[0]:.3f} med {ts[len(ts)//2]:.3f} all "
              f"{[round(t,3) for t in times[arm]]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
