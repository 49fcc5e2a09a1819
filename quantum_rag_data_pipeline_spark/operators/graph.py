"""Distributed connected components — the clustering step of a dedup
pipeline (near-dup PAIRS -> duplicate CLUSTERS -> one canonical doc per
cluster).

Algorithm: iterative min-label propagation with pointer jumping
(``hash-to-min`` family; cf. Kiveris et al., "Connected Components in
MapReduce and Beyond"). Each round does

  1. neighbor-min: every node adopts the smallest label in its closed
     neighborhood (one shuffle on node id, map-side combinable), then
  2. pointer jump: every node re-reads its label's OWN label
     (``L(v) <- L(L(v))``, a self-join on label), which doubles the
     propagation distance per round.

The jump step turns the O(diameter) naive propagation into O(log d)
rounds — a 10^6-hop chain resolves in ~20 rounds. At cluster scale each
round is two hash shuffles over (node, label) longs — no strings, no
vectors. ``localCheckpoint`` truncates the growing lineage each round
(on a real cluster with an unreliable executor pool, swap for
``checkpoint()`` to the cluster FS); convergence is detected with a
changed-label count, the same driver-side loop GraphX/GraphFrames use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the minimum
    node id of its connected component.

    Returns (node, cluster_id). Raises if ``max_iter`` rounds don't
    converge (pointer jumping makes that ~2^25 effective hops).
    """
    e = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # materialize the symmetrized edge list ONCE: every round joins against
    # it, and without this each iteration re-runs scan + distinct + union
    # (measured 2x the whole query's wall at sf0.1). localCheckpoint also
    # truncates lineage so round N's plan doesn't embed rounds 0..N-1.
    sym = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node")).distinct().withColumn("lbl", F.col("node"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.select(F.col("node").alias("v"), "lbl"), "v")
            .groupBy("u")
            .agg(F.min("lbl").alias("nbr_lbl"))
            .select(F.col("u").alias("node"), "nbr_lbl")
        )
        # carry the pre-round label through so convergence is a filter on
        # the checkpointed frame, not another join against the old labels
        cand = labels.join(nbr_min, "node", "left").select(
            "node",
            F.col("lbl").alias("old_lbl"),
            F.least("lbl", F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
        )
        parent = cand.select(F.col("node").alias("p_node"), F.col("lbl").alias("p_lbl"))
        jumped = (
            cand.join(parent, cand["lbl"] == parent["p_node"], "left")
            .select("node", "old_lbl", F.coalesce("p_lbl", "lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = jumped.filter(F.col("lbl") != F.col("old_lbl")).count()
        labels = jumped.select("node", "lbl")
        if changed == 0:
            return labels.select("node", F.col("lbl").alias("cluster_id"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Near-dup pairs -> (node, cluster_id) with cluster_id = min doc id of
    the transitive-closure cluster. Feed any of the pair generators
    (exact/ngram/minhash/simhash/embedding) straight in."""
    return connected_components(pairs, src=id_a, dst=id_b)


def pagerank(
    edges: DataFrame,
    n_iter: int = 2,
    alpha: float = 0.85,
    src: str = "u",
    dst: str = "v",
    grid: int = 12,
) -> DataFrame:
    """PageRank over an UNDIRECTED edge list (each edge contributes mass
    both ways), fixed ``n_iter`` power iterations — the standard
    iterative-graph shape on Spark: per round one shuffle groupBy on the
    destination node; the rank frame is localCheckpointed each round so
    lineage stays flat (the classic iterative-DataFrame pitfall is an
    exponentially deep plan).

    Determinism contract: neighbor contributions are rounded to a
    ``grid``-decimal DECIMAL before the sum, so cross-partition float
    accumulation order can't change the answer — same device as the
    k-means M-step — and a SQL oracle replays the iteration exactly.
    No dangling-node term: an undirected edge list gives every node
    out-degree ≥ 1 by construction.

    Returns (node, pr) with pr on the decimal grid as DOUBLE."""
    both = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).unionAll(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("t"))
    ).localCheckpoint(eager=False)
    deg = both.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    nodes = deg.select(F.col("s").alias("node"), "d")
    n_nodes = nodes.count()  # one scalar job; the loop itself stays lazy
    pr = nodes.select(
        "node", "d", F.round(F.lit(1.0 / n_nodes), grid).alias("pr")
    )
    dec = f"decimal(28,{grid})"
    for _ in range(n_iter):
        contrib = both.join(
            pr.select(F.col("node").alias("s"), "d", "pr"), "s"
        ).select(
            F.col("t").alias("node"),
            F.round(F.col("pr") / F.col("d"), grid).cast(dec).alias("c"),
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("mass"))
        pr = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                "d",
                F.round(
                    (1.0 - alpha) / n_nodes
                    + alpha * F.coalesce(F.col("mass").cast("double"), F.lit(0.0)),
                    grid,
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr.select("node", "pr")
