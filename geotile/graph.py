"""Distributed graph primitives for dedup-cluster resolution.

The reference engine has no graph surface at all (its only "graph" is
the per-cell posting list, GeoHash/common.h:58-98); this module exists
for the corpus-dedup pipeline the north rule's web-scale payload needs:
near-duplicate PAIRS (textops/simsearch) are only half the job — a
training-data pipeline must resolve pairs into CLUSTERS and keep one
canonical document per cluster.

Scale shape: connected components run over the *pair graph*, which for
dedup workloads is orders of magnitude smaller than the corpus (pairs
are the output of banded LSH candidate generation + verify, bounded by
band-bucket sizes — never all-pairs).  Each propagation round is ONE
shuffle keyed on node id; the number of rounds equals the graph
diameter, and near-dup components are near-cliques (diameter 2-4), so
the loop settles in a handful of rounds.  For adversarial long-chain
graphs the standard fix is the large-star/small-star rewrite
(O(log n) rounds); the simple min-propagation below is the right
trade-off for dedup graphs and is what runs under the q61 oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import cache


def connected_components(edges: DataFrame, src: str = "a", dst: str = "b",
                         max_iter: int = 50) -> DataFrame:
    """Resolve an undirected edge list into connected components.

    Returns one row per node incident to at least one edge:
    ``(node, cluster_id)`` where ``cluster_id`` is the MINIMUM node id
    in the component (deterministic canonical representative).  Node
    ids must be orderable (BIGINT doc ids here); self-loops are
    dropped.

    Algorithm: iterative min-label propagation.  Every round sends each
    node's current label across its edges and takes the elementwise
    minimum; labels only decrease, so a round with zero changed labels
    proves convergence.  One hash shuffle per round, both sides already
    partitioned on ``node`` after the first aggregate.
    """
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .where(F.col("u") != F.col("v")))
    e = (e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
         .distinct().persist())

    labels = (e.select(F.col("u").alias("node")).distinct()
              .withColumn("lbl", F.col("node"))
              .localCheckpoint(eager=True))

    converged = False
    for _ in range(max_iter):
        # neighbor propagation: every node offers its label across its edges
        cand = (e.withColumnRenamed("u", "node")
                .join(labels, "node")
                .select(F.col("v").alias("node"), "lbl"))
        mins = (cand.unionByName(labels)
                .groupBy("node").agg(F.min("lbl").alias("lbl")))
        # pointer doubling: jump to the label's own label (halves the
        # remaining chain length -> O(log diameter) rounds, not O(diameter))
        ptr = mins.select(F.col("node").alias("k"), F.col("lbl").alias("lbl2"))
        new = (mins.join(ptr, mins["lbl"] == ptr["k"])
               .select("node", F.least("lbl", "lbl2").alias("lbl"))
               # truncate lineage each round or plan analysis grows unboundedly;
               # on a real cluster swap for checkpoint() on reliable storage
               .localCheckpoint(eager=True))
        changed = (new.alias("n").join(labels.alias("o"), "node")
                   .where(F.col("n.lbl") != F.col("o.lbl")).count())
        labels = new
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")

    out = labels.select("node", F.col("lbl").alias("cluster_id"))
    return cache.track(out, [e])
