"""Distributed connected components over an edge DataFrame.

The post-candidate-generation step of every large-scale dedup pipeline:
LSH emits candidate PAIRS, but dedup must group them into duplicate
CLUSTERS and elect one canonical document per cluster — a
connected-components problem over the candidate graph.

Algorithm: Pregel-style iterative minimum-label propagation. Every round
each node adopts the minimum component label among itself and its
neighbors; one equi-join plus one groupBy-min hash shuffle per round.
Rounds needed = graph diameter. Candidate graphs built as STAR edges per
LSH bucket (every member points at the bucket minimum — linear in bucket
size, never the quadratic clique) keep the diameter tiny: a chain of k
overlapping buckets has diameter <= k, and real near-dup clusters span
very few buckets.

Scale notes:
- Each round's frame is ``localCheckpoint``-ed to truncate lineage —
  without it round N re-executes all rounds < N and the plan grows
  exponentially. On a real cluster swap for a reliable
  ``checkpoint(dir)``; the call site is the only change.
- Convergence is detected with one scalar count per round (the only
  driver-side work; no per-row driver loop, matching how GraphX/Pregel
  drive supersteps).
- For adversarial high-diameter graphs the published alternative is
  alternating large-star/small-star (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14), which converges in
  O(log^2 n) rounds of the same join+groupBy shape; LSH candidate graphs
  never need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(node, comp) for every node appearing in ``edges`` (either
    endpoint, self-loops included); ``comp`` is the minimum node id in
    the node's connected component under the id type's natural ordering
    (ints numerically, strings lexicographically — no cast is forced on
    the caller's key type). Undirected: edges are symmetrized
    internally. The returned frame is localCheckpoint-backed and owned
    by the caller. Raises if ``max_iter`` rounds don't converge
    (diameter larger than max_iter)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # nodes from BOTH endpoints of the raw edge list, so isolated
    # self-loop nodes still appear in the result
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = nodes.withColumn("comp", F.col("node")).localCheckpoint(eager=False)
    try:
        for _ in range(max_iter):
            msgs = sym.join(labels, sym["src"] == labels["node"]).select(
                F.col("dst").alias("node"), F.col("comp")
            )
            new = (
                labels.select("node", "comp")
                .union(msgs)
                .groupBy("node")
                .agg(F.min("comp").alias("comp"))
                .localCheckpoint(eager=True)  # truncate lineage; materializes
            )
            changed = (
                new.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .count()
            )
            old = labels
            labels = new
            old.unpersist(blocking=False)
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "graph diameter exceeds max_iter (raise it, or use star-contraction)"
        )
    finally:
        sym.unpersist(blocking=False)
