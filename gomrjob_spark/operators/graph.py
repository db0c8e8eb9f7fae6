"""Iterative graph analytics beyond connected components.

Connected components (operators/dedup.py) covers reachability; this
module adds the other canonical iterative-graph shape — power-iteration
scoring (PageRank; Brin & Page 1998) — expressed so a SQL oracle can
replay it EXACTLY: all arithmetic is fixed-point integer (scores scaled
by ``scale``, the damping factor a rational ``damp_num/damp_den``, every
division an integer floor both engines compute identically, every sum an
order-free bigint). The classically-float iteration becomes
bit-reproducible across engines, partitionings, and reruns.

Scale shape per iteration: one equi-join of the edge list with the
(node, pr) frame on the source, one partial-aggregated shuffle keyed by
the destination, one left join back to the node set — all keyed on node
ids, no driver-side data paths, O(E) work per round. A handful of rounds
fuse into one lazy plan (for deep iteration counts, checkpoint like the
connected-components loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812


def pagerank_fixedpoint(
    edges: DataFrame,
    n_iters: int = 3,
    scale: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Exact-integer PageRank over a directed edge list (src, dst):

        pr'(u) = (scale*(den-num)) DIV den
                 + (num * Σ_{v->u} (pr(v) DIV outdeg(v))) DIV den

    starting from ``pr = scale`` for every node. The two integer DIVs
    (per-source share, damping) floor identically on Spark and DuckDB,
    and the sums are order-free bigints — so ``n_iters`` rounds produce
    bit-identical scores on any engine/partitioning, which is what puts
    an iterative float algorithm under the cross-engine hash gate.
    Nodes = every id appearing as src or dst; a node with no in-edges
    converges to the base term, and dangling nodes (no out-edges)
    simply contribute nothing (their mass is dropped, the standard
    simplification). Returns (node, pr)."""
    base = (scale * (damp_den - damp_num)) // damp_den
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    pr = nodes.select("node", F.lit(scale).cast("bigint").alias("pr"))
    for _ in range(n_iters):
        contrib = (
            edges.join(pr, edges["src"] == pr["node"])
            .join(deg, "src")
            .select(F.col("dst").alias("node"), F.expr("pr DIV deg").alias("c"))
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        pr = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damp_num} * coalesce(s, CAST(0 AS BIGINT))) DIV {damp_den}")
            )
            .cast("bigint")
            .alias("pr"),
        )
    return pr
