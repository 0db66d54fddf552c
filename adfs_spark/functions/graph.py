"""Link-graph algorithms as bounded iterative DataFrame plans.

Companion to the dedup module's connected components (pointer-jumping
label propagation): PageRank over a (src, dst) edge table — the
standard domain-authority signal web-corpus pipelines mix into quality
scores (a page linked by many high-rank domains is likelier to be
worth training on).

Scale shape: each iteration is one join (ranks ⋈ edges on src) and one
groupBy (sum contributions per dst) — two shuffles keyed by src/dst.
Iterations are a fixed constant (power iteration converges
geometrically at the damping rate), so the driver loop is bounded; per
iteration the lineage is truncated via localCheckpoint to keep plans
flat, exactly like the connected-components loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank with uniform teleport.  Returns
    (node, rank); ranks sum to the node count (the classic
    un-normalized convention: an isolated node's rank is the teleport
    mass ``1 - damping + damping * dangling_share``).

    Dangling mass (nodes with no out-edges) is redistributed uniformly
    each iteration, so the total stays conserved — the scalar is
    computed distributed and broadcast, never a driver-side row loop.
    """
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).distinct()
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iters):
        with_deg = ranks.join(
            out_deg, ranks["node"] == out_deg["_s"], "left"
        ).select("node", "rank", "_deg")
        # mass from nodes with no out-edges teleports uniformly
        dangling = (
            with_deg.filter(F.col("_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_m"))
            .first()["_m"]
        )
        contribs = (
            with_deg.filter(F.col("_deg").isNotNull())
            .join(e, with_deg["node"] == e["_s"])
            .select(F.col("_d").alias("node"), (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        base = 1.0 - damping + damping * dangling / n_nodes
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base) + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
