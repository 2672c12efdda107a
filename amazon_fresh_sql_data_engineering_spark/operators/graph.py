"""Iterative link-analysis over edge DataFrames — the joins-and-aggregates
form of PageRank that scales the way Spark wants (GraphX without GraphX).

Companion to ``dedup.connected_components`` (the other iterative graph
primitive): components answers "which rows are the same thing", PageRank
answers "which nodes matter", the centrality signal a crawl-style corpus
pipeline uses for source weighting alongside ``text_url_dedup``.

Engine-portability rules (same discipline as ``op_kmeans_refine``):
- damping constants enter as DOUBLE literals on both engines (never
  ``1 - 0.85`` in Python — that's 0.15000000000000002, while SQL's
  decimal arithmetic yields exact 0.15);
- ranks are ROUNDED (default 8 dp) after every iteration so the next
  iteration consumes engine-identical inputs;
- per-node contribution is written ``r * (w / w_out)`` — one operand
  order, exactly-rounded IEEE ops only.

Scale shape per iteration: one shuffle keyed on src (edges ⋈ ranks), one
map-side-combined aggregation keyed on dst, one left join back to the node
list. Edges are never collected; the only driver-side action is the
node-count scalar (one number, same class as the IVF centroid fetch).
Dangling mass is NOT redistributed (the "leaky" formulation) — ranks then
sum to < 1, which is fine for ordering/weighting uses and keeps every
iteration a pure edge-local message pass; redistributing would add a
scalar aggregate per iteration, not a new shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 2,
    damping: float = 0.85,
    teleport: float = 0.15,
    intermediate_round: int = 8,
) -> DataFrame:
    """Weighted PageRank over ``edges(src, dst, weight)``.

    Returns ``(node, rank)`` after ``iterations`` synchronous updates from
    a uniform start. ``teleport`` is passed explicitly rather than derived
    as ``1 - damping`` (see module docstring — decimal-vs-binary drift).
    """
    edges = edges.select(
        F.col("src"), F.col("dst"), F.col("weight").cast("double").alias("w")
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # scalar action: one number, metadata-sized
    out_w = edges.groupBy("src").agg(F.sum("w").alias("w_out"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("r"))
    for _ in range(iterations):
        contrib = (
            edges.join(out_w, "src")
            .join(ranks, edges["src"] == ranks["node"])
            .select("dst", (F.col("r") * (F.col("w") / F.col("w_out"))).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                F.round(
                    F.lit(teleport / n)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                    intermediate_round,
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank"))
