"""Iterative graph algorithms over near-duplicate pair graphs.

Companions to `operators/dedup.py:connected_components` (min-label
propagation): these run on the same undirected pair list that MinHash
LSH emits. All iteration state lives in DataFrames keyed by node id —
nothing collects to the driver, and per-iteration arithmetic is
engine-deterministic (rounded-then-DECIMAL sums), so even the iterative
path is value-checkable against an unrolled SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    iters: int = 2,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Undirected PageRank (uniform teleport, unnormalized form
    ``pr' = (1-d) + d * sum(pr(u)/deg(u))``) over an ``(id_a, id_b)``
    pair list; isolated nodes settle at ``1-d``.

    Determinism contract: rank state is a FIXED-POINT integer
    (micro-ranks, ``pr6 = pr * 1e6``); contributions quantize to 1e-8
    via integer floor division, per-node sums are exact BIGINT adds,
    and the damping update is exact integer half-up division — no
    floating-point op ever feeds a rounding boundary, so iterations
    are bit-identical on any engine/partitioning. (A double ROUND here
    is engine-divergent: pr/deg often has a decimal expansion that
    terminates exactly one digit past the rounding position, and Java
    rounds the shortest string while C rounds the binary value.)
    Scale: the corpus-sized work per iteration is one edge-keyed
    broadcast-free join plus one node-keyed partial-agg shuffle;
    edges/degrees are computed once by the caller (pass a materialized
    ``pairs``). Lineage is flattened every ``checkpoint_every``
    iterations the same way connected_components does, so long runs
    don't accrete plan depth. ``damping`` must have at most 2 decimals
    (it becomes the exact rational d100/100).
    """
    d100 = int(round(damping * 100))
    t6 = 1_000_000 * (100 - d100) // 100  # teleport in micro-ranks
    edges = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).unionAll(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
    deg = edges.groupBy("u").agg(F.count("*").alias("deg"))
    node_ids = nodes.select(F.col(id_col).alias("node"))
    ranks = node_ids.select("node", F.lit(1_000_000).cast("bigint").alias("pr6"))
    for i in range(iters):
        r = ranks.withColumnRenamed("node", "u")
        contribs = (
            edges.join(r, "u")
            .join(deg, "u")
            .select(
                F.col("v").alias("node"),
                # contribution at 1e-8 grain: floor((pr6*100)/deg)
                F.expr("(pr6 * 100) div deg").alias("c8"),
            )
        )
        sums = contribs.groupBy("node").agg(F.sum("c8").alias("s8"))
        # pr' = teleport + damping * s8/1e8, half-up at 1e-6 grain:
        # pr6' = t6 + (d100*s8 + 5000) div 10000  with damping = d100/100
        ranks = node_ids.join(sums, "node", "left").select(
            "node",
            (
                F.lit(t6)
                + F.expr(f"({d100} * coalesce(s8, 0L) + 5000) div 10000")
            ).cast("bigint").alias("pr6"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        "node", (F.col("pr6").cast("double") / 1_000_000).alias("pr")
    )
