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

    Determinism contract: each contribution ``pr/deg`` is a double
    division of identical operands on any engine, rounded to 8 and
    accumulated as DECIMAL(18,8) — so the per-node sum is independent
    of partitioning/accumulation order, and each iteration's ranks are
    bit-identical across engines. Scale: the corpus-sized work per
    iteration is one edge-keyed broadcast-free join plus one node-keyed
    partial-agg shuffle; edges/degrees are computed once by the caller
    (pass a materialized ``pairs``). Lineage is flattened every
    ``checkpoint_every`` iterations the same way connected_components
    does, so long runs don't accrete plan depth.
    """
    edges = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).unionAll(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
    deg = edges.groupBy("u").agg(F.count("*").alias("deg"))
    node_ids = nodes.select(F.col(id_col).alias("node"))
    ranks = node_ids.select("node", F.lit(1.0).alias("pr"))
    teleport = 1.0 - damping
    for i in range(iters):
        r = ranks.withColumnRenamed("node", "u")
        contribs = (
            edges.join(r, "u")
            .join(deg, "u")
            .select(
                F.col("v").alias("node"),
                F.round(F.col("pr") / F.col("deg"), 8)
                .cast("decimal(18,8)")
                .alias("contrib"),
            )
        )
        sums = contribs.groupBy("node").agg(
            F.sum("contrib").cast("double").alias("s")
        )
        ranks = node_ids.join(sums, "node", "left").select(
            "node",
            F.round(
                teleport + damping * F.coalesce(F.col("s"), F.lit(0.0)), 6
            ).alias("pr"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
