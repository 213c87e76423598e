"""Iterative graph algorithms over near-duplicate pair graphs.

Companions to `operators/dedup.py:connected_components` (min-label
propagation): these run on the same undirected pair list that MinHash
LSH emits. All iteration state lives in DataFrames keyed by node id —
nothing collects to the driver, and per-iteration arithmetic is
engine-deterministic (rounded-then-DECIMAL sums), so even the iterative
path is value-checkable against an unrolled SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Deterministic per-node neighbor cap for wedge enumeration (Adamic-
# Adar, local clustering). The neighbor-keyed self-join is O(sum
# deg^2): one template hub with 1e5 LSH neighbors at 100 TB would put
# 1e10 wedges in a single key. Capping each node to its WEDGE_CAP
# smallest neighbor ids (top-D by id — deterministic, no RNG) bounds
# the worst case at n * D^2 wedges; rows whose enumeration was
# truncated carry ``capped = true`` so consumers know the score is a
# lower bound there. The LSH pair graph is expected bounded-degree
# after banding (graph_degree_distribution audits it), so this is a
# guardrail, not a redesign — at catalog test scales nothing caps.
WEDGE_CAP = 64


def _ranked_neighbors(pairs: DataFrame) -> DataFrame:
    """Per-node adjacency rows ``(w, n, rn, deg)``: every edge in both
    directions, ranked by neighbor id within the node (``row_number``
    over ``(w ORDER BY n)`` — (w, n) is unique in a distinct pair list,
    so the ranking is deterministic) with the node's true degree. One
    shuffle on the node key; both window functions share the
    partitioning. ``rn <= cap`` is the kept list, ``rn > cap`` the
    dropped tail."""
    edges = pairs.select(
        F.col("id_a").alias("w"), F.col("id_b").alias("n")
    ).unionAll(pairs.select(F.col("id_b").alias("w"), F.col("id_a").alias("n")))
    by_w = Window.partitionBy("w")
    return edges.select(
        "w",
        "n",
        F.row_number().over(by_w.orderBy("n")).alias("rn"),
        F.count("*").over(by_w).cast("bigint").alias("deg"),
    )


def _check_cap(cap: int) -> None:
    """cap < 2 cannot enumerate a single wedge (a wedge needs two kept
    neighbors) and makes local_clustering's kd*(kd-1) denominator zero
    for every node — NaN/Infinity coefficients (advisor r10 finding).
    Fail loudly instead."""
    if cap < 2:
        raise ValueError(f"wedge cap must be >= 2, got {cap}")


def capped_neighbors(pairs: DataFrame, cap: int = WEDGE_CAP) -> DataFrame:
    """Per-node adjacency rows ``(w, n, deg, was_capped)`` limited to
    each node's ``cap`` smallest neighbor ids.

    ``deg`` is the TRUE degree of ``w`` (pre-cap — weighting formulas
    keep their exact semantics); ``was_capped`` marks nodes whose list
    was truncated."""
    _check_cap(cap)
    return _ranked_neighbors(pairs).where(F.col("rn") <= cap).select(
        "w", "n", "deg", (F.col("deg") > cap).alias("was_capped")
    )


def adamic_adar(pairs: DataFrame, cap: int = WEDGE_CAP) -> DataFrame:
    """Adamic-Adar link prediction over an ``(id_a, id_b)`` pair list:
    for each pair of nodes sharing neighbors, sum ``1/ln(deg(w))``
    over common neighbors ``w`` (Adamic & Adar 2003). Each term is
    quantized to an exact integer micro-score BEFORE summing, so the
    aggregate is order-independent and bit-equal across engines; the
    weight uses the TRUE degree of ``w`` even when the wedge list is
    capped. Returns (id_a, id_b, common_neighbors, aa_micro, capped).

    Exactness contract of ``capped`` (sound, advisor r10 medium): a
    wedge (a, b) through center w is enumerated iff BOTH endpoints sit
    in w's kept list, so a present pair is undercounted only when some
    shared hub DROPPED one of its endpoints — i.e. an endpoint appears
    in the ``rn > cap`` tail of a truncated list. ``capped = true``
    therefore marks pairs with either endpoint in that dropped set
    (score MAY be a lower bound); ``capped = false`` GUARANTEES the
    exact uncapped score. (The old flag OR-ed ``was_capped`` over
    CONTRIBUTING centers only: a capped hub that dropped endpoint a
    emits no wedge row at all, so a pair it undercounts could read
    capped=false via an uncapped center — unsound.) Pairs whose every
    shared hub dropped an endpoint are ABSENT from the output entirely
    — capping bounds the enumeration, it cannot flag rows it never
    builds. The dropped set is one filter over the already-ranked
    adjacency plus two id-keyed left joins — no wedge-shaped work."""
    _check_cap(cap)
    ranked = _ranked_neighbors(pairs).localCheckpoint(eager=True)
    kept = ranked.where(F.col("rn") <= cap)
    at_risk = ranked.where(F.col("rn") > cap).select("n").distinct()
    k1 = kept.select("w", F.col("n").alias("a"), "deg")
    k2 = kept.select("w", F.col("n").alias("b"))
    wedges = k1.join(k2, "w").where(F.col("a") < F.col("b"))
    term = F.round(
        F.lit(1000000.0) / F.log(F.col("deg").cast("double"))
    ).cast("bigint")
    scores = wedges.groupBy(
        F.col("a").alias("id_a"), F.col("b").alias("id_b")
    ).agg(
        F.count("*").cast("bigint").alias("common_neighbors"),
        F.sum(term).cast("bigint").alias("aa_micro"),
    )
    ra = at_risk.select(F.col("n").alias("id_a"), F.lit(True).alias("_ra"))
    rb = at_risk.select(F.col("n").alias("id_b"), F.lit(True).alias("_rb"))
    return (
        scores.join(ra, "id_a", "left")
        .join(rb, "id_b", "left")
        .select(
            "id_a",
            "id_b",
            "common_neighbors",
            "aa_micro",
            (
                F.coalesce(F.col("_ra"), F.lit(False))
                | F.coalesce(F.col("_rb"), F.lit(False))
            ).alias("capped"),
        )
    )


def local_clustering(pairs: DataFrame, cap: int = WEDGE_CAP) -> DataFrame:
    """Per-node local clustering coefficient over an ``(id_a, id_b)``
    pair list: the fraction of a node's neighbor pairs that are edges
    themselves. Wedges enumerate over each center's ``cap`` smallest
    neighbors; the denominator uses ``kd = least(degree, cap)`` so a
    capped row is the exact coefficient OF THE KEPT NEIGHBORHOOD (a
    deterministic subsample), flagged ``capped = true``. ``degree``
    stays the true degree. Closure is one join against the canonical
    ``a < b`` pair list; the ratio is an exact small-int division —
    bit-identical with no rounding."""
    kept = capped_neighbors(pairs, cap).localCheckpoint(eager=True)
    k1 = kept.select(F.col("w").alias("u"), F.col("n").alias("a"))
    k2 = kept.select(F.col("w").alias("u"), F.col("n").alias("b"))
    wedges = k1.join(k2, "u").where(F.col("a") < F.col("b"))
    closed = (
        wedges.join(
            pairs,
            (wedges.a == pairs.id_a) & (wedges.b == pairs.id_b),
        )
        .groupBy("u")
        .agg(F.count("*").cast("bigint").alias("triangles"))
    )
    nodes = kept.groupBy(F.col("w").alias("u")).agg(
        F.max("deg").alias("degree"), F.max("was_capped").alias("capped")
    )
    kd = F.least(F.col("degree"), F.lit(cap))
    return (
        nodes.join(closed, "u", "left")
        .fillna(0, subset=["triangles"])
        .where(F.col("degree") >= 2)
        .select(
            F.col("u").alias("doc_id"),
            "degree",
            F.col("triangles").cast("bigint").alias("triangles"),
            ((2 * F.col("triangles")).cast("double") / (kd * (kd - 1))).alias(
                "clustering_coeff"
            ),
            "capped",
        )
    )


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
        if i == 0:
            # uniform init: every node starts at the literal 1e6
            # micro-ranks, so the first round's contribution needs no
            # rank join at all — one full edge-keyed join removed
            contribs = edges.join(deg, "u").select(
                F.col("v").alias("node"),
                F.expr("(1000000L * 100) div deg").alias("c8"),
            )
        else:
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
