"""Graph-analytics catalog entries over the near-duplicate pair graph.

PageRank on the LSH dup graph ranks "template hubs" — documents whose
near-duplicate neighborhoods are largest — which is how a curation run
finds boilerplate families worth a single survivor. Builds on the same
pair list as `dedup_clusters` / `dedup_graph_triangles`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dsp_spark.catalog import register
from dsp_spark.operators import dedup as dd
from dsp_spark.operators.graph import (
    WEDGE_CAP,
    adamic_adar,
    local_clustering,
    pagerank,
)
from dsp_spark.queries._util import t
from dsp_spark.queries.dedup import _LSH_CTES


def _pr_iter(i: int) -> str:
    """One unrolled PageRank round in fixed-point micro-ranks
    (mirrors operators/graph.py:pagerank exactly): 1e-8-grain integer
    contributions, exact BIGINT sums, integer half-up damping update."""
    return f"""c{i} AS (
        SELECT e.v AS node, (r.pr6 * 100) // d.deg AS c8
        FROM edges e
        JOIN r{i - 1} r ON e.u = r.node
        JOIN deg d ON e.u = d.u
    ), s{i} AS (
        SELECT node, CAST(SUM(c8) AS BIGINT) AS s8
        FROM c{i} GROUP BY node
    ), r{i} AS (
        SELECT n0.node,
               150000 + (85 * COALESCE(s{i}.s8, 0) + 5000) // 10000 AS pr6
        FROM n0 LEFT JOIN s{i} ON n0.node = s{i}.node
    )"""


@register(
    "graph_pagerank_dupgraph",
    f"""
    WITH {_LSH_CTES},
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    deg AS (SELECT u, COUNT(*) AS deg FROM edges GROUP BY u),
    n0 AS (SELECT doc_id AS node FROM documents),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr6 FROM n0),
    {_pr_iter(1)},
    {_pr_iter(2)}
    SELECT node AS doc_id, CAST(pr6 AS DOUBLE) / 1000000 AS pagerank
    FROM r2
    """,
    doc="PageRank over the MinHash-LSH near-dup graph (2 unrolled "
    "rounds, damping 0.85): surfaces template/boilerplate hub "
    "documents by duplicate-neighborhood mass. Each round is one "
    "edge join + one node-keyed partial-agg shuffle; rank state is "
    "fixed-point integer micro-ranks, so the iterative ranks stay "
    "bit-exact across engines with no floating-point rounding at all "
    "(operators/graph.py:pagerank). The pair list is materialized "
    "once — the LSH subplan never replicates across iterations.",
)
def graph_pagerank_dupgraph(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    # materialize the pair list once: both unrolled iterations (edge
    # join + degree join) would otherwise replicate the LSH subplan
    pairs = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", n_hashes=8, bands=2, k=5
    ).localCheckpoint(eager=True)
    return pagerank(docs, pairs, "doc_id", iters=2).select(
        F.col("node").alias("doc_id"), F.col("pr").alias("pagerank")
    )


@register(
    "graph_degree_distribution",
    f"""
    WITH {_LSH_CTES},
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS degree
            FROM edges GROUP BY u)
    SELECT CAST(bucket AS INTEGER) AS degree_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(degree) AS BIGINT) AS min_degree,
           CAST(MAX(degree) AS BIGINT) AS max_degree
    FROM (SELECT degree,
                 CAST(floor(log2(degree)) AS INTEGER) AS bucket
          FROM deg)
    GROUP BY bucket
    """,
    doc="Degree distribution of the near-duplicate graph in power-of-2 "
    "buckets — the shape check a curation run does before trusting "
    "graph-stage costs: a heavy tail means template hubs (one doc "
    "near-duplicating thousands) that make pair enumeration and "
    "clustering quadratic in the hub size, the signal to tighten the "
    "LSH threshold or cap cluster fan-out. Buckets are exact integer "
    "log2 of exact counts (log2 of an int is exact binary for the "
    "bucket floor), grain bounded by log2(max degree) <= 64 rows. "
    "Isolated docs have no edge and no bucket — degree-0 is the "
    "complement against n_docs, reported by dedup_rate_by_source.",
)
def graph_degree_distribution(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(
        d, "doc_id", "text", n_hashes=8, bands=2, k=5
    )
    # degree needs no directed edge list: each pair contributes one to
    # both endpoints, so explode the endpoint array instead of a union
    # that duplicates the whole LSH subplan in the physical plan
    deg = (
        pairs.select(F.explode(F.array("id_a", "id_b")).alias("u"))
        .groupBy("u")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    return (
        deg.select(
            "degree",
            F.floor(F.log2("degree")).cast("int").alias("degree_bucket"),
        )
        .groupBy("degree_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            F.min("degree").cast("bigint").alias("min_degree"),
            F.max("degree").cast("bigint").alias("max_degree"),
        )
    )


@register(
    "graph_adamic_adar_pairs",
    f"""
    WITH {_LSH_CTES},
    edges AS (
        SELECT id_a AS w, id_b AS n FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    ranked AS (
        SELECT w, n,
               ROW_NUMBER() OVER (PARTITION BY w ORDER BY n) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY w) AS BIGINT) AS deg
        FROM edges
    ),
    kept AS (
        SELECT w, n, deg FROM ranked WHERE rn <= {WEDGE_CAP}
    ),
    at_risk AS (
        SELECT DISTINCT n AS node FROM ranked WHERE rn > {WEDGE_CAP}
    ),
    wedges AS (
        SELECT k1.w, k1.n AS a, k2.n AS b, k1.deg
        FROM kept k1 JOIN kept k2 ON k1.w = k2.w AND k1.n < k2.n
    ),
    agg AS (
        SELECT a AS id_a, b AS id_b,
               CAST(COUNT(*) AS BIGINT) AS common_neighbors,
               CAST(SUM(CAST(round(1000000.0 / ln(CAST(deg AS DOUBLE)))
                             AS BIGINT)) AS BIGINT) AS aa_micro
        FROM wedges
        GROUP BY a, b
    )
    SELECT g.id_a, g.id_b, g.common_neighbors, g.aa_micro,
           (ra.node IS NOT NULL OR rb.node IS NOT NULL) AS capped
    FROM agg g
    LEFT JOIN at_risk ra ON g.id_a = ra.node
    LEFT JOIN at_risk rb ON g.id_b = rb.node
    """,
    doc="Adamic-Adar link prediction over the near-dup graph: for each "
    "pair of documents sharing LSH-edge neighbors, sum 1/ln(deg(w)) "
    "over common neighbors w — high scores predict missing duplicate "
    "edges the banding narrowly missed (the recall-repair pass after "
    "LSH). Each AA term is quantized to an exact integer micro-score "
    "BEFORE summing (round of the identical per-node double), so the "
    "aggregate is order-independent and bit-equal across engines — a "
    "raw double sum would not be; the weight keeps the TRUE degree of "
    "w even when its wedge list is capped. Wedge enumeration runs on "
    "each center's WEDGE_CAP smallest neighbor ids (deterministic "
    "top-D — operators/graph.py:capped_neighbors), bounding the "
    "worst case at n*D^2 wedges even if a template hub glues 1e5 "
    "neighbors. SOUND exactness flag (advisor r10): capped=true marks "
    "pairs with either endpoint in some truncated hub's DROPPED "
    "(rn > cap) tail — only such pairs can be missing a wedge, since "
    "a wedge enumerates iff both endpoints are kept — so capped=false "
    "GUARANTEES the exact uncapped score and capped=true means a "
    "possible lower bound; pairs whose every shared hub dropped an "
    "endpoint are absent entirely (capping bounds enumeration, it "
    "cannot flag rows it never builds). Every common neighbor has "
    "deg >= 2 so ln() never hits zero. One neighbor-keyed join + one "
    "pair-keyed partial agg + two id-keyed flag joins on the small "
    "dropped set.",
)
def graph_adamic_adar_pairs(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(
        d, "doc_id", "text", n_hashes=8, bands=2, k=5
    ).localCheckpoint(eager=True)
    return adamic_adar(pairs, cap=WEDGE_CAP)


@register(
    "graph_node_clustering_coeff",
    f"""
    WITH {_LSH_CTES},
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    ranked AS (
        SELECT u, v,
               ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY u) AS BIGINT) AS degree
        FROM edges
    ),
    kept AS (SELECT u, v FROM ranked WHERE rn <= {WEDGE_CAP}),
    deg AS (SELECT u, CAST(MAX(degree) AS BIGINT) AS degree
            FROM ranked GROUP BY u),
    wedges AS (
        SELECT k1.u, k1.v AS a, k2.v AS b
        FROM kept k1 JOIN kept k2 ON k1.u = k2.u AND k1.v < k2.v
    ),
    closed AS (
        SELECT wg.u, CAST(COUNT(*) AS BIGINT) AS triangles
        FROM wedges wg
        JOIN pairs p ON wg.a = p.id_a AND wg.b = p.id_b
        GROUP BY wg.u
    )
    SELECT d.u AS doc_id, d.degree,
           COALESCE(c.triangles, 0) AS triangles,
           CAST(2 * COALESCE(c.triangles, 0) AS DOUBLE)
               / (LEAST(d.degree, {WEDGE_CAP})
                  * (LEAST(d.degree, {WEDGE_CAP}) - 1)) AS clustering_coeff,
           d.degree > {WEDGE_CAP} AS capped
    FROM deg d LEFT JOIN closed c ON d.u = c.u
    WHERE d.degree >= 2
    """,
    doc="Per-node local clustering coefficient on the near-dup graph: "
    "the fraction of a document's duplicate-neighbor pairs that are "
    "themselves duplicates. Near 1 = a coherent template family "
    "(dedup can keep one survivor for the whole cluster); near 0 = a "
    "hub stitching UNRELATED groups — usually boilerplate contamination "
    "that LSH banding glued together, the signal to tighten bands "
    "before trusting cluster-level dedup. Wedges enumerate over each "
    "center's WEDGE_CAP smallest neighbor ids (deterministic top-D — "
    "operators/graph.py:capped_neighbors), bounding the worst case at "
    "n*D^2 even under a glued template hub; a capped row reports the "
    "exact coefficient of the kept neighborhood (denominator "
    "least(degree, D)) with capped=true, while degree stays the true "
    "degree. Closure is one join against the canonical a<b pair "
    "list, and the coefficient is an exact small-int ratio — "
    "bit-identical with no rounding at all.",
)
def graph_node_clustering_coeff(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(
        d, "doc_id", "text", n_hashes=8, bands=2, k=5
    ).localCheckpoint(eager=True)
    return local_clustering(pairs, cap=WEDGE_CAP)
