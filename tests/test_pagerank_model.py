"""Fuzz the distributed fixed-point PageRank against a pure-Python
model of the same algorithm (micro-rank integers, floor/half-up integer
divisions) on random graphs — the distributed joins/aggregations must
be an exact implementation of the sequential spec, independent of
partitioning.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dsp_spark.operators.graph import pagerank


def _model(n_nodes, pairs, iters, d100=85):
    t6 = 1_000_000 * (100 - d100) // 100
    edges = {}
    for a, b in pairs:
        edges.setdefault(a, []).append(b)
        edges.setdefault(b, []).append(a)
    deg = {u: len(vs) for u, vs in edges.items()}
    pr6 = {v: 1_000_000 for v in range(n_nodes)}
    for _ in range(iters):
        s8 = {v: 0 for v in range(n_nodes)}
        for u, vs in edges.items():
            c8 = (pr6[u] * 100) // deg[u]
            for v in vs:
                s8[v] += c8
        pr6 = {
            v: t6 + (d100 * s8[v] + 5000) // 10000 for v in range(n_nodes)
        }
    return {v: pr6[v] / 1_000_000 for v in range(n_nodes)}


def test_pagerank_matches_sequential_model_on_random_graphs(spark):
    rng = random.Random(20260814)
    for trial in range(8):
        n = rng.randint(2, 14)
        possible = [(a, b) for a in range(n) for b in range(a + 1, n)]
        m = rng.randint(0, len(possible))
        pairs = rng.sample(possible, m)
        iters = rng.randint(1, 3)
        expected = _model(n, pairs, iters)

        nodes = spark.range(n).select(F.col("id").alias("doc_id"))
        if pairs:
            pdf = spark.createDataFrame(pairs, ["id_a", "id_b"])
        else:
            pdf = spark.createDataFrame([], "id_a long, id_b long")
        got = {
            r.node: r.pr
            for r in pagerank(nodes, pdf, "doc_id", iters=iters).collect()
        }
        assert got == expected, (trial, n, sorted(pairs), iters)
