"""Scale stress: the quadratic-prone operators on 5x-unioned input.

Catches blowups that sf0.1 hides — LSH pair explosion on a denser
dup graph, connected-components round growth, fact-fact join fanout.
Asserts completion and output sanity, not wall-clock (CI boxes vary).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dsp_spark.operators import dedup as dd
from dsp_spark.session import read_table

COPIES = 5
SHIFT = 10_000_000


def _xn(df, id_cols):
    parts = []
    for i in range(COPIES):
        p = df
        for c in id_cols:
            p = p.withColumn(c, F.col(c) + F.lit(i * SHIFT))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def test_lsh_and_components_on_denser_graph(spark, sf_dir):
    docs = _xn(read_table(spark, sf_dir, "documents"), ["doc_id"]).select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    pairs = dd.minhash_lsh_pairs(docs, "doc_id", "text", n_hashes=8, bands=2, k=5)
    n_pairs = pairs.count()
    # every doc now has COPIES-1 exact clones -> at least those pairs exist,
    # and banding must keep the candidate set far below the quadratic wall
    assert n_pairs >= n_docs * (COPIES - 1) // 2
    assert n_pairs < n_docs * 60
    comp = dd.connected_components(docs, pairs, "doc_id")
    assert comp.count() == n_docs
    # clone families collapse: every copy of a doc shares its component
    fam = comp.withColumn("orig", F.col("doc_id") % SHIFT)
    n_bad = (
        fam.groupBy("orig")
        .agg(F.countDistinct("component").alias("nc"))
        .filter(F.col("nc") > 1)
        .count()
    )
    assert n_bad == 0


def test_fact_fact_join_at_5x(spark, sf_dir):
    li = _xn(read_table(spark, sf_dir, "lineitem"), ["l_orderkey"])
    o = _xn(
        read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate", "o_orderstatus"
        ),
        ["o_orderkey"],
    )
    late = (F.col("o_orderstatus") == "F") & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(F.when(late, 1).otherwise(0)).alias("n_late"))
    )
    assert per_supp.count() > 0
