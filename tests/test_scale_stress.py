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


def test_source_ngram_jaccard_on_5x_sources(spark, sf_dir):
    """r10 cost leader: the gram-grouped map-side pair explode is
    quadratic in sources sharing a gram — 5x the source dictionary
    (every doc cloned under 5 suffixed sources) multiplies shared-gram
    pair fanout ~25x. Must complete with the pair grain bounded by the
    source-pair dictionary, and exact clones must read jaccard = 1."""
    from dsp_spark.queries.text import source_ngram_pairs

    docs = read_table(spark, sf_dir, "documents").select("source", "text")
    parts = [
        docs.withColumn(
            "source", F.concat(F.col("source"), F.lit(f"__{i}"))
        )
        for i in range(COPIES)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    n_sources = big.select("source").distinct().count()

    rows = source_ngram_pairs(big).collect()
    # pair grain is the source-pair dictionary, never doc- or gram-grain
    assert 0 < len(rows) <= n_sources * (n_sources - 1) // 2
    # the 5 clones of each base source have IDENTICAL gram sets
    clone_pairs = [
        r
        for r in rows
        if r.source_a.rsplit("__", 1)[0] == r.source_b.rsplit("__", 1)[0]
    ]
    base_sources = n_sources // COPIES
    assert len(clone_pairs) == base_sources * COPIES * (COPIES - 1) // 2
    assert all(
        r.jaccard == 1.0 and r.n_a == r.n_b == r.n_common
        for r in clone_pairs
    )


def test_incremental_fold_on_5x_corpus(spark, sf_dir):
    """r10 cost leader #1 (dedup_clusters_incremental): the contraction
    fold on a 5x-denser clone graph — candidate edges broadcast the
    batch side only, the contracted delta stays O(new edges), and the
    folded assignment must still collapse every clone family."""
    docs = _xn(read_table(spark, sf_dir, "documents"), ["doc_id"]).select(
        "doc_id", "text"
    )
    base = docs.where(F.col("doc_id") % 2 == 0)
    newd = docs.where(F.col("doc_id") % 2 == 1)
    pairs = dd.minhash_lsh_pairs(base, "doc_id", "text", n_hashes=8, bands=2, k=5)
    state = dd.connected_components(base, pairs, "doc_id")
    edges = dd.lsh_new_edges(
        docs, newd.select("doc_id"), "doc_id", "text",
        n_hashes=8, bands=2, k=5,
    )
    folded = dd.incremental_components(
        state, newd.select("doc_id"), edges, "doc_id"
    )
    assert folded.count() == docs.count()
    # SHIFT is even, so each clone family shares parity: families are
    # entirely base or entirely new, and either path must collapse them
    fam = folded.withColumn("orig", F.col("doc_id") % SHIFT)
    n_bad = (
        fam.groupBy("orig")
        .agg(F.countDistinct("component").alias("nc"))
        .filter(F.col("nc") > 1)
        .count()
    )
    assert n_bad == 0


def test_span_intervals_on_5x_clone_corpus(spark, sf_dir):
    """Span anchors under total duplication: 5 exact clones of every
    doc make EVERY gram cross-document — the worst case for the
    gram-keyed aggregates (every (gram, doc) row survives the nd >= 2
    filter). Must complete, and the output has a closed form: each doc
    with >= G tokens is covered by exactly one full-width interval."""
    from dsp_spark.operators.dedup import dup_span_intervals

    G = 8
    docs = _xn(read_table(spark, sf_dir, "documents"), ["doc_id"]).select(
        "doc_id", "text"
    )
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    eligible = docs.select("doc_id", F.size(toks).alias("n")).where(
        F.col("n") >= G
    )
    iv = dup_span_intervals(docs, "doc_id", "text", gram=G)
    got = iv.join(eligible, "doc_id", "full").select(
        "doc_id", "s", "e", "n"
    )
    bad = got.where(
        F.col("s").isNull()  # eligible doc with no interval
        | F.col("n").isNull()  # interval on an ineligible doc
        | (F.col("s") != 1)
        | (F.col("e") != F.col("n"))
    ).count()
    assert bad == 0
    assert iv.count() == eligible.count()


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
