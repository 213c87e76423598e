"""Incremental dedup-cluster maintenance (r8 verdict ask #4).

incremental_components folds an ingest batch's LSH edges into a
persisted (id, component) assignment; these tests pin:

* bit-parity with a full connected-components recompute over the
  unioned edge set (including the hard case: one new doc bridging two
  previously-separate base clusters);
* work proportional to the NEW edge set — the fold's plan never scans
  or shuffles anything at base-graph grain (its only inputs are the
  label table and the new edges), and an empty batch is an identity;
* the candidate generator's scale shape: corpus bands map-side against
  a BROADCAST of the batch bands, never a corpus self-join.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dsp_spark.operators import dedup as dd
from dsp_spark import plans


def _cc_dict(spark, node_ids, edges):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "id bigint")
    e = spark.createDataFrame(
        edges or [(0, 0)], "id_a bigint, id_b bigint"
    )
    if not edges:
        e = e.where(F.lit(False))
    out = dd.connected_components(nodes, e, "id")
    return {r.id: r.component for r in out.collect()}


def _incremental_dict(spark, state, new_ids, new_edges):
    st = spark.createDataFrame(
        [(k, v) for k, v in state.items()], "id bigint, component bigint"
    )
    nn = spark.createDataFrame([(n,) for n in new_ids], "id bigint")
    ne = spark.createDataFrame(
        new_edges or [(0, 0)], "id_a bigint, id_b bigint"
    )
    if not new_edges:
        ne = ne.where(F.lit(False))
    out = dd.incremental_components(st, nn, ne, "id")
    return {r.id: r.component for r in out.collect()}


def test_bridging_new_doc_merges_two_base_clusters(spark):
    """The case a naive 'assign new doc to nearest cluster' misses: one
    new doc adjacent to TWO base clusters must merge them, and the
    merged label must be the global min id."""
    state = {1: 1, 2: 1, 5: 5, 6: 5, 9: 9}  # clusters {1,2}, {5,6}, {9}
    new_ids = [10, 11]
    new_edges = [(2, 10), (5, 10)]  # 10 bridges cluster 1 and cluster 5
    got = _incremental_dict(spark, state, new_ids, new_edges)
    want = _cc_dict(
        spark, [1, 2, 5, 6, 9, 10, 11], [(1, 2), (5, 6)] + new_edges
    )
    assert got == want
    assert got == {1: 1, 2: 1, 5: 1, 6: 1, 9: 9, 10: 1, 11: 11}


def test_empty_batch_is_identity(spark):
    state = {1: 1, 2: 1, 7: 7}
    got = _incremental_dict(spark, state, [], [])
    assert got == state


def test_new_only_chain_and_untouched_clusters(spark):
    """A chain living entirely inside the batch clusters among itself;
    base clusters not adjacent to any new edge keep their labels."""
    state = {3: 3, 4: 3, 8: 8}
    new_ids = [20, 21, 22, 23]
    new_edges = [(20, 21), (21, 22)]  # 23 is a singleton
    got = _incremental_dict(spark, state, new_ids, new_edges)
    assert got == {3: 3, 4: 3, 8: 8, 20: 20, 21: 20, 22: 20, 23: 23}


def test_randomized_parity_with_full_recompute(spark):
    """Random graphs, random base/new split: folding the new-touching
    edges into the base assignment must equal a full recompute."""
    rng = random.Random(77)
    for trial in range(4):
        n = 40
        ids = list(range(n))
        edges = sorted(
            {
                tuple(sorted(rng.sample(ids, 2)))
                for _ in range(rng.randint(10, 35))
            }
        )
        new_set = {i for i in ids if rng.random() < 0.4}
        base_ids = [i for i in ids if i not in new_set]
        base_edges = [
            (a, b) for a, b in edges if a not in new_set and b not in new_set
        ]
        new_edges = [
            (a, b) for a, b in edges if a in new_set or b in new_set
        ]
        state = {
            k: v
            for k, v in _cc_dict(spark, base_ids, base_edges).items()
        }
        got = _incremental_dict(spark, state, sorted(new_set), new_edges)
        want = _cc_dict(spark, ids, edges)
        assert got == want, f"trial {trial}"


def test_fold_plan_touches_no_tables(spark):
    """Work ∝ new edges: the fold is a pure function of the label table
    and the edge delta — its plan contains ZERO file scans (the base
    corpus is never re-read, let alone recontracted)."""
    st = spark.createDataFrame([(1, 1), (2, 1)], "id bigint, component bigint")
    nn = spark.createDataFrame([(10,)], "id bigint")
    ne = spark.createDataFrame([(2, 10)], "id_a bigint, id_b bigint")
    out = dd.incremental_components(st, nn, ne, "id")
    assert plans.count_scans(out) == 0


def test_lsh_new_edges_broadcasts_batch_side(spark, sf_dir):
    """Candidate generation must broadcast the BATCH bands against the
    map-side corpus bands (lsh_cross_pairs shape) — a corpus band
    self-join here would re-pay the full-dedup shuffle every ingest."""
    from dsp_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    new_ids = docs.where(F.col("doc_id") % 2 == 1).select("doc_id")
    e = dd.lsh_new_edges(docs, new_ids, "doc_id", "text",
                         n_hashes=8, bands=2, k=5)
    plan = plans.formatted(e)
    assert "BroadcastHashJoin" in plan
    # band index materialized once (the persisted-index stand-in), so
    # NO file scan of the corpus text survives in the fold plan — only
    # the id-column scan feeding the batch-filter broadcast
    assert plans.count_scans(e) <= 1
    # 2 broadcasts (batch ids, batch bands) + 1 pair-distinct shuffle:
    # the corpus band side never exchanges
    assert plans.count_exchanges(e) <= 3


def test_lsh_new_edges_accepts_shared_band_index(spark, sf_dir):
    """A precomputed full-corpus band index (the persisted-index shape
    cluster maintenance shares with the base pair generator) must give
    the exact edge set the self-derived path computes."""
    from dsp_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    new_ids = docs.where(F.col("doc_id") % 2 == 1).select("doc_id")
    own = dd.lsh_new_edges(docs, new_ids, "doc_id", "text",
                           n_hashes=8, bands=2, k=5)
    sig = dd.minhash_signatures(docs, "doc_id", "text", n_hashes=8, k=5)
    idx = dd._bands_of(sig, "doc_id", n_hashes=8, bands=2).localCheckpoint(
        eager=True
    )
    shared = dd.lsh_new_edges(docs, new_ids, "doc_id", "text",
                              n_hashes=8, bands=2, k=5, band_index=idx)
    assert shared.exceptAll(own).count() == 0
    assert own.exceptAll(shared).count() == 0
    # the filtered index is also the base side's band table: pairs from
    # it must equal pairs recomputed from the base docs directly
    base = docs.where(F.col("doc_id") % 2 == 0)
    direct = dd.minhash_lsh_pairs(base, "doc_id", "text",
                                  n_hashes=8, bands=2, k=5)
    from_idx = dd.lsh_pairs_from_bands(
        idx.where(F.col("doc_id") % 2 == 0), "doc_id"
    )
    assert direct.exceptAll(from_idx).count() == 0
    assert from_idx.exceptAll(direct).count() == 0


def test_entry_matches_full_clusters_entry(spark, sf_dir):
    """End to end at sf: the incremental entry's assignment equals the
    batch dedup_clusters entry (full recompute) row for row."""
    from dsp_spark.queries import dedup as qd  # noqa: F401  (registers)
    from dsp_spark import catalog

    qs = catalog.queries()
    inc = {
        r.doc_id: r.cluster_id
        for r in qs["dedup_clusters_incremental"](spark, sf_dir).collect()
    }
    full = {
        r.doc_id: r.cluster_id
        for r in qs["dedup_clusters"](spark, sf_dir).collect()
    }
    assert inc == full and len(inc) > 0
