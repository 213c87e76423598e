"""Degree-capped wedge enumeration (operators/graph.py:capped_neighbors,
adamic_adar, local_clustering): a synthetic hub above the cap proves
wedge counts are bounded at n*D^2 and truncated rows are flagged, while
uncapped graphs are bit-identical to the uncapped formulas. Also pins
the shared-scorer construction: the same operators produce identical
output whether the pair list is recomputed or read from the persisted
edge store (tools/dedup_state.py read_edges)."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dsp_spark.operators.graph import (
    WEDGE_CAP,
    adamic_adar,
    capped_neighbors,
    local_clustering,
)


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "id_a bigint, id_b bigint"
    )


def _star_with_one_rim_edge(hub_deg):
    """Node 0 joined to 1..hub_deg, plus the rim edge (1, 2)."""
    return [(0, i) for i in range(1, hub_deg + 1)] + [(1, 2)]


def test_capped_neighbors_keeps_smallest_ids_and_true_degree(spark):
    cap = 4
    pairs = _pairs_df(spark, _star_with_one_rim_edge(10))
    kept = capped_neighbors(pairs, cap=cap).collect()
    by_node = {}
    for r in kept:
        by_node.setdefault(r.w, []).append((r.n, r.deg, r.was_capped))
    # hub keeps its 4 smallest neighbors, true degree preserved, flagged
    assert sorted(n for n, _, _ in by_node[0]) == [1, 2, 3, 4]
    assert all(d == 10 and c for _, d, c in by_node[0])
    # rim node 1 (neighbors 0, 2) is under the cap: full list, unflagged
    assert sorted(n for n, _, _ in by_node[1]) == [0, 2]
    assert all(d == 2 and not c for _, d, c in by_node[1])


def test_adamic_adar_hub_capped_and_bounded(spark):
    cap = 8
    hub_deg = 50
    pairs = _pairs_df(spark, _star_with_one_rim_edge(hub_deg))
    rows = {(r.id_a, r.id_b): r for r in adamic_adar(pairs, cap=cap).collect()}

    # wedges through the hub enumerate only its 8 smallest neighbors:
    # C(8,2) = 28 pairs, NOT C(50,2) = 1225 — plus the two rim wedges
    # (0,1) via center 2 and (0,2) via center 1
    hub_pairs = {
        (a, b) for a in range(1, 9) for b in range(a + 1, 9)
    }
    assert set(rows) == hub_pairs | {(0, 1), (0, 2)}

    # the AA weight keeps the hub's TRUE degree (1/ln(50), not 1/ln(8))
    want_hub_term = int(round(1e6 / math.log(hub_deg)))
    assert rows[(3, 4)].aa_micro == want_hub_term
    assert rows[(3, 4)].common_neighbors == 1
    assert rows[(0, 2)].aa_micro == int(round(1e6 / math.log(2)))

    # SOUND flag semantics: in this star every PRESENT pair's wedges all
    # survived (dropped rim nodes 9..50 are endpoints of no present
    # pair), so nothing is flagged — capped marks possible undercount,
    # not hub membership. Every present row here is exactly the uncapped
    # score; the dropped-endpoint pairs (e.g. (9, 10)) are absent
    # entirely, which the contract documents.
    assert not any(r.capped for r in rows.values())
    assert rows[(1, 2)].aa_micro == want_hub_term and not rows[(1, 2)].capped


def test_adamic_adar_sound_capped_flag(spark):
    """The advisor-r10 failure scenario: a capped hub drops endpoint 9,
    so wedge (1, 9) through the hub is never enumerated — but an
    UNCAPPED shared center (100) still contributes, so the old
    contributing-centers OR read capped=false on an undercounted pair.
    The sound flag marks any pair with an endpoint in a truncated
    hub's dropped tail."""
    cap = 8
    pairs = _pairs_df(
        spark,
        [(0, i) for i in range(1, 13)] + [(1, 100), (9, 100)],
    )
    rows = {(r.id_a, r.id_b): r for r in adamic_adar(pairs, cap=cap).collect()}

    # hub 0 keeps {1..8}, drops {9..12}; true common neighbors of
    # (1, 9) are {0, 100} but only center 100's wedge is enumerated
    r = rows[(1, 9)]
    assert r.common_neighbors == 1  # undercounted (true answer: 2)
    assert r.capped  # ...and the flag says so
    assert r.aa_micro == int(round(1e6 / math.log(2)))  # deg(100) = 2

    # a pair fully inside kept lists stays exact and UNflagged
    r = rows[(1, 2)]
    assert r.common_neighbors == 1 and not r.capped

    # soundness sweep: every capped=false row must equal the uncapped
    # (exact) enumeration bit-for-bit
    exact = {
        (r.id_a, r.id_b): r
        for r in adamic_adar(pairs, cap=10**6).collect()
    }
    for k, r in rows.items():
        if not r.capped:
            assert (
                exact[k].common_neighbors == r.common_neighbors
                and exact[k].aa_micro == r.aa_micro
            )


def test_local_clustering_hub_capped_denominator(spark):
    cap = 8
    hub_deg = 50
    pairs = _pairs_df(spark, _star_with_one_rim_edge(hub_deg))
    rows = {r.doc_id: r for r in local_clustering(pairs, cap=cap).collect()}

    hub = rows[0]
    # true degree reported; coefficient over the KEPT neighborhood:
    # neighbors 1..8 contain the one rim edge (1,2)
    assert hub.degree == hub_deg and hub.capped
    assert hub.triangles == 1
    assert hub.clustering_coeff == 2.0 / (cap * (cap - 1))

    # rim node 1: neighbors {0, 2}, edge (0,2)? no — but wedge (0,2)
    # closes via pair (0,2)? pair list has (0,2), so triangle = 1
    assert rows[1].degree == 2 and not rows[1].capped
    assert rows[1].triangles == 1 and rows[1].clustering_coeff == 1.0


def test_adamic_adar_capped_flag_sound_on_random_graphs(spark):
    """Soundness sweep over seeded random graphs (hubs well above the
    cap): on every PRESENT output pair, capped=false must imply exact
    equality with the uncapped enumeration, and any undercounted
    present pair must be flagged. This is the full contract the r11
    fix promises, checked against ground truth rather than a
    hand-built topology."""
    import random

    cap = 4
    for seed in (7, 23, 101):
        rng = random.Random(seed)
        n = 28
        edges = {
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.18
        }
        # guarantee at least one hub far above the cap
        edges |= {(0, b) for b in range(1, 15)}
        pairs = _pairs_df(spark, sorted(edges))
        got = {
            (r.id_a, r.id_b): r for r in adamic_adar(pairs, cap=cap).collect()
        }
        exact = {
            (r.id_a, r.id_b): r
            for r in adamic_adar(pairs, cap=10**6).collect()
        }
        assert got, f"seed {seed}: empty output"
        flagged = undercounted = 0
        for k, r in got.items():
            e = exact[k]
            under = (
                r.common_neighbors != e.common_neighbors
                or r.aa_micro != e.aa_micro
            )
            if under:
                undercounted += 1
                assert r.capped, f"seed {seed}: undercounted {k} unflagged"
            if not r.capped:
                assert (
                    r.common_neighbors == e.common_neighbors
                    and r.aa_micro == e.aa_micro
                ), f"seed {seed}: capped=false {k} not exact"
            flagged += bool(r.capped)
        # the sweep must actually exercise both sides of the contract
        assert undercounted > 0, f"seed {seed}: no undercounted pairs hit"
        assert flagged < len(got), f"seed {seed}: everything flagged"


def test_uncapped_graph_matches_uncapped_formula(spark):
    """Below the cap the entries are bit-identical to the classic
    (uncapped) formulas — the guardrail changes nothing on the healthy
    bounded-degree graphs banding produces."""
    # triangle 1-2-3 plus a pendant 4
    pairs = _pairs_df(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    aa = {(r.id_a, r.id_b): r for r in adamic_adar(pairs, cap=WEDGE_CAP).collect()}
    assert not any(r.capped for r in aa.values())
    # pair (1,2): common neighbor 3 with deg 3
    assert aa[(1, 2)].aa_micro == int(round(1e6 / math.log(3)))
    # pair (2,4) via center 3; pair (1,4) via center 3
    assert aa[(1, 4)].common_neighbors == 1 and aa[(2, 4)].common_neighbors == 1

    cc = {r.doc_id: r for r in local_clustering(pairs, cap=WEDGE_CAP).collect()}
    assert cc[1].clustering_coeff == 1.0 and cc[2].clustering_coeff == 1.0
    assert cc[3].degree == 3 and cc[3].triangles == 1
    assert cc[3].clustering_coeff == 2.0 / 6.0
    assert not any(r.capped for r in cc.values())


def test_scorers_identical_on_persisted_edges(spark, sf_dir, tmp_path):
    """Shared-scorer construction: pagerank / Adamic-Adar / clustering
    read the persisted adjacency (dedup_state's append-only edges/)
    and produce output identical to the recomputed-in-plan pair list
    — graph consumers never need to re-band the corpus."""
    from dsp_spark.operators import dedup as dd
    from dsp_spark.operators.graph import pagerank
    from dsp_spark.session import read_table
    from tools.dedup_state import DEFAULTS, cmd_ingest, cmd_init, read_edges

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    base, batch = str(tmp_path / "base"), str(tmp_path / "batch")
    docs.where(F.col("doc_id") % 2 == 0).write.parquet(base)
    docs.where(F.col("doc_id") % 2 == 1).write.parquet(batch)
    state = str(tmp_path / "state")
    cmd_init(spark, base, state, dict(DEFAULTS))
    cmd_ingest(spark, batch, state)

    persisted = read_edges(spark, state).localCheckpoint(eager=True)
    recomputed = dd.minhash_lsh_pairs(
        docs, "doc_id", "text",
        n_hashes=DEFAULTS["n_hashes"], bands=DEFAULTS["bands"], k=DEFAULTS["k"],
    ).localCheckpoint(eager=True)

    for scorer in (
        lambda p: adamic_adar(p, cap=WEDGE_CAP),
        lambda p: local_clustering(p, cap=WEDGE_CAP),
        lambda p: pagerank(docs, p, "doc_id", iters=2),
    ):
        a = {tuple(r) for r in scorer(persisted).collect()}
        b = {tuple(r) for r in scorer(recomputed).collect()}
        assert a == b and len(a) > 0

    # the production CLI core writes the same scores from the same state
    from tools.dedup_state import read_clusters
    from tools.graph_scores import run as scores_run

    state_nodes = read_clusters(spark, state).select("doc_id")
    for cmd, scorer in (
        ("pagerank", lambda p: pagerank(state_nodes, p, "doc_id", iters=2)),
        ("adamic_adar", lambda p: adamic_adar(p, cap=WEDGE_CAP)),
        ("clustering", lambda p: local_clustering(p, cap=WEDGE_CAP)),
    ):
        out = str(tmp_path / f"out_{cmd}")
        assert scores_run(spark, cmd, state, out) > 0
        got = {tuple(r) for r in spark.read.parquet(out).collect()}
        want = {tuple(r) for r in scorer(persisted).collect()}
        assert got == want and len(got) > 0
