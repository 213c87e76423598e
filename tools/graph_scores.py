#!/usr/bin/env python
"""Graph analytics over the PERSISTED near-dup adjacency.

    python tools/graph_scores.py pagerank   --state DIR --out DIR
    python tools/graph_scores.py adamic_adar --state DIR --out DIR
    python tools/graph_scores.py clustering --state DIR --out DIR

Reads the append-only ``edges/`` store a dedup_state directory
maintains (tools/dedup_state.py — edge deltas land per ingest
generation, base-base edges never change) and runs the shared graph
scorers from operators/graph.py against it, writing parquet. This is
the production path the catalog entries mirror: an entry must be a
pure function of the input tables, so it re-bands the corpus in-plan;
a release pipeline bands once at ingest and every downstream graph
pass starts HERE, from the stored pair list — the same build-once
pattern the persisted ANN index uses for IVF cells.

Identity with the in-plan construction (same scorer, same pair set) is
pinned in tests/test_graph_cap.py::test_scorers_identical_on_persisted_edges.

Scale: pagerank is the bounded-iteration integer-rank fold
(operators/graph.py:pagerank); Adamic-Adar / clustering enumerate
wedges over each node's WEDGE_CAP smallest neighbors (worst case
n*cap^2 regardless of hub degree, truncations flagged in a `capped`
column). Nodes come from the cluster assignment, so isolated docs get
their teleport-mass rank without a corpus scan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, cmd: str, state_dir: str, out_dir: str,
        iters: int = 2, cap: int | None = None) -> int:
    """Score the persisted adjacency and write parquet; returns rows."""
    from dsp_spark.operators.graph import (
        WEDGE_CAP,
        adamic_adar,
        local_clustering,
        pagerank,
    )
    from tools.dedup_state import read_clusters, read_edges

    cap = WEDGE_CAP if cap is None else cap
    edges = read_edges(spark, state_dir).localCheckpoint(eager=True)
    if cmd == "pagerank":
        nodes = read_clusters(spark, state_dir).select("doc_id")
        out = pagerank(nodes, edges, "doc_id", iters=iters)
    elif cmd == "adamic_adar":
        out = adamic_adar(edges, cap=cap)
    else:
        out = local_clustering(edges, cap=cap)
    out.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir).count()


def main(argv=None) -> int:
    import argparse

    from dsp_spark.operators.graph import WEDGE_CAP
    from dsp_spark.session import get_session

    p = argparse.ArgumentParser(
        description="graph scores over persisted dedup_state edges"
    )
    p.add_argument("cmd", choices=["pagerank", "adamic_adar", "clustering"])
    p.add_argument("--state", required=True, help="dedup_state directory")
    p.add_argument("--out", required=True, help="output parquet directory")
    p.add_argument("--iters", type=int, default=2, help="pagerank rounds")
    p.add_argument(
        "--cap", type=int, default=WEDGE_CAP,
        help="per-node neighbor cap for wedge enumeration",
    )
    args = p.parse_args(argv)
    if args.cmd != "pagerank" and args.cap < 2:
        # operators/graph._check_cap would raise mid-session; fail the
        # CLI contract-first (advisor r10: cap<2 zeroes every wedge and
        # NaNs clustering_coeff)
        p.error(f"--cap must be >= 2 for wedge enumeration (got {args.cap})")

    spark = get_session("dsp-graph-scores")
    try:
        n = run(spark, args.cmd, args.state, args.out,
                iters=args.iters, cap=args.cap)
        print(f"{args.cmd}: {n} rows -> {args.out}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
