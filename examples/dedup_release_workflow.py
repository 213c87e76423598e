#!/usr/bin/env python
"""End-to-end demo of the persisted-dedup release workflow:

    python examples/dedup_release_workflow.py [sf_dir]

The production loop a training-data platform runs release over
release — bands/edges computed ONCE per doc ever, cluster folds and
state writes O(batch):

1. ``init``   — first corpus snapshot -> band index, edge store,
               hash-sharded cluster assignment (tools/dedup_state.py)
2. ``ingest`` — a new document batch folded in with O(batch) compute
               and O(touched-bucket) state I/O
3. ``stats``  — state-shape report (docs / clusters / generations /
               shard balance)
4. graph scores — pagerank / Adamic-Adar / clustering coefficient
               over the PERSISTED adjacency, no re-banding
               (tools/graph_scores.py)
5. ``verify`` — offline audit: incremental assignment == full
               recompute, edge store == band self-join
6. ``compact``— fold generation dirs into one (small-files
               maintenance), then verify again

Each step prints its own summary; the script exits non-zero if any
verify fails.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    from pyspark.sql import functions as F

    from dsp_spark.session import get_session, read_table
    from tools.dedup_state import (
        DEFAULTS,
        cmd_compact,
        cmd_ingest,
        cmd_init,
        cmd_stats,
        cmd_verify,
    )
    from tools.graph_scores import run as graph_run

    work = "/tmp/dsp_release_demo"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_session("dedup-release-demo")
    try:
        docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
        base, batch, full, state = (
            os.path.join(work, p) for p in ("base", "batch", "full", "state")
        )
        docs.where(F.col("doc_id") % 2 == 0).write.parquet(base)
        docs.where(F.col("doc_id") % 2 == 1).write.parquet(batch)
        docs.write.parquet(full)

        print("== 1. init (first snapshot) ==")
        cmd_init(spark, base, state, dict(DEFAULTS))
        print("== 2. ingest (new batch, O(batch)) ==")
        cmd_ingest(spark, batch, state)
        print("== 3. stats ==")
        cmd_stats(spark, state)
        print("== 4. graph scores over the persisted adjacency ==")
        for cmd in ("pagerank", "adamic_adar", "clustering"):
            n = graph_run(spark, cmd, state, os.path.join(work, cmd))
            print(f"   {cmd}: {n} rows")
        print("== 5. verify (incremental == recompute) ==")
        if cmd_verify(spark, state, full):
            return 1
        print("== 6. compact generations + re-verify ==")
        cmd_compact(spark, state)
        if cmd_verify(spark, state, full):
            return 1
        print("release workflow OK")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
