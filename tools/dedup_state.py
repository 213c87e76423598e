#!/usr/bin/env python
"""Persisted dedup-cluster state maintenance (the production workflow
behind the dedup_clusters_incremental catalog entry).

    python tools/dedup_state.py init   --docs PARQUET --state DIR
    python tools/dedup_state.py ingest --docs PARQUET --state DIR
    python tools/dedup_state.py verify --state DIR [--full PARQUET]

``init`` builds the state directory from a first corpus snapshot:

* ``bands/``    — the persisted LSH band index (doc_id, band_idx,
                  band_hash): signatures are per-doc and immutable, so
                  this is computed ONCE per doc, ever;
* ``clusters/`` — the (doc_id, cluster_id) assignment (cluster_id =
                  min doc_id in the component);
* ``_meta.json``— banding parameters (n_hashes/bands/k), pinned so an
                  ingest can never silently band differently than the
                  index it probes (a mismatch breaks the
                  base-base-edges-never-change soundness argument).

``ingest`` folds a NEW batch of docs in with work proportional to the
batch (operators/dedup.py:lsh_new_edges + incremental_components):
the batch's bands broadcast against the persisted index (the corpus
side never shuffles), the resulting edges are contracted through the
persisted labels, bounded union-find runs on that contracted delta
only, and the state directory is atomically swapped (write to tmp,
rename) with the batch's bands appended to the index. Batch doc_ids
must be disjoint from the state (enforced).

``verify`` recomputes connected components from scratch over the
persisted band index's full self-join pair set and diffs against the
maintained assignment — the offline audit that the incremental path
never drifted. With ``--full`` it also checks the assignment covers
exactly the docs in a corpus parquet.

Reference parity note: the reference engine (ystre/dsp) has no dedup
surface at all — this is the LLM-training-pipeline layer the brief
adds; the algorithmic contract is the catalog entry's oracle
(recursive-CTE transitive closure == incremental assignment).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

DEFAULTS = {"n_hashes": 8, "bands": 2, "k": 5}


def _bands_df(spark, docs, meta):
    from dsp_spark.operators.dedup import _bands_of, minhash_signatures

    sig = minhash_signatures(
        docs, "doc_id", "text", n_hashes=meta["n_hashes"], k=meta["k"]
    )
    return _bands_of(
        sig, "doc_id", n_hashes=meta["n_hashes"], bands=meta["bands"]
    )


def _pairs_from_bands(bands_df):
    """Full band self-join (id_a < id_b) — used by init and verify;
    ingest never runs this on the corpus side."""
    a, b = bands_df.alias("a"), bands_df.alias("b")
    a = a.hint("shuffle_hash")
    b = b.hint("shuffle_hash")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )


def _write_swap(df, path: str) -> None:
    """Write parquet to ``path`` atomically-enough: full write into a
    sibling tmp dir, then a directory swap (old moved aside, tmp
    renamed in, old removed) — a crash leaves either the old or the
    new complete directory, never a half-written one in place."""
    tmp, old = path + "._tmp", path + "._old"
    for d in (tmp, old):
        if os.path.exists(d):
            shutil.rmtree(d)
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def cmd_init(spark, docs_path: str, state_dir: str, meta: dict) -> None:
    from dsp_spark.operators.dedup import connected_components

    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    os.makedirs(state_dir, exist_ok=True)
    bands = _bands_df(spark, docs, meta).localCheckpoint(eager=True)
    clusters = connected_components(
        docs, _pairs_from_bands(bands), "doc_id"
    ).select("doc_id", F.col("component").alias("cluster_id"))
    _write_swap(bands, os.path.join(state_dir, "bands"))
    _write_swap(clusters, os.path.join(state_dir, "clusters"))
    with open(os.path.join(state_dir, "_meta.json"), "w") as f:
        json.dump(meta, f, sort_keys=True)
    n = spark.read.parquet(os.path.join(state_dir, "clusters")).count()
    print(f"init: {n} docs clustered into state at {state_dir}")


def cmd_ingest(spark, docs_path: str, state_dir: str) -> None:
    from dsp_spark.operators.dedup import (
        incremental_components,
        lsh_new_edges,
    )

    with open(os.path.join(state_dir, "_meta.json")) as f:
        meta = json.load(f)
    new_docs = spark.read.parquet(docs_path).select("doc_id", "text")
    state = spark.read.parquet(os.path.join(state_dir, "clusters")).select(
        "doc_id", F.col("cluster_id").alias("component")
    )
    overlap = new_docs.join(state, "doc_id", "semi").count()
    if overlap:
        raise SystemExit(
            f"ingest batch overlaps state on {overlap} doc_ids — batches "
            "must be disjoint (re-ingesting a doc would double its edges)"
        )
    # batch bands: computed once, appended to the persisted index after
    # the fold succeeds. Candidate edges probe persisted + batch bands,
    # batch side broadcast — identical band layout is guaranteed by the
    # pinned meta.
    new_bands = _bands_df(spark, new_docs, meta).localCheckpoint(eager=True)
    old_bands = spark.read.parquet(os.path.join(state_dir, "bands"))
    all_bands = old_bands.unionByName(new_bands)
    new_ids = new_docs.select("doc_id")
    a, b = all_bands.alias("a"), new_bands.alias("b")
    edges = (
        a.join(
            F.broadcast(b),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_b"),
        )
        .distinct()
    )
    n_edges = edges.count()
    updated = incremental_components(state, new_ids, edges, "doc_id").select(
        "doc_id", F.col("component").alias("cluster_id")
    )
    _write_swap(updated, os.path.join(state_dir, "clusters"))
    _write_swap(
        old_bands.unionByName(new_bands), os.path.join(state_dir, "bands")
    )
    n_new = new_ids.count()
    print(
        f"ingest: {n_new} new docs, {n_edges} delta edges folded into "
        f"{state_dir}"
    )


def cmd_verify(spark, state_dir: str, full_docs: str | None) -> int:
    from dsp_spark.operators.dedup import connected_components

    clusters = spark.read.parquet(os.path.join(state_dir, "clusters"))
    bands = spark.read.parquet(os.path.join(state_dir, "bands"))
    nodes = bands.select("doc_id").distinct()
    want = connected_components(
        nodes, _pairs_from_bands(bands), "doc_id"
    ).select("doc_id", F.col("component").alias("cluster_id"))
    diff = (
        clusters.exceptAll(want).count() + want.exceptAll(clusters).count()
    )
    if diff:
        print(f"VERIFY FAIL: {diff} assignment rows differ from recompute")
        return 1
    if full_docs:
        corpus_ids = spark.read.parquet(full_docs).select("doc_id")
        missing = corpus_ids.join(clusters, "doc_id", "anti").count()
        extra = clusters.join(corpus_ids, "doc_id", "anti").count()
        if missing or extra:
            print(f"VERIFY FAIL: coverage missing={missing} extra={extra}")
            return 1
    print(f"verify: OK ({clusters.count()} docs, incremental == recompute)")
    return 0


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="persisted dedup-cluster state")
    p.add_argument("cmd", choices=["init", "ingest", "verify"])
    p.add_argument("--docs", help="parquet of (doc_id, text)")
    p.add_argument("--state", required=True, help="state directory")
    p.add_argument("--full", help="verify coverage against this corpus parquet")
    for k, v in DEFAULTS.items():
        p.add_argument(f"--{k.replace('_', '-')}", type=int, default=v)
    args = p.parse_args(argv)

    from dsp_spark.session import get_session

    spark = get_session("dsp-dedup-state")
    try:
        if args.cmd == "init":
            if not args.docs:
                p.error("init requires --docs")
            meta = {k: getattr(args, k) for k in DEFAULTS}
            cmd_init(spark, args.docs, args.state, meta)
            return 0
        if args.cmd == "ingest":
            if not args.docs:
                p.error("ingest requires --docs")
            cmd_ingest(spark, args.docs, args.state)
            return 0
        return cmd_verify(spark, args.state, args.full)
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
