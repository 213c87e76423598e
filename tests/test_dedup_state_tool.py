"""tools/dedup_state.py — the persisted-state workflow behind
dedup_clusters_incremental: init on a first snapshot, fold ingest
batches in O(batch), verify == full recompute, and end-to-end equality
with the batch dedup_clusters catalog entry."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dedup_state import DEFAULTS, cmd_ingest, cmd_init, cmd_verify


@pytest.fixture()
def split_docs(spark, sf_dir, tmp_path):
    """documents split 3 ways: snapshot 0 (doc_id % 4 in 0,2), two
    ingest batches (% 4 == 1, % 4 == 3)."""
    from dsp_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    paths = {}
    for name, pred in (
        ("base", F.col("doc_id") % 2 == 0),
        ("b1", F.col("doc_id") % 4 == 1),
        ("b2", F.col("doc_id") % 4 == 3),
        ("full", F.lit(True)),
    ):
        p = str(tmp_path / name)
        docs.where(pred).write.parquet(p)
        paths[name] = p
    return paths


def test_init_ingest_verify_roundtrip(spark, split_docs, tmp_path):
    state = str(tmp_path / "state")
    meta = dict(DEFAULTS)
    cmd_init(spark, split_docs["base"], state, meta)
    cmd_ingest(spark, split_docs["b1"], state)
    cmd_ingest(spark, split_docs["b2"], state)
    assert cmd_verify(spark, state, split_docs["full"]) == 0

    # after both ingests the maintained assignment equals a full
    # recompute over the whole corpus (same params as dedup_clusters)
    got = {
        r.doc_id: r.cluster_id
        for r in spark.read.parquet(os.path.join(state, "clusters")).collect()
    }
    from dsp_spark.operators.dedup import connected_components
    from dsp_spark.operators import dedup as dd

    docs = spark.read.parquet(split_docs["full"])
    pairs = dd.minhash_lsh_pairs(
        docs, "doc_id", "text",
        n_hashes=meta["n_hashes"], bands=meta["bands"], k=meta["k"],
    )
    want = {
        r.doc_id: r.component
        for r in connected_components(docs, pairs, "doc_id").collect()
    }
    assert got == want and len(got) == docs.count()


def test_ingest_rejects_overlapping_batch(spark, split_docs, tmp_path):
    state = str(tmp_path / "state")
    cmd_init(spark, split_docs["base"], state, dict(DEFAULTS))
    with pytest.raises(SystemExit, match="overlaps state"):
        cmd_ingest(spark, split_docs["base"], state)


def test_verify_detects_torn_ingest(spark, split_docs, tmp_path):
    """The crash-safety contract: a crash BETWEEN the three ingest
    writes leaves clusters/bands/edges disagreeing on the doc set, and
    verify must fail on it. Simulated both ways: bands generation
    landed but clusters did not (crash after the band append of a
    hypothetical flow), and clusters updated but bands missing (crash
    before the appends in the real write order)."""
    import shutil

    from tools.dedup_state import read_clusters

    state = str(tmp_path / "state")
    cmd_init(spark, split_docs["base"], state, dict(DEFAULTS))
    cmd_ingest(spark, split_docs["b1"], state)
    assert cmd_verify(spark, state, None) == 0

    # torn case A: drop the ingest's band+edge generations (as if the
    # crash hit after the cluster write, before the appends)
    broken_a = str(tmp_path / "broken_a")
    shutil.copytree(state, broken_a)
    for store in ("bands", "edges"):
        shutil.rmtree(os.path.join(broken_a, store, "ingest=1"))
    assert cmd_verify(spark, broken_a, None) == 1

    # torn case B: bands/edges present but the cluster fold lost (as
    # if the dynamic partition overwrite never committed): roll the
    # clusters back to init's assignment
    broken_b = str(tmp_path / "broken_b")
    shutil.copytree(state, broken_b)
    init_only = str(tmp_path / "init_only")
    cmd_init(spark, split_docs["base"], init_only, dict(DEFAULTS))
    shutil.rmtree(os.path.join(broken_b, "clusters"))
    shutil.copytree(
        os.path.join(init_only, "clusters"),
        os.path.join(broken_b, "clusters"),
    )
    # sanity: broken_b really disagrees with the healthy state
    assert read_clusters(spark, broken_b).count() < read_clusters(
        spark, state
    ).count()
    assert cmd_verify(spark, broken_b, None) == 1


def test_state_dir_shape_and_meta_pinning(spark, split_docs, tmp_path):
    import json

    state = str(tmp_path / "state")
    cmd_init(spark, split_docs["base"], state, dict(DEFAULTS))
    assert sorted(os.listdir(state)) >= ["_meta.json", "bands", "clusters", "edges"]
    meta = json.load(open(os.path.join(state, "_meta.json")))
    from tools.dedup_state import LAYOUT_VERSION

    assert meta == {**DEFAULTS, "layout": LAYOUT_VERSION}
    # the band index carries every base doc exactly bands times
    bands = spark.read.parquet(os.path.join(state, "bands"))
    per_doc = bands.groupBy("doc_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_doc] == [DEFAULTS["bands"]]
    # clusters are hash-sharded; bands/edges are generation dirs
    assert any(d.startswith("bucket=") for d in os.listdir(os.path.join(state, "clusters")))
    assert os.listdir(os.path.join(state, "bands")) == ["ingest=0"] or "ingest=0" in os.listdir(os.path.join(state, "bands"))
    assert "ingest=0" in os.listdir(os.path.join(state, "edges"))


def _file_snapshot(root):
    """relpath -> (size, mtime_ns) for every data file under root."""
    snap = {}
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            st = os.stat(p)
            snap[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return snap


def test_ingest_rewrites_only_touched_cluster_buckets(spark, split_docs, tmp_path):
    """The sharded-state contract: an ingest's cluster write is O(batch)
    — every bucket directory holding neither a new doc nor a relabeled
    base doc keeps its files byte-identical (same names, sizes, and
    mtimes), and the band/edge generation dirs from init are never
    touched."""
    state = str(tmp_path / "state")
    cmd_init(spark, split_docs["base"], state, dict(DEFAULTS))

    # a tiny batch (8 docs) so most of the 64 buckets are untouched
    tiny = str(tmp_path / "tiny")
    docs = spark.read.parquet(split_docs["b1"]).orderBy("doc_id").limit(8)
    docs.write.parquet(tiny)

    before_clusters = _file_snapshot(os.path.join(state, "clusters"))
    before_state = {
        r.doc_id: r.cluster_id
        for r in spark.read.parquet(os.path.join(state, "clusters")).collect()
    }
    before_bands = _file_snapshot(os.path.join(state, "bands"))
    before_edges = _file_snapshot(os.path.join(state, "edges"))

    cmd_ingest(spark, tiny, state)

    after_clusters = _file_snapshot(os.path.join(state, "clusters"))
    after_state = {
        r.doc_id: r.cluster_id
        for r in spark.read.parquet(os.path.join(state, "clusters")).collect()
    }

    # expected touched shards: buckets of the new docs + of base docs
    # whose label changed — exactly what the tool recomputes
    moved = {d for d in before_state if after_state[d] != before_state[d]}
    new_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    exp = {
        r["b"]
        for r in spark.createDataFrame(
            [(int(i),) for i in sorted(moved | new_ids)], "doc_id bigint"
        )
        .select(
            F.pmod(F.xxhash64("doc_id"), F.lit(DEFAULTS["n_buckets"]))
            .cast("int")
            .alias("b")
        )
        .collect()
    }

    def buckets_of(snap):
        return {p.split(os.sep)[0] for p in snap}

    changed = set()
    for b in buckets_of(before_clusters) | buckets_of(after_clusters):
        bf = {p: v for p, v in before_clusters.items() if p.startswith(b + os.sep)}
        af = {p: v for p, v in after_clusters.items() if p.startswith(b + os.sep)}
        if bf != af:
            changed.add(b)
    assert changed == {f"bucket={e}" for e in exp}
    # O(batch) means MOST shards untouched for a tiny batch
    untouched = buckets_of(before_clusters) - changed
    assert len(untouched) >= len(buckets_of(before_clusters)) // 2

    # append-only stores: init's generation files are byte-identical,
    # the delta landed as a NEW generation dir
    after_bands = _file_snapshot(os.path.join(state, "bands"))
    after_edges = _file_snapshot(os.path.join(state, "edges"))
    assert before_bands.items() <= after_bands.items()
    assert before_edges.items() <= after_edges.items()
    assert any(p.startswith("ingest=1" + os.sep) for p in after_bands)
    assert any(p.startswith("ingest=1" + os.sep) for p in after_edges)

    assert cmd_verify(spark, state, None) == 0


def test_persisted_edges_match_full_recompute(spark, split_docs, tmp_path):
    """The append-only edge store after init + 2 ingests equals the
    from-scratch LSH pair list over the whole corpus — graph consumers
    can read the adjacency without re-banding (tools/dedup_state.py
    read_edges)."""
    from tools.dedup_state import read_edges
    from dsp_spark.operators import dedup as dd

    state = str(tmp_path / "state")
    meta = dict(DEFAULTS)
    cmd_init(spark, split_docs["base"], state, meta)
    cmd_ingest(spark, split_docs["b1"], state)
    cmd_ingest(spark, split_docs["b2"], state)

    got = {
        (r.id_a, r.id_b) for r in read_edges(spark, state).collect()
    }
    docs = spark.read.parquet(split_docs["full"])
    want = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_pairs(
            docs, "doc_id", "text",
            n_hashes=meta["n_hashes"], bands=meta["bands"], k=meta["k"],
        ).collect()
    }
    assert got == want and len(got) > 0

    # compact folds the 3 generations into one, content-preserved
    from tools.dedup_state import cmd_compact, read_bands

    bands_before = {tuple(r) for r in read_bands(spark, state).collect()}
    cmd_compact(spark, state)
    for store in ("bands", "edges"):
        gens = [
            d for d in os.listdir(os.path.join(state, store))
            if d.startswith("ingest=")
        ]
        assert gens == ["ingest=0"], (store, gens)
    assert {tuple(r) for r in read_bands(spark, state).collect()} == bands_before
    assert {(r.id_a, r.id_b) for r in read_edges(spark, state).collect()} == got
    assert cmd_verify(spark, state, split_docs["full"]) == 0
