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


def test_state_dir_shape_and_meta_pinning(spark, split_docs, tmp_path):
    import json

    state = str(tmp_path / "state")
    cmd_init(spark, split_docs["base"], state, dict(DEFAULTS))
    assert sorted(os.listdir(state)) >= ["_meta.json", "bands", "clusters"]
    meta = json.load(open(os.path.join(state, "_meta.json")))
    assert meta == DEFAULTS
    # the band index carries every base doc exactly bands times
    bands = spark.read.parquet(os.path.join(state, "bands"))
    per_doc = bands.groupBy("doc_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_doc] == [DEFAULTS["bands"]]
